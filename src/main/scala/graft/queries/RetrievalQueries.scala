package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Sparse (BM25) and hybrid (RRF) retrieval over the documents
  * corpus — the serving-side counterpart of the tf-idf / inverted
  * index build queries (reference surfaces search via its catalog
  * regex lookups, `src/routes/items.js:31-58`; a training-data
  * pipeline needs ranked retrieval proper).
  *
  * Scale design: BM25's tf is computed per query term as a
  * `size(filter(tokens))` — a NARROW codegen'd map, no explode and
  * no (doc_id, term) shuffle, so the corpus is touched by exactly
  * one scan. Corpus statistics (N, Σdl, per-term df) fold into ONE
  * single-row aggregate broadcast back, and the final top-k is a
  * global sort+limit — TakeOrderedAndProject, a tree-reduced
  * per-partition heap, never a full-corpus single-partition window.
  * That plan survives 100 TB: scan → singleton agg → TakeOrdered.
  *
  * Cross-engine determinism: per-term scores are rounded to integer
  * MICROS before summing — long addition is associative, so the
  * document score is independent of term evaluation order, where a
  * double sum could differ in the last ulp between engines. idf is
  * the classic BM25 (N - df + 0.5)/(df + 0.5) left UN-LOGGED, the
  * same monotone-in-df trick as tTfidf (`TextQueries.tTfidf`): the
  * whole score is then IEEE +,*,/ in a fixed parse order —
  * bit-identical in any engine — where ln's last-ulp differences
  * between libm implementations could flip a rounding.
  */
object RetrievalQueries {

  /** The fixed keyword query every sparse/hybrid path answers for:
    * one rare term ("dup", df≈5% of docs) and two mid-frequency
    * terms — mixed selectivity so idf actually orders the result. */
  private[queries] val QueryTerms = Seq("dup", "vector", "stream")

  private def tokens(c: Column): Column = split(trim(c), "\\s+")

  /** Per-doc narrow frame: (doc_id, dl, tf_0..tf_{n-1}). One scan,
    * zero shuffles — each tf is a codegen'd size(filter(...)). */
  private def tfFrame(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(lower(trim(col("text")))).as("w"))
      .withColumn("dl", size(col("w")).cast("long"))
    QueryTerms.zipWithIndex.foldLeft(base) { case (df, (t, i)) =>
      df.withColumn(s"tf_$i", size(filter(col("w"), x => x === lit(t))).cast("long"))
    }.drop("w")
  }

  /** (doc_id, bm25_micro) for docs matching ≥ 1 query term. The tf
    * frame is persisted because both the stats singleton and the
    * scoring pass read it — one corpus scan, not two. */
  private def bm25Scored(spark: SparkSession, dir: String): DataFrame = {
    val tf = tfFrame(spark, dir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dfCols = sum(col("dl")).as("sum_dl") +: QueryTerms.indices.map(i =>
      sum(when(col(s"tf_$i") > 0, 1L).otherwise(0L)).as(s"df_$i"))
    val stats = broadcast(tf.agg(count(lit(1)).as("n_docs"), dfCols: _*))
    val avgdl = col("sum_dl").cast("double") / col("n_docs")
    // idf * (tf*2.2) / (tf + 1.2*(1 - 0.75 + 0.75*dl/avgdl)) * 1e6,
    // parenthesized EXACTLY as the oracle SQL writes it
    def termMicro(i: Int): Column = {
      val idf = (col("n_docs") - col(s"df_$i") + lit(0.5)) / (col(s"df_$i") + lit(0.5))
      val nrm = col(s"tf_$i") + lit(1.2) * (lit(1.0) - lit(0.75) +
        lit(0.75) * col("dl") / avgdl)
      when(col(s"tf_$i") > 0,
        round(idf * (col(s"tf_$i") * lit(2.2)) / nrm * lit(1000000.0)).cast("long"))
        .otherwise(lit(0L))
    }
    tf.crossJoin(stats)
      .filter(QueryTerms.indices.map(i => col(s"tf_$i")).reduce(_ + _) > 0)
      .withColumn("bm25_micro",
        QueryTerms.indices.map(termMicro).reduce(_ + _))
      .select(col("doc_id"), col("bm25_micro"))
      .transform(graft.ops.CacheScope.owned(_, tf))
  }

  /** Deterministic top-k with a rank column: global sort+limit
    * (TakeOrderedAndProject) FIRST, then row_number over the k
    * surviving rows — the window's single partition holds k rows,
    * never the corpus. */
  private def rankTop(df: DataFrame, order: Seq[Column], k: Int,
      rankName: String): DataFrame =
    df.orderBy(order: _*).limit(k)
      .withColumn(rankName,
        row_number().over(Window.orderBy(order: _*)).cast("long"))

  /** BM25 top-10 for the fixed query. Full DuckDB oracle. */
  def tBm25Topk(spark: SparkSession, dir: String, k: Int = 10): DataFrame =
    rankTop(bm25Scored(spark, dir),
      Seq(col("bm25_micro").desc, col("doc_id")), k, "rank")
      .select(col("doc_id"), col("rank"), col("bm25_micro"))

  /** Hybrid retrieval: reciprocal-rank fusion (Cormack et al. 2009)
    * of the BM25 arm with a dense-cosine arm (query = embedding 0,
    * doc_id-aligned with documents). Each arm independently reduces
    * to its top-50 via TakeOrdered, so the fusion join touches ≤ 100
    * rows regardless of corpus size — at 100 TB the arms are the
    * only corpus-sized work and both are scan → TakeOrdered.
    * rrf contributions are round(1e6/(60+rank)) longs: integer
    * ranks in, exact long sum out — cross-engine stable. */
  def tHybridRrf(spark: SparkSession, dir: String, k: Int = 10): DataFrame = {
    val sparse = rankTop(bm25Scored(spark, dir),
      Seq(col("bm25_micro").desc, col("doc_id")), 50, "s_rank")
      .select(col("doc_id"), col("s_rank"))
    val emb = VectorQueries.embNormed(spark, dir)
    val q = emb.filter(col("vec_id") === 0).select(col("emb").as("qemb"))
    val cos = emb.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(q))
      .select(col("vec_id").as("doc_id"),
        round(call_function("graft_dot", col("qemb"), col("emb")), 4).as("cos"))
    val dense = rankTop(cos, Seq(col("cos").desc, col("doc_id")), 50, "d_rank")
      .select(col("doc_id"), col("d_rank"))
    val fused = dense.join(sparse, Seq("doc_id"), "full_outer")
      .withColumn("rrf_micro",
        coalesce(round(lit(1000000.0) / (lit(60) + col("d_rank"))).cast("long"), lit(0L)) +
          coalesce(round(lit(1000000.0) / (lit(60) + col("s_rank"))).cast("long"), lit(0L)))
    rankTop(fused, Seq(col("rrf_micro").desc, col("doc_id")), k, "rank")
      .select(col("doc_id"), col("rank"), col("rrf_micro"),
        col("d_rank"), col("s_rank"))
  }
}
