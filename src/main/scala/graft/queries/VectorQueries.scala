package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Similarity search over the `embeddings` table
  * (`Array[Float]`, 64-dim): brute-force cosine top-k as the exact
  * baseline, LSH-bucketed ANN as the scale path, cosine near-dup for
  * embedding-level dedup.
  *
  * Vector math is builtin higher-order functions (`zip_with` dot
  * product, `aggregate` reduction) over `array<double>` — codegen'd,
  * no UDF, and float→double widening happens once at scan time so
  * cross-engine comparisons are stable.
  */
object VectorQueries {

  private def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  private def norm(a: Column): Column = sqrt(dot(a, a))

  private def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  private def embDouble(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir).select(
      col("vec_id"), col("label"),
      col("embedding").cast("array<double>").as("emb"))

  /** Corpus with L2-normalized vectors: cosine of a pair is then a
    * bare dot product — norms are computed once per VECTOR here, not
    * twice per PAIR in the quadratic stage (3× less work where it
    * multiplies). `nrm` stays in the normalizing projection's output
    * (dropped one step later) so it is referenced twice and
    * CollapseProject won't inline the norm into the per-element
    * lambda. */
  private def embNormed(spark: SparkSession, dir: String): DataFrame =
    embDouble(spark, dir)
      .select(col("vec_id"), col("label"), col("emb"), norm(col("emb")).as("nrm"))
      .filter(col("nrm") > 0)
      .select(col("vec_id"), col("label"),
        transform(col("emb"), x => x / col("nrm")).as("emb"), col("nrm"))
      .drop("nrm")

  /** Brute-force cosine top-k: the first 10 vectors as queries,
    * top-5 neighbors each. The query side is broadcast (it is tiny
    * by construction), so the "cross join" is really one
    * broadcast-nested-loop scan of the corpus — the exact-search
    * baseline every ANN variant is measured against. Deterministic:
    * similarity rounded, ties broken by neighbor id. */
  def annBruteTopk(spark: SparkSession, dir: String): DataFrame = {
    val emb = embNormed(spark, dir)
    val queries = emb.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"))
    val pairs = emb.join(broadcast(queries), col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qemb"), col("emb")), 4).as("sim"))
    pairs.withColumn("rank", row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** LSH-bucketed ANN: 12 deterministic random-hyperplane bits per
    * vector (hyperplane d, dim i weight = a fixed pseudo-random ±1/
    * ±2 derived from hash(d, i)), probed per-bucket — each query
    * only scans its own bucket. The 100 TB path: bucket key is a
    * shuffle-friendly int, bucket population is corpus/4096 on
    * average, recall trades off via the bit count. Rows-only check
    * (bucket membership is hash-defined, not SQL-canonical). */
  def annLshTopk(spark: SparkSession, dir: String): DataFrame = {
    val nBits = 12
    val emb = embNormed(spark, dir)
    // deterministic hyperplane weight for (plane b, dim i) in {-2,-1,1,2}
    def weight(b: Int, i: Column): Column = {
      val h = xxhash64(lit(b), i)
      when(pmod(h, lit(4)) === 0, -2.0).when(pmod(h, lit(4)) === 1, -1.0)
        .when(pmod(h, lit(4)) === 2, 1.0).otherwise(2.0)
    }
    def bucketOf(v: Column): Column =
      (0 until nBits).map { b =>
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, i) => x * weight(b, i)),
          lit(0.0d), (acc, x) => acc + x)
        when(proj > 0, lit(1 << b)).otherwise(lit(0))
      }.reduce((a, c) => a.bitwiseOR(c))
    val bucketed = emb.select(col("vec_id"), col("emb"), bucketOf(col("emb")).as("bucket"))
    val queries = bucketed.filter(col("vec_id") < 10)
      .select(col("vec_id").as("qid"), col("emb").as("qemb"), col("bucket"))
    val pairs = bucketed.join(queries, Seq("bucket"))
      .filter(col("vec_id") =!= col("qid"))
      .select(col("qid"), col("vec_id").as("nid"),
        round(dot(col("qemb"), col("emb")), 4).as("sim"))
    pairs.withColumn("rank", row_number().over(
      Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("nid"))).cast("long"))
      .filter(col("rank") <= 5)
      .select(col("qid"), col("rank"), col("nid"), col("sim"))
  }

  /** Embedding-cosine near-dup: pairs above a cosine threshold,
    * label-bucketed so the self-join is per-cluster rather than
    * corpus². Same shape as text near-dup: bucket → pair → verify. */
  def embNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = embNormed(spark, dir)
    val a = emb.select(col("vec_id").as("a_id"), col("label"), col("emb").as("a_emb"))
    val b = emb.select(col("vec_id").as("b_id"), col("label"), col("emb").as("b_emb"))
    a.join(b, Seq("label")).filter(col("a_id") < col("b_id"))
      .withColumn("cos", round(dot(col("a_emb"), col("b_emb")), 4))
      .filter(col("cos") >= 0.4)
      .select(col("label"), col("a_id"), col("b_id"), col("cos"))
  }

  /** Centroid roll-up: per-label mean vector + dispersion — the
    * aggregation shape of IVF coarse quantizer training (one pass,
    * map-side partial sums of the vector components). Emitted as
    * scalars (norm of centroid, mean intra-label cosine-to-centroid)
    * so the output is flat and oracle-friendly rows-only. */
  def embCentroids(spark: SparkSession, dir: String): DataFrame = {
    val emb = embDouble(spark, dir)
    val dim = 64
    val compSums = (0 until dim).map(i =>
      sum(element_at(col("emb"), i + 1)).as(s"s$i"))
    val agged = emb.groupBy(col("label"))
      .agg(count(lit(1)).as("n"), compSums: _*)
    val centroid = array((0 until dim).map(i => col(s"s$i") / col("n")): _*)
    agged.select(col("label"), col("n").as("n_vectors"),
      round(norm(centroid), 4).as("centroid_norm"))
  }
}
