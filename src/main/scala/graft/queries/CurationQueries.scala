package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.sources.Tables

/** Composed end-to-end curation passes — the queries a corpus run
  * actually executes LAST, after the per-signal operators have been
  * validated individually: one row per document with every gate's
  * verdict and the final keep decision, so downstream tooling (and
  * the oracle) sees one consistent decision table instead of three
  * frames to reconcile.
  */
object CurationQueries {

  /** Final curation decision per document: rule quality gate AND
    * exact-dedup canonicality AND embedding-outlier audit (vec_id
    * aligns 1:1 with doc_id in the generated corpus — the multimodal
    * join a real pipeline does between its text and embedding
    * stores; docs without an embedding pass the audit by default).
    *
    * Scale shape: each signal keeps its own operator's plan — the
    * gate is the narrow scan + bigram agg, the dup flag is ONE
    * window over the uniform 128-bit digest key (the dedup_exact
    * shuffle, min-over-group instead of groupBy so the doc rows
    * never leave their partition twice), the outlier arm is the
    * vec-sum centroid agg + broadcast — and the fusion is shuffle
    * joins on the uniform doc_id key. The gate and dup arms share
    * ONE cached (doc_id, text) base projection, so the heaviest
    * input — the documents text — is read once, not once per arm
    * (at 100 TB the cache becomes a written narrow intermediate;
    * either way the scan count is 1). No signal's cost changes by
    * being composed. Full oracle row: every ingredient is already
    * an oracle-green recompute, composed with the same thresholds. */
  def tCurationE2e(spark: SparkSession, dir: String): DataFrame = {
    graft.functions.GraftFunctions.ensureRegistered(spark)
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("text"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val gate = TextQueries.qualityGateOf(docs)
      .select(col("doc_id"), col("keep").as("quality_ok"))
    val dup = docs
      .select(col("doc_id"),
        md5(TextQueries.normText(col("text"))).as("ck"))
      .withColumn("is_dup",
        min(col("doc_id")).over(Window.partitionBy(col("ck"))) =!= col("doc_id"))
      .select(col("doc_id"), col("is_dup"))
    val outlier = VectorQueries.embOutliers(spark, dir)
      .select(col("vec_id").as("doc_id"), col("is_outlier"))
    gate.join(dup, Seq("doc_id"))
      .join(outlier, Seq("doc_id"), "left")
      .select(col("doc_id"), col("quality_ok"), col("is_dup"),
        coalesce(col("is_outlier"), lit(false)).as("is_outlier"))
      .withColumn("kept",
        col("quality_ok") && !col("is_dup") && !col("is_outlier"))
      .transform(graft.ops.CacheScope.owned(_, docs))
  }
}
