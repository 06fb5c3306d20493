package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located-join path for the joins
  * that repeat on the same key at 100 TB (fact-to-fact joins too big
  * to broadcast). Writing both sides bucketed (+ sorted) by the join
  * key lets a sort-merge join read matching buckets directly:
  * `.explain` shows SortMergeJoin with NO Exchange on either side —
  * the shuffle is paid once at write time and amortized over every
  * subsequent join/aggregation on that key (BucketingSpec asserts
  * the no-Exchange property).
  *
  * Bucket count guidance at scale: ~target-parallelism × small
  * multiple (buckets are the max join parallelism without AQE
  * coalescing), chosen once per table family so co-bucketed tables
  * agree. Spark requires a catalog entry for bucket metadata, so
  * these are saveAsTable with an explicit external path.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted external table at `path`. */
  def writeBucketed(df: DataFrame, table: String, path: String,
      bucketCol: String, nBuckets: Int): Unit =
    df.write
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol)
      .option("path", path)
      .mode(SaveMode.Overwrite)
      .saveAsTable(table)

  /** Co-located equi-join of two tables bucketed on the join key —
    * plans shuffle-free when both sides' bucket specs match. */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
