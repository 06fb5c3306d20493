package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Parquet table loaders for the driver-generated star schema
  * (TESTDATA.md). Each loader is a plain `spark.read.parquet` so
  * Catalyst retains full pushdown/pruning freedom — filters and
  * projections applied by callers reach the parquet scan
  * (PushedFilters / ReadSchema).
  *
  * At 100 TB these would be partitioned/bucketed tables behind a
  * catalog; the API shape (named loaders returning DataFrames) stays
  * identical, so queries don't change when the storage layer does.
  */
object Tables {
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  def region(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "region")
  def nation(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "nation")
  def customer(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "part")
  def orders(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "orders")
  def lineitem(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "lineitem")
  /** The events table carries parquet TIMESTAMP(NANOS), which Spark's
    * vectorized reader rejects; sessions set
    * `spark.sql.legacy.parquet.nanosAsLong=true` so it arrives as a
    * long. Convert to a microsecond timestamp here with integer
    * division — epoch nanos (~1.7e18) exceed double's 2^53 mantissa,
    * so float division would corrupt timestamps. Truncation matches
    * DuckDB's CAST(ts_ns AS TIMESTAMP). */
  def events(spark: SparkSession, dir: String): DataFrame = {
    val df = table(spark, dir, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case _ => df
    }
  }
  /** CPU-heavy per-row tables (hashing, vector math) arrive as one
    * tiny parquet file → one scan partition → one busy core of 32.
    * Fan the scan out to full parallelism when it's under-split; at
    * real scale (many files/row-groups ≥ default parallelism) the
    * guard is false and no shuffle is added. */
  private def fanOut(spark: SparkSession, df: DataFrame): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p) else df
  }
  def documents(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, table(spark, dir, "documents"))
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    fanOut(spark, table(spark, dir, "embeddings"))
}
