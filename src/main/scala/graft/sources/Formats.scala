package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Multi-format source/sink round-trips beyond parquet: CSV and
  * JSON-lines with EXPLICIT schemas — at 100 TB schema inference is a
  * full extra pass over the data and type-drifts silently, so every
  * reader here requires the StructType up front (the same stance as
  * Schemas/Tables). Parquet remains the performance format (columnar,
  * pushdown, pruning); these exist for interchange with systems that
  * speak text formats, and the writers default to gzip so text blowup
  * is bounded.
  *
  * Timestamp fidelity: CSV/JSON serialize timestamps as ISO-8601
  * microseconds; nanosecond precision (the events table) does not
  * survive a text round-trip — callers needing nanos stay on parquet.
  * CSV additionally conflates empty string with null on read (both
  * serialize to an empty field) — a lossy corner inherent to the
  * format; data that distinguishes "" from null must use JSON or
  * parquet.
  */
object Formats {

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("compression", "gzip")
      // quote/escape defaults handle embedded commas/newlines/quotes
      .csv(path)

  def readCsv(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      // multiLine: quoted fields containing raw newlines span
      // physical lines; the default line-based splitter would break
      // them into malformed records. (Costs input splittability —
      // moot here, the writer gzips.)
      .option("multiLine", "true")
      // malformed rows fail loudly rather than silently nulling —
      // interchange files are producer bugs waiting to be noticed
      .option("mode", "FAILFAST")
      .csv(path)

  def writeJson(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("compression", "gzip")
      .json(path)

  def readJson(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** ORC — the other columnar interchange format (Hive/Trino
    * ecosystems). Same optimizer class as parquet: predicate
    * pushdown, column pruning, and stripe-level min/max skipping
    * all work (FormatsSpec pins pushdown reaching the scan), so an
    * ORC-resident 100 TB corpus reads with the same plan quality;
    * parquet stays the native format for everything this engine
    * writes for itself. */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("compression", "zlib")
      .orc(path)

  def readOrc(spark: SparkSession, schema: StructType, path: String): DataFrame =
    spark.read.schema(schema).orc(path)
}
