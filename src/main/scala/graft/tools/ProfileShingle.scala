package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: isolate the shingle-pipeline cost. */
object ProfileShingle {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def time(label: String)(df: => DataFrame): Unit = {
      val t0 = System.nanoTime()
      df.write.mode("overwrite").format("noop").save()
      println(f"[prof] $label%-16s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }
    def tokens(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")
    def normText(c: org.apache.spark.sql.Column) = regexp_replace(lower(trim(c)), "\\s+", " ")
    val toks = col("toks")

    val base = graft.sources.Tables.documents(spark, dir)
    time("scan")(base)
    val tokened = base.select(col("doc_id"), tokens(normText(col("text"))).as("toks"))
    time("tokens")(tokened)
    val shingleExpr =
      when(size(toks) >= 3,
        array_distinct(transform(sequence(lit(0), size(toks) - 3),
          i => concat_ws(" ",
            element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
        .otherwise(array().cast("array<string>")).as("sh")
    val sh = tokened.select(col("doc_id"), shingleExpr)
    time("shingle_nofil")(sh)
    time("shingle_nofil2")(sh)
    val filtered = sh.filter(size(col("sh")) > 0)
    time("shingle_filter")(filtered)
    filtered.explain("formatted")
    spark.stop()
  }
}
