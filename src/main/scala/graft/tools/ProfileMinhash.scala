package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev-only: stage-by-stage timing of the MinHash pipeline. */
object ProfileMinhash {
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
      println(f"[prof] $label%-12s ${(System.nanoTime() - t0) / 1e9}%8.2fs")
    }

    val nHashes = 32
    val bands = 8
    val rowsPerBand = nHashes / bands
    val rnd = new scala.util.Random(42)
    val abs_ = Array.fill(nHashes)((rnd.nextLong() | 1L, rnd.nextLong()))

    def tokens(c: org.apache.spark.sql.Column) = split(trim(c), "\\s+")
    def normText(c: org.apache.spark.sql.Column) = regexp_replace(lower(trim(c)), "\\s+", " ")
    val toks = col("toks")
    val shingled = graft.sources.Tables.documents(spark, dir)
      .select(col("doc_id"), tokens(normText(col("text"))).as("toks"))
      .select(col("doc_id"),
        when(size(toks) >= 3,
          array_distinct(transform(sequence(lit(0), size(toks) - 3),
            i => concat_ws(" ",
              element_at(toks, i + 1), element_at(toks, i + 2), element_at(toks, i + 3)))))
          .otherwise(array().cast("array<string>")).as("sh"))
      .filter(size(col("sh")) > 0)
    time("shingles")(shingled)
    val docs = shingled.select(col("doc_id"),
      array_distinct(transform(col("sh"), s => xxhash64(s))).as("sh"))
    time("hashed")(docs)
    val sig = docs.select(
      col("doc_id"),
      array((0 until nHashes).map { i =>
        val (a, b) = abs_(i)
        array_min(transform(col("sh"), h => h * lit(a) + lit(b)))
      }: _*).as("sig"))
    time("sig")(sig)
    val banded = sig.select(col("doc_id"),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(slice(col("sig"), b * rowsPerBand + 1, lit(rowsPerBand))))))
      .select(col("doc_id"), col("pos").as("band"), col("col").as("band_key"))
    time("banded")(banded)
    val candidates = banded.as("l")
      .join(banded.as("r"), Seq("band", "band_key"))
      .select(col("l.doc_id").as("a_id"), col("r.doc_id").as("b_id"))
      .filter(col("a_id") < col("b_id"))
      .distinct()
    println("[prof] n_candidates=" + candidates.count())
    time("candidates")(candidates)
    val full = candidates
      .join(docs.select(col("doc_id").as("a_id"), col("sh").as("a_sh")), Seq("a_id"))
      .join(docs.select(col("doc_id").as("b_id"), col("sh").as("b_sh")), Seq("b_id"))
      .withColumn("jaccard", round(
        size(array_intersect(col("a_sh"), col("b_sh"))).cast("double") /
          size(array_union(col("a_sh"), col("b_sh"))), 4))
      .filter(col("jaccard") >= 0.7)
      .select(col("a_id"), col("b_id"), col("jaccard"))
    time("full")(full)
    time("full_warm")(full)
    spark.stop()
  }
}
