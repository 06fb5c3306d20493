package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: phase-level timing of the g1_pagerank superstep loop
  * (edge build / degree attach / per-iteration cost) so plan changes
  * can be attributed — the ProfilePq pattern for the graph family. */
object ProfilePr {
  def main(args: Array[String]): Unit = {
    val dir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"PHASE $n ${(System.nanoTime - t0) / 1e9}%.2f s"); r
    }

    for (round <- 1 to 2) {
      println(s"--- round $round ---")
      val li = spark.read.parquet(s"$dir/lineitem.parquet")
        .select(col("l_orderkey"), col("l_partkey"))
      val sets = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
      val pairExpr = flatten(transform(col("ps"), a =>
        transform(filter(col("ps"), b => b > a), b =>
          struct(a.as("src"), b.as("dst")))))
      val canon = sets.select(explode(pairExpr).as("p"))
        .select(col("p.src"), col("p.dst")).distinct().persist()
      t("canon")(canon.count())
      val edges = canon.union(
        canon.select(col("dst").as("src"), col("src").as("dst")))
      val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      val ewd = edges.join(broadcast(deg), Seq("src"))
        .repartition(spark.sparkContext.defaultParallelism).persist()
      t("ewd")(ewd.count())
      val nodes = li.select(col("l_partkey").as("node")).distinct().persist()
      t("nodes")(nodes.count())
      val zeros = nodes.select(col("node"), lit(0L).as("c"))
      var ranks = nodes.withColumn("r", lit(1000000L))
      for (i <- 1 to 5) {
        ranks = ewd.join(broadcast(ranks), col("src") === col("node"))
          .select(col("dst").as("node"), expr("r div deg").as("c"))
          .union(zeros)
          .groupBy(col("node")).agg(sum(col("c")).as("s"))
          .select(col("node"), expr("150000 + (85 * s) div 100").as("r"))
      }
      t("all-iters-one-plan")(ranks.count())
      canon.unpersist(); ewd.unpersist(); nodes.unpersist()
    }
    spark.stop()
  }
}
