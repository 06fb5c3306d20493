package graft.tools
import org.apache.spark.sql.SparkSession

/** Dev harness: phase-level timing of annPqTopk — separates
  * training-collect cost from the scoring query so perf work aims at
  * the real bottleneck (bench only sees the total). */
object ProfilePq {
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
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[pq] $label%-18s ${(System.nanoTime() - t0) / 1e9}%.2fs"); r
    }
    for (i <- 1 to 3) {
      println(s"--- pass $i ---")
      val df = t("plan")(graft.queries.VectorQueries.annPqTopk(spark, dir))
      t("execute")(df.write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
