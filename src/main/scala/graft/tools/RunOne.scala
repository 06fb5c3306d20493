package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: run one named SparkEntry query with timing and an
  * optional formatted plan dump — the .explain feedback loop for
  * per-operator plan iteration. Usage:
  *   runMain graft.tools.RunOne <name> [sfDir] [explain|time|both]
  */
object RunOne {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val mode = if (args.length > 2) args(2) else "both"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val fn = graft.SparkEntry.queries(name)
    if (mode == "explain" || mode == "both")
      fn(spark, sfDir).explain("formatted")
    if (mode == "time" || mode == "both") {
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[runone] $name cold ${(System.nanoTime() - t0) / 1e9}%.2fs")
      val t1 = System.nanoTime()
      fn(spark, sfDir).write.mode("overwrite").format("noop").save()
      println(f"[runone] $name warm ${(System.nanoTime() - t1) / 1e9}%.2fs")
    }
    spark.stop()
  }
}
