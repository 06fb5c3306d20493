package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Same-JVM A/B of a query's route variants, interleaved A,B,A,B,…
  * so co-tenant load drift hits both arms equally — the only honest
  * comparison this box allows (single ColdOne runs diverge 2–27s
  * under ambient spikes). Reports per-arm min/median.
  * Usage: runMain graft.tools.AbRoutes <family> [sfDir] [reps]
  * Families: g1, g3 (raw-collect vs sets-exchange basket build). */
object AbRoutes {
  def main(args: Array[String]): Unit = {
    val fam = args(0)
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val reps = if (args.length > 2) args(2).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.extensions", "graft.functions.GraftExtensions")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df: DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()
    val arms: Seq[(String, () => DataFrame)] = fam match {
      case "g1" => Seq(
        "raw" -> (() => graft.queries.GraphQueries.g1PageRank(spark, dir)),
        "sets" -> (() => graft.queries.GraphQueries.g1PageRank(spark, dir,
          rawCollectMax = 0)))
      case "g3" =>
        val li = graft.sources.Tables.lineitem(spark, dir)
          .select(col("l_orderkey"), col("l_partkey"))
        Seq(
          "raw" -> (() => graft.queries.GraphQueries.g3TrianglesOf(spark, li)),
          "sets" -> (() => graft.queries.GraphQueries.g3TrianglesOf(spark, li,
            rawCollectMax = 0)))
      case other => sys.error(s"unknown family $other")
    }
    // one untimed warmup per arm (JIT/codegen)
    arms.foreach { case (_, f) => noop(f()); spark.catalog.clearCache() }
    val times = scala.collection.mutable.Map.empty[String, Vector[Double]]
      .withDefaultValue(Vector.empty)
    for (_ <- 1 to reps; (name, f) <- arms) {
      val t0 = System.nanoTime()
      noop(f())
      val dt = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      times(name) = times(name) :+ dt
    }
    for ((name, ts) <- times.toSeq.sortBy(_._1)) {
      val s = ts.sorted
      println(f"[ab] $fam/$name%-6s min ${s.head}%6.2fs  med ${s(s.size / 2)}%6.2fs  all " +
        ts.map(t => f"$t%.2f").mkString(" "))
    }
    spark.stop()
  }
}
