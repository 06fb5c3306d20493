package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev harness: dump ONE named SparkEntry query to parquet with the
  * same session semantics Verify uses, for a local DuckDB oracle
  * compare while iterating. Usage:
  *   runMain graft.tools.DumpOne <name> <sfDir> <outDir>
  */
object DumpOne {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(s"$outDir/$name")
    println(s"[dumpone] wrote $outDir/$name")
    // after the run, so register-gated oracles have rendered
    graft.SparkEntry.oracleSql.get(name).foreach { sql =>
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$outDir/${name}_oracle.sql"),
        sql.getBytes("UTF-8"))
      println(s"[dumpone] wrote $outDir/${name}_oracle.sql")
    }
    spark.stop()
  }
}
