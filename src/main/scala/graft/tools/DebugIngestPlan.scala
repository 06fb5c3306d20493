package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Round-17 diagnostic: reproduce the clustersIngestBatch plan-string
  * pathology observed in the Verify run (driver pinned for minutes in
  * QueryExecution.explainString during g5/g7 index builds) and report
  * where the time goes: per-batch wall clock and the rendered plan
  * length of the batch's returned frame. Usage:
  *   runMain graft.tools.DebugIngestPlan [sfDir] [nBatches]
  */
object DebugIngestPlan {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val nBatches = if (args.length > 1) args(1).toInt else 4
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val root = java.nio.file.Files.createTempDirectory("graft-ingestplan").toString
    val li = graft.sources.Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val sets = li.groupBy(col("l_orderkey"))
      .agg(collect_set(col("l_partkey")).as("ps"))
    val pairExpr = flatten(transform(col("ps"), a =>
      transform(filter(col("ps"), b => b > a), b =>
        struct(a.as("src"), b.as("dst")))))
    val edges = sets.select(explode(pairExpr).as("p"))
      .select(col("p.src"), col("p.dst"))
      .groupBy(col("src"), col("dst")).agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select(col("src").as("a_id"), col("dst").as("b_id"))
      .withColumn("slice", pmod(xxhash64(col("a_id"), col("b_id")), lit(nBatches)))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    edges.count()
    (0 until nBatches).foreach { b =>
      val t0 = System.nanoTime()
      val fin = graft.streaming.StreamOps.clustersIngestBatch(root,
        metricsEvery = 0)(
        edges.filter(col("slice") === b).select(col("a_id"), col("b_id")),
        b.toLong)
      val tIngest = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val planLen = fin.queryExecution.explainString(
        org.apache.spark.sql.execution.SimpleMode).length
      val tPlan = (System.nanoTime() - t1) / 1e9
      println(f"[ingestplan] batch $b ingest $tIngest%8.2fs  " +
        f"finPlanChars $planLen%10d renderedIn $tPlan%6.2fs")
    }
    val t2 = System.nanoTime()
    graft.streaming.StreamOps.compactClustersIndex(spark, root)
    println(f"[ingestplan] compaction ${(System.nanoTime() - t2) / 1e9}%8.2fs")
    spark.stop()
  }
}
