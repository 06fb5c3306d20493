package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object DebugG3 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[T](n: String)(f: => T): T = { val t0 = System.nanoTime(); val r = f
      println(f"[t] $n%-22s ${(System.nanoTime() - t0) / 1e9}%6.2fs"); r }
    for (_ <- 1 to 2) {
      val li = graft.sources.Tables.lineitem(spark, dir)
        .select(col("l_orderkey"), col("l_partkey"))
      val sets = li.groupBy(col("l_orderkey"))
        .agg(collect_set(col("l_partkey")).as("ps"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      t("budget agg")(sets.agg(coalesce(sum(size(col("ps")).cast("long")), lit(0L)),
        coalesce(sum(expr("CAST(size(ps) AS BIGINT) * (size(ps) - 1) div 2")), lit(0L))).head)
      val psArr = t("collect sets")(sets.select(col("ps")).collect()
        .map(_.getSeq[Long](0).toArray))
      sets.unpersist()
      t("g3 full query")(graft.queries.GraphQueries.g3Triangles(spark, dir)
        .write.mode("overwrite").format("noop").save())
      t("g1 full query")(graft.queries.GraphQueries.g1PageRank(spark, dir)
        .write.mode("overwrite").format("noop").save())
      spark.catalog.clearCache()
      println(s"[t] psArr orders ${psArr.length}")
    }
    spark.stop()
  }
}
