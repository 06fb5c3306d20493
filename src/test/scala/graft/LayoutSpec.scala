package graft

import java.nio.file.Files
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._
import graft.sources.Layout

/** Z-order layout: the Morton key is bit-exact, and the written
  * row-group stats actually prune multi-dimensional boxes — verified
  * against the parquet footers themselves, not a Spark metric. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  test("interleave is the Morton code") {
    // x=5 (101) at even bit positions, y=3 (011) at odd:
    // z = 1<<0 | 0<<2 | 1<<4 | 1<<1 | 1<<3 | 0<<5 = 27
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(Layout.interleave(Seq(col("x"), col("y")), 3).as("z"))
      .as[Long].head()
    assert(z == 27L)
  }

  /** Per row group of every parquet file under `dir`: (min, max) of
    * the named int64 columns, straight from the footers. */
  private def rowGroupStats(dir: String, cols: Seq[String]): Seq[Map[String, (Long, Long)]] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(dir).getFileSystem(conf)
    fs.listStatus(new Path(dir)).toSeq
      .filter(_.getPath.getName.endsWith(".parquet"))
      .flatMap { st =>
        val r = ParquetFileReader.open(HadoopInputFile.fromPath(st.getPath, conf))
        try {
          import scala.jdk.CollectionConverters._
          r.getFooter.getBlocks.asScala.toSeq.map { b =>
            b.getColumns.asScala
              .filter(c => cols.contains(c.getPath.toDotString))
              .map { c =>
                val s = c.getStatistics
                c.getPath.toDotString ->
                  (s.genericGetMin.asInstanceOf[Long].longValue(),
                    s.genericGetMax.asInstanceOf[Long].longValue())
              }.toMap
          }
        } finally r.close()
      }
  }

  private def overlapping(stats: Seq[Map[String, (Long, Long)]],
      box: Map[String, (Long, Long)]): Int =
    stats.count(rg => box.forall { case (c, (lo, hi)) =>
      val (mn, mx) = rg(c); mx >= lo && mn <= hi
    })

  test("z-ordered layout prunes row groups on BOTH box dimensions") {
    val n = 65536
    val df = spark.range(n.toLong).select(
      (col("id") % 256).as("x"), (col("id") / 256).cast("long").as("y"),
      col("id").as("payload"))
    val dir = Files.createTempDirectory("zorder").toString
    val zDir = s"$dir/z"
    val xDir = s"$dir/xsorted"
    Layout.writeZOrdered(df, zDir, Seq("x", "y"), bits = 8, numFiles = 16)
    df.repartitionByRange(16, col("x")).sortWithinPartitions(col("x"))
      .write.mode("overwrite").parquet(xDir)

    val zStats = rowGroupStats(zDir, Seq("x", "y"))
    val xStats = rowGroupStats(xDir, Seq("x", "y"))
    assert(zStats.size >= 8 && xStats.size >= 8,
      s"expected >=8 row groups, got z=${zStats.size} x=${xStats.size}")

    // y-only predicate: the x-sorted layout cannot prune at all
    // (every file spans full y); the z layout keeps ~1 tile row
    val yBand = Map("y" -> (0L, 31L))
    val zY = overlapping(zStats, yBand)
    val xY = overlapping(xStats, yBand)
    assert(xY >= xStats.size * 3 / 4, s"x-sorted unexpectedly pruned y-band: $xY/${xStats.size}")
    assert(zY * 2 <= zStats.size, s"z layout failed to prune y-band: $zY/${zStats.size}")

    // 2-d box: z keeps the one corner tile (plus boundary slack)
    val box = Map("x" -> (0L, 31L), "y" -> (0L, 31L))
    val zBox = overlapping(zStats, box)
    assert(zBox <= 3, s"z layout kept $zBox row groups for a 1-tile box")
    assert(zBox <= overlapping(xStats, box))

    // pruning is an optimization, never a semantics change
    val pred = col("x").between(0, 31) && col("y").between(0, 31)
    val fromZ = spark.read.parquet(zDir).filter(pred)
      .select(col("payload")).as[Long].collect().sorted.toSeq
    val fromX = spark.read.parquet(xDir).filter(pred)
      .select(col("payload")).as[Long].collect().sorted.toSeq
    assert(fromZ == fromX && fromZ.size == 32 * 32)
  }
}
