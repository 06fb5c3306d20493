package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout for multi-dimensional scan
  * pruning — the storage-side lever single-column sorting can't
  * provide. Sorting by `x` makes parquet row-group min/max stats
  * tight on `x` and useless on `y`; interleaving the bits of both
  * columns and range-partitioning + sorting by the interleaved key
  * clusters rows into space-filling-curve tiles, so stats are
  * MODERATELY tight on EVERY participating column and a box
  * predicate prunes row groups on all of them at once. At 100 TB
  * this is the difference between "query by (user, time) reads one
  * tile stripe" and "reads the whole table because time was the
  * only sort key".
  *
  * Same layout discipline as Delta OSS's OPTIMIZE ZORDER BY, built
  * from plain Spark primitives: scale each column to a `bits`-wide
  * integer grid, interleave bits round-robin into a long, then
  * `repartitionByRange` + `sortWithinPartitions` on that key. One
  * extra shuffle at write time buys row-group pruning on every read
  * thereafter — the classic write-once/read-many trade.
  *
  * Scale notes: the only driver-side data is one min/max pair per
  * z-column (a single agg row). The z key is a pure codegen'd
  * bit-expression — no UDF — and the range partitioner's sampling
  * handles non-uniform z densities. Min-max scaling keeps the grid
  * honest for roughly uniform columns; heavily skewed columns
  * should be pre-bucketed by rank (quantile grid), which composes:
  * pass the bucket id as the z-column.
  */
object Layout {

  /** Morton interleave of pre-scaled non-negative grid coordinates:
    * bit `i` of column `k` lands at position `i * d + k`. All
    * `bits * d` terms OR-fold into one whole-stage-codegen
    * expression. */
  private[graft] def interleave(scaled: Seq[Column], bits: Int): Column = {
    val d = scaled.size
    val terms = for (i <- 0 until bits; k <- 0 until d)
      yield shiftleft(shiftright(scaled(k), i).bitwiseAND(lit(1L)), i * d + k)
    terms.reduce(_.bitwiseOR(_))
  }

  /** Scale a numeric column onto the [0, 2^bits) grid given its
    * global min/max. Degenerate range (constant column) maps to 0. */
  private[graft] def gridCoord(c: Column, mn: Double, mx: Double,
      bits: Int): Column = {
    val levels = 1L << bits
    if (mx <= mn) lit(0L)
    else least(lit(levels - 1), greatest(lit(0L),
      floor((c.cast("double") - lit(mn)) / lit(mx - mn) * lit(levels.toDouble))
        .cast("long")))
  }

  /** The z-value of `zCols` under min/max scaling — exposed so specs
    * and readers can recompute tile membership. */
  def zValue(df: DataFrame, zCols: Seq[String], bits: Int): Column = {
    require(zCols.nonEmpty && zCols.size * bits <= 62,
      s"z-order needs 1..n cols with bits*cols <= 62, got ${zCols.size} x $bits")
    val aggs = zCols.flatMap(c =>
      Seq(min(col(c)).cast("double"), max(col(c)).cast("double")))
    val stats = df.agg(aggs.head, aggs.tail: _*).head()
    val scaled = zCols.zipWithIndex.map { case (c, i) =>
      gridCoord(col(c), stats.getDouble(2 * i), stats.getDouble(2 * i + 1), bits)
    }
    interleave(scaled, bits)
  }

  /** Write `df` to parquet clustered along the z-curve of `zCols`.
    * `numFiles` bounds the file count (each file = one curve
    * segment = one spatial tile run); pick it so files land near
    * the target file size at the deployment's scale. */
  def writeZOrdered(df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 12, numFiles: Int = 0): Unit = {
    val files =
      if (numFiles > 0) numFiles
      else df.sparkSession.sessionState.conf.numShufflePartitions
    writeClustered(df, zValue(df, zCols, bits), path, files)
  }

  /** The one range-exchange clustering body both z-order writers
    * share (min/max-scaled [[writeZOrdered]] and the raw-key
    * LayoutQueries.zorderWrite): range-partition by `key` into
    * `numFiles`, sort within each, drop the key, write. */
  private[graft] def writeClustered(df: DataFrame, key: Column,
      path: String, numFiles: Int): Unit =
    df.withColumn("_graft_z", key)
      .repartitionByRange(numFiles, col("_graft_z"))
      .sortWithinPartitions(col("_graft_z"))
      .drop("_graft_z")
      .write.mode("overwrite").parquet(path)
}
