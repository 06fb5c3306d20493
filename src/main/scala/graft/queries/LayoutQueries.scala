package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Z-order (Morton) data layout — the write-side half of scan
  * pruning at 100 TB.
  *
  * Every read-side query in this engine leans on parquet min/max
  * stats to skip files and row groups; what decides whether those
  * stats PRUNE is how rows were laid out when written. Sorting by
  * one column gives perfect pruning on that column and none on any
  * other; interleaving the bits of two (or more) bounded dimensions
  * into one sort key (Morton 1966 — the Z-order curve every
  * lakehouse OPTIMIZE implements) gives each file a small RECTANGLE
  * of the key space, so a conjunctive range filter on EITHER — or
  * both — dimensions skips most files. The layout is a one-time
  * write-side shuffle (a range partition by zkey); the read-side
  * win repeats on every query.
  *
  * The interleave itself is exact integer bit arithmetic — shifts,
  * masks, ORs, all codegen'd builtins — which is what makes the
  * `q_zorder_key` row hash-gateable: DuckDB recomputes the identical
  * key from the rendered bit polynomial (no `<<`/`&` in the oracle
  * text — bit i is extracted with the exact-multiple floor division
  * `(x - x%2^i)/2^i % 2`, every intermediate below 2^53).
  *
  * Dimensions must be bounded non-negative integers; the `% 2^bits`
  * mask here documents the contract (keys beyond the mask wrap and
  * destroy locality — at production scale you first rank-normalize
  * each dimension into the 16-bit domain with approx quantiles,
  * which preserves ORDER, the only thing Z-locality needs).
  */
object LayoutQueries {

  private val ZBits = 16
  private val ZMask = (1L << ZBits) - 1
  /** 2^32 key space split into 64 equal-width buckets. */
  private val ZBucketShift = 2 * ZBits - 6

  /** Morton interleave of two masked 16-bit dimensions: x rides the
    * even bit positions, y the odd. One codegen'd expression — 32
    * shift/mask/or terms, no UDF, no join. The bit layout IS
    * [[graft.sources.Layout.interleave]] at d=2 (bit i of col k →
    * position 2i+k), so this delegates rather than keeping a second
    * Morton implementation in sync. */
  def zKey(x: Column, y: Column, bits: Int = ZBits): Column = {
    val mask = lit((1L << bits) - 1)
    graft.sources.Layout.interleave(
      Seq(x.cast("long").bitwiseAND(mask), y.cast("long").bitwiseAND(mask)),
      bits)
  }

  /** Inverse of [[zKey]] for one dimension: gather the even
    * (offset 0 → x) or odd (offset 1 → y) bits. Spec ammunition —
    * the roundtrip proves the interleave lossless. */
  def unZKey(z: Column, offset: Int, bits: Int = ZBits): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(z, 2 * i + offset).bitwiseAND(lit(1L)), i)
    }.reduce(_ bitwiseOR _)

  /** Production writer: range-partition by zkey into `nFiles` and
    * sort within each — every file then owns a compact Z-curve
    * segment (a bounded rectangle union in (x, y) space), which is
    * exactly what min/max file skipping needs. The shuffle is the
    * same sample-based range exchange a global sort uses; at 1000
    * executors it is one pass over the table, and AQE coalesces
    * skewed key ranges. */
  def zorderWrite(df: DataFrame, dimX: String, dimY: String,
      outPath: String, nFiles: Int): Unit =
    graft.sources.Layout.writeClustered(
      df, zKey(col(dimX), col(dimY)), outPath, nFiles)

  /** `q_zorder_key`: the Morton key + its equal-width layout bucket
    * for every lineitem row on (l_partkey, l_suppkey) — the
    * oracle-gated kernel of [[zorderWrite]] (the writer's range
    * boundaries are sample-based and so not cross-engine
    * reproducible; the equal-width bucket is, and exposes the same
    * locality structure to the hash gate). */
  def qZorderKey(spark: SparkSession, dir: String): DataFrame = {
    val z = zKey(col("l_partkey"), col("l_suppkey"))
    Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        z.as("zkey"),
        shiftright(z, ZBucketShift).as("zbucket"))
  }

  /** Portable SQL for bit `i` of non-negative bounded `x`:
    * floor(x / 2^i) % 2 in the exact-multiple form. */
  private def bitSql(x: String, i: Int): String = {
    val p = 1L << i
    if (i == 0) s"($x % 2)"
    else s"(CAST(($x - ($x % $p)) / $p AS BIGINT) % 2)"
  }

  /** DuckDB oracle for `q_zorder_key`, rendered from the same
    * constants: the 32-term interleave polynomial over the masked
    * dimensions, bucket via the same exact-multiple division. */
  private[graft] def zorderOracleSql: String = {
    val terms =
      (0 until ZBits).map(i => s"${bitSql("xm", i)} * ${1L << (2 * i)}") ++
      (0 until ZBits).map(i => s"${bitSql("ym", i)} * ${1L << (2 * i + 1)}")
    val poly = terms.mkString("(", "\n             + ", ")")
    val bw = 1L << ZBucketShift
    s"""WITH m AS (SELECT l_orderkey, l_linenumber,
                 l_partkey % ${ZMask + 1} AS xm,
                 l_suppkey % ${ZMask + 1} AS ym
                 FROM lineitem),
          z AS (SELECT l_orderkey, l_linenumber,
             $poly AS zkey
             FROM m)
       SELECT l_orderkey, l_linenumber, zkey,
         CAST((zkey - (zkey % $bw)) / $bw AS BIGINT) AS zbucket
       FROM z"""
  }
}
