package graft

import org.apache.spark.sql.functions._
import graft.queries.LayoutQueries

/** Z-order layout: interleave exactness (vs a driver-side reference
  * and via the lossless roundtrip) and the thing the layout exists
  * for — measured file-level min/max pruning on a 2-D box filter,
  * z-layout vs single-column sort order. */
class ZOrderSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def mortonRef(x: Long, y: Long): Long = {
    var z = 0L
    var i = 0
    while (i < 16) {
      z |= ((x >> i) & 1L) << (2 * i)
      z |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    z
  }

  test("zKey matches the driver-side Morton reference on every lineitem row") {
    val rows = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey"), col("l_suppkey"),
        LayoutQueries.zKey(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val expect = mortonRef(r.getLong(0) & 0xffffL, r.getLong(1) & 0xffffL)
      assert(r.getLong(2) == expect,
        s"(${r.getLong(0)}, ${r.getLong(1)}): got ${r.getLong(2)}, want $expect")
    }
  }

  test("unZKey inverts zKey: the interleave is lossless") {
    val bad = graft.sources.Tables.lineitem(spark, sf)
      .select(col("l_partkey").bitwiseAND(lit(0xffffL)).as("x"),
        col("l_suppkey").bitwiseAND(lit(0xffffL)).as("y"),
        LayoutQueries.zKey(col("l_partkey"), col("l_suppkey")).as("zkey"))
      .filter(LayoutQueries.unZKey(col("zkey"), 0) =!= col("x") ||
        LayoutQueries.unZKey(col("zkey"), 1) =!= col("y"))
      .count()
    assert(bad == 0L)
  }

  test("z-ordered files prune a 2-D box filter that a single-column sort cannot") {
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    val root = java.nio.file.Files
      .createTempDirectory("graft-zorder").toString
    val nFiles = 16
    LayoutQueries.zorderWrite(li, "l_partkey", "l_suppkey",
      s"$root/zorder", nFiles)
    // the contender: the natural single-column layout (sorted by the
    // write-order key, here orderkey — what a plain ETL emits)
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions(col("l_orderkey"))
      .write.mode("overwrite").parquet(s"$root/linear")

    // a box in the middle of both ACTUAL key domains (~20% of the
    // partkey range, ~33% of the small suppkey range) — derived from
    // the data so the test measures pruning at any SF
    val b = li.agg(min("l_partkey"), max("l_partkey"),
      min("l_suppkey"), max("l_suppkey")).collect()(0)
    val (pMin, pMax, sMin, sMax) =
      (b.getLong(0), b.getLong(1), b.getLong(2), b.getLong(3))
    val (p1, p2) = (pMin + (pMax - pMin) * 2 / 5, pMin + (pMax - pMin) * 3 / 5)
    val (s1, s2) = (sMin + (sMax - sMin) / 3, sMin + (sMax - sMin) * 2 / 3)

    // file-level min/max stats — the skipping decision a lakehouse
    // data-skipping index (or the parquet footer check) makes
    def filesTouched(path: String): (Int, Int) = {
      val files = new java.io.File(path).listFiles()
        .filter(f => f.getName.endsWith(".parquet")).map(_.getAbsolutePath)
      val touched = files.count { f =>
        val r = spark.read.parquet(f)
          .agg(min("l_partkey"), max("l_partkey"),
            min("l_suppkey"), max("l_suppkey")).collect()(0)
        val (pLo, pHi, sLo, sHi) =
          (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
        pHi >= p1 && pLo <= p2 && sHi >= s1 && sLo <= s2
      }
      (touched, files.length)
    }
    val (zTouched, zTotal) = filesTouched(s"$root/zorder")
    val (lTouched, lTotal) = filesTouched(s"$root/linear")
    info(s"box filter touches $zTouched/$zTotal z-ordered files " +
      s"vs $lTouched/$lTotal order-sorted files")
    // correctness floor: both layouts hold the same rows — and the
    // box must actually select some (an empty box proves nothing)
    val want = li.filter(col("l_partkey").between(p1, p2) &&
      col("l_suppkey").between(s1, s2)).count()
    assert(want > 0, s"degenerate test box [$p1,$p2]×[$s1,$s2]")
    for (p <- Seq("zorder", "linear")) {
      val got = spark.read.parquet(s"$root/$p")
        .filter(col("l_partkey").between(p1, p2) &&
          col("l_suppkey").between(s1, s2)).count()
      assert(got == want, s"$p layout lost rows: $got vs $want")
    }
    // the point: partkey is uncorrelated with write order, so the
    // linear layout intersects (nearly) every file while the Z
    // layout confines the box to a few curve segments
    assert(lTouched > 0 && zTouched * 2 <= lTouched,
      s"z-order pruning too weak: $zTouched vs $lTouched files")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(root))
  }

  test("z-order maintenance: unsorted appends degrade locality, the OPTIMIZE " +
      "compaction restores it, replay is a no-op, heal-first") {
    import graft.streaming.StreamOps
    val tbl = java.nio.file.Files.createTempDirectory("graft-ztable").toString
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
      .persist()
    def rowSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    val want = rowSet(li)
    for (i <- 0L until 4L)
      StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(
        li.filter(pmod(xxhash64(col("l_orderkey")), lit(4)) === i), i + 1L)
    assert(rowSet(StreamOps.readZorder(spark, tbl)) == want)
    // each hash-sliced append spans the whole key space, so every
    // file pair's zkey ranges overlap — locality is fully degraded
    val h1 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    val n1 = h1.getAs[Long]("n_files")
    assert(n1 >= 4 && h1.getAs[Long]("overlap_pairs") == n1 * (n1 - 1) / 2,
      s"expected full overlap before compaction: $h1")
    // replay: marker-guarded no-op
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(
      li.filter(pmod(xxhash64(col("l_orderkey")), lit(4)) === 2), 3L)
    assert(rowSet(StreamOps.readZorder(spark, tbl)) == want)
    // OPTIMIZE: byte-identical rows, disjoint per-file zkey segments
    StreamOps.compactZorder(spark, tbl, "l_partkey", "l_suppkey", 8)
    assert(rowSet(StreamOps.readZorder(spark, tbl)) == want,
      "compaction changed the row multiset")
    val h2 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    assert(h2.getAs[Long]("overlap_pairs") == 0L,
      s"compaction left overlapping zkey ranges: $h2")
    // ingest continues; locality decays again from the clean base
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(
      li.filter(pmod(xxhash64(col("l_orderkey")), lit(4)) === 0)
        .withColumn("l_orderkey", col("l_orderkey") + 10000000L), 5L)
    val h3 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    assert(h3.getAs[Long]("overlap_pairs") > 0L)
    // crash inside the compaction swap — reader heals it
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val after = rowSet(StreamOps.readZorder(spark, tbl))
    assert(fs.rename(new org.apache.hadoop.fs.Path(s"$tbl/rows"),
      new org.apache.hadoop.fs.Path(s"$tbl/rows__old")))
    assert(rowSet(StreamOps.readZorder(spark, tbl)) == after,
      "reader did not heal the interrupted swap")
    // crash BETWEEN the data move and the marker create: the data
    // landed but the marker didn't, so the batch replays — the
    // deterministic per-batch file names make the replay overwrite
    // its own files instead of appending duplicates
    fs.delete(new org.apache.hadoop.fs.Path(
      s"$tbl/_graft_zorder_batches/b5"), false)
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(
      li.filter(pmod(xxhash64(col("l_orderkey")), lit(4)) === 0)
        .withColumn("l_orderkey", col("l_orderkey") + 10000000L), 5L)
    assert(rowSet(StreamOps.readZorder(spark, tbl)) == after,
      "marker-less replay duplicated the batch's rows")
    li.unpersist()
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tbl))
  }

  test("z-order maintenance on a fresh table: empty read, zero health, " +
      "health rides the zstats ledger not a table scan") {
    import graft.streaming.StreamOps
    val tbl = java.nio.file.Files.createTempDirectory("graft-zfresh").toString
    // fresh root (no applied batch yet): read is empty, health is 0/0
    assert(StreamOps.readZorder(spark, tbl).count() == 0L)
    val h0 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    assert(h0.getAs[Long]("n_files") == 0L &&
      h0.getAs[Long]("overlap_pairs") == 0L)
    // an EMPTY first micro-batch creates the marker but no rows/ —
    // the exact shape the reader and the health poll must survive
    val li = graft.sources.Tables.lineitem(spark, "/root/testdata/sf0.001")
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(
      li.limit(0), 1L)
    assert(StreamOps.readZorder(spark, tbl).count() == 0L)
    assert(StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0).getAs[Long]("n_files") == 0L)
    // two real batches: the ledger holds one row per landed file, and
    // deleting it forces (and persists) the scan-repair path with the
    // same exact answer
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(li.limit(50), 2L)
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(
      li.orderBy(col("l_orderkey").desc).limit(50), 3L)
    val h1 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    val fs = new org.apache.hadoop.fs.Path(tbl)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val zstats = new org.apache.hadoop.fs.Path(s"$tbl/zstats")
    assert(fs.exists(zstats), "writers did not maintain the zstats ledger")
    assert(spark.read.parquet(zstats.toString).select("f").distinct().count()
      == h1.getAs[Long]("n_files"))
    fs.delete(zstats, true)
    val h2 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    assert(h2 == h1, s"ledger-less repair diverged: $h2 vs $h1")
    assert(fs.exists(zstats), "the scan-repair was not persisted")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tbl))
  }

  test("an all-null-dim batch applies (null ledger range) instead of " +
      "replay-looping; health counts it rangeless") {
    import graft.streaming.StreamOps
    val tbl = java.nio.file.Files.createTempDirectory("graft-znull").toString
    val li = graft.sources.Tables.lineitem(spark, sf)
      .select("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
    // every row's zkey is null: min/max over the staged file are null,
    // which used to NPE the ledger extraction before the marker — a
    // permanently stuck batch
    val allNull = li.limit(100)
      .withColumn("l_partkey", lit(null).cast("long"))
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(allNull, 1L)
    assert(StreamOps.readZorder(spark, tbl).count() == 100,
      "all-null batch rows were lost")
    val h1 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    assert(h1.getAs[Long]("n_files") == 1 && h1.getAs[Long]("overlap_pairs") == 0,
      s"rangeless file mis-audited: $h1")
    // a real batch coexists: one ranged + one rangeless file → still
    // zero overlapping pairs, rows intact, replay still a no-op
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(li.limit(50), 2L)
    val h2 = StreamOps.zorderHealth(spark, tbl, "l_partkey", "l_suppkey")
      .collect()(0)
    assert(h2.getAs[Long]("n_files") == 2 && h2.getAs[Long]("overlap_pairs") == 0,
      s"one ranged + one rangeless file should not pair: $h2")
    val before = StreamOps.readZorder(spark, tbl).count()
    StreamOps.zorderIngestBatch(tbl, "l_partkey", "l_suppkey")(allNull, 1L)
    assert(StreamOps.readZorder(spark, tbl).count() == before,
      "replay of the null-dim batch duplicated rows")
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(tbl))
  }

  test("endpoint sweep: two-phase bucketed count equals the brute-force pair count") {
    import graft.streaming.StreamOps
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val iv = (1 to 300).map { i =>
      val lo = rnd.nextInt(100000).toLong
      (s"f$i", lo, lo + rnd.nextInt(3000).toLong)
    }
    var brute = 0L
    val arr = iv.toArray
    for (i <- arr.indices; j <- i + 1 until arr.length)
      if (!(arr(i)._3 < arr(j)._2 || arr(j)._3 < arr(i)._2)) brute += 1
    val n = arr.length.toLong
    val disjoint = StreamOps.zorderSweepFrame(iv.toDF("f", "lo", "hi"))
      .collect()(0).getLong(0)
    assert(n * (n - 1) / 2 - disjoint == brute,
      s"sweep overlap ${n * (n - 1) / 2 - disjoint} != brute $brute")
    // degenerate span: every interval identical → one bucket, width 1,
    // all pairs overlap
    val same = (1 to 40).map(i => (s"g$i", 7L, 7L))
    val d2 = StreamOps.zorderSweepFrame(same.toDF("f", "lo", "hi"))
      .collect()(0).getLong(0)
    assert(d2 == 0L, s"identical intervals must all overlap, disjoint=$d2")
  }

  test("endpoint sweep plan: every partition-less window is aggregate-bounded") {
    import graft.streaming.StreamOps
    import spark.implicits._
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LWindow}
    val ranged = Seq(("a", 1L, 5L), ("b", 3L, 9L), ("c", 10L, 12L))
      .toDF("f", "lo", "hi")
    val plan = StreamOps.zorderSweepFrame(ranged).queryExecution.optimizedPlan
    // the bucket-carry prefix is the ONE global window allowed, and
    // only because its input is the ≤ZorderSweepBuckets-row per-bucket
    // aggregate — a partition-less window whose subtree has no
    // Aggregate would serialize all 2F events through one task again
    val bad = plan.collect {
      case w: LWindow if w.partitionSpec.isEmpty &&
          !w.child.exists(_.isInstanceOf[Aggregate]) => w
    }
    assert(bad.isEmpty,
      s"partition-less window over non-aggregated input:\n${bad.mkString("\n")}")
    assert(plan.collect {
      case w: LWindow if w.partitionSpec.nonEmpty => w
    }.nonEmpty, "the F-proportional sweep must run in a PARTITIONED window")
  }
}
