package graft

import java.nio.file.Files
import java.sql.Timestamp
import scala.util.{Failure, Success, Try}

import org.apache.spark.sql.functions._
import graft.model.VendorApi
import graft.pipeline.SyncJob
import graft.sink.MergeWriter

/** End-to-end sync scenario vs hand-derived goldens (SURVEY §5#2):
  * the full §3.1 DAG over the FIXTURES.md vendor fixtures, covering
  * P1-P10, J1/J2/J5, A1/A2, J4/A4/K1/K2 and the A5 summary,
  * including the documented quirks (accumulate-on-resync, error
  * rows, backfill). */
class SyncJobSpec extends SparkSpec {

  private val apis = Seq(
    VendorApi("va-01", "v-100", "app1", "s1", Some("wholecell")),
    VendorApi("va-02", "v-200", "app2", "s2", None), // K2 backfill path
    VendorApi("va-03", "v-300", "app3", "s3", Some("other-db")), // error row
    VendorApi("va-04", "v-400", "app4", "s4", Some("wholecell"))) // fetch fails

  private val fetch: graft.sources.HttpSource.Fetcher = { api =>
    api.vendorId match {
      case "v-100" => Success(resourceText("vendor_items_v100.json"))
      case "v-200" => Success(resourceText("vendor_items_v200.json"))
      case "v-400" => Failure(new RuntimeException("boom"))
      case other   => Failure(new IllegalStateException(s"unexpected $other"))
    }
  }

  private def run(sinkPath: String, mode: MergeWriter.MergeMode) = {
    import spark.implicits._
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    SyncJob.sync(spark, apis.toDS(), fetch, sinkPath, mode,
      now = Timestamp.valueOf("2026-08-12 00:00:00"))
  }

  test("full sync: sink goldens, summary counters, fault isolation") {
    val sink = Files.createTempDirectory("graft-sink").toString + "/vp"
    val res = run(sink, MergeWriter.Accumulate)

    val byVendor = res.summary.map(s => s.vendorId -> s).toMap
    // v-100: 9 fetched; groups (name×grade among Available):
    //  (iPhone 12, A), (iPhone 12, B), (Galaxy S21, Unknown) valid;
    //  (S9, A) unmatched (len<=3 guard blocks substring) → skipped
    val v100 = byVendor("v-100")
    assert(v100.totalFetched == 9)
    assert(v100.validProducts == 3 && v100.skippedProducts == 1)
    assert(v100.newVendorProducts == 2 && v100.updatedVendorProducts == 0)
    // stock: ap-0001 (4 Black + 1 Red + 1 Blue) + ap-0002 (1) = 7
    assert(v100.totalStockProcessed == 7)
    // v-200: exact-case-insensitive J1 match
    val v200 = byVendor("v-200")
    assert(v200.database == "wholecell") // K2 backfill
    assert(v200.totalFetched == 1 && v200.newVendorProducts == 1)
    // v-300: unsupported database error row
    assert(byVendor("v-300").status == "unsupported_database")
    // v-400: fetch failure isolated
    assert(byVendor("v-400").status == "fetch_failed")
    assert(byVendor("v-400").error.exists(_.contains("boom")))

    // sink golden: the merged Black/128GB option of v-100×ap-0001
    val opts = res.sink
      .filter(col("vendorId") === "v-100" && col("product") === "ap-0001")
      .select(explode(col("selectedOptions")).as("o"))
      .select(col("o.color"), col("o.variant"), col("o.stock"),
        col("o.price"), col("o.uniqueNumbers"))
    import spark.implicits._
    val rows = opts.as[(String, String, Int, Long, Seq[String])]
      .collect().map(r => (r._1, r._2) -> r).toMap
    val black = rows(("Black", "128GB 4GB RAM"))
    assert(black._3 == 4)  // 1001, 1003, 1004 (grade B merged), 1009
    assert(black._4 == 0L) // min(250, 200, 300, 0): null cents → 0
    assert(black._5 == Seq("0xBEEF", "ESN-A1", "SKU-B1", "item_1009"))
    assert(rows(("Red", "Unknown"))._3 == 1)   // null capacity → Unknown
    assert(rows(("Blue", "Unknown"))._3 == 1)  // no spec hit → Unknown
    // v-100 Galaxy S21 resolved by substring pass to the Ultra entry
    val s21 = res.sink.filter(col("vendorId") === "v-100" && col("product") === "ap-0002")
    assert(s21.count() == 1)
  }

  test("vendor fetches overlap: N slow vendors complete in ~max, not ~sum") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft-par").toString + "/vp"
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val slowApis = (1 to 6).map(i =>
      VendorApi(s"sa-$i", s"sv-$i", "app", "s", Some("wholecell")))
    val json = resourceText("vendor_items_v200.json")
    // instrument the fetcher: the timing assertion covers ONLY the
    // fetch intervals (Spark work and JIT are excluded, so a noisy
    // box can't flake this), and observed concurrency is tracked
    // directly
    val inFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxInFlight = new java.util.concurrent.atomic.AtomicInteger(0)
    val spans = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    val slowFetch: graft.sources.HttpSource.Fetcher = { _ =>
      val t0 = System.nanoTime()
      maxInFlight.getAndAccumulate(inFlight.incrementAndGet(), math.max)
      Thread.sleep(1000)
      inFlight.decrementAndGet()
      spans.add((t0, System.nanoTime()))
      Success(json)
    }
    val res = SyncJob.sync(spark, slowApis.toDS(), slowFetch, sink,
      MergeWriter.Accumulate, now = Timestamp.valueOf("2026-08-12 00:00:00"))
    // 6 × 1s sequential would span ≥ 6s of sleeps; overlapped they
    // span ~1s. The 4s bar is impossible for a serialized loop.
    import scala.jdk.CollectionConverters._
    val all = spans.asScala.toSeq
    val fetchSpanMs = (all.map(_._2).max - all.map(_._1).min) / 1000000
    assert(fetchSpanMs < 4000,
      s"6 one-second fetches spanned ${fetchSpanMs}ms — fetch loop is serialized")
    assert(maxInFlight.get() >= 2,
      s"never saw two fetches in flight (max ${maxInFlight.get()})")
    // determinism: summaries come back in input order, all fetched
    assert(res.summary.map(_.vendorId) == slowApis.map(_.vendorId))
    assert(res.summary.forall(s => s.status == "ok" && s.totalFetched == 1))
  }

  test("a hung vendor fetch becomes a fetch_timeout error row, not a hung sync") {
    import spark.implicits._
    import scala.concurrent.duration._
    val sink = Files.createTempDirectory("graft-timeout").toString + "/vp"
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val json = resourceText("vendor_items_v200.json")
    // a fetcher with NO internal timeout that simply never returns —
    // the exact caller-pluggable hazard the shared deadline exists for
    val latch = new java.util.concurrent.CountDownLatch(1)
    val hangingFetch: graft.sources.HttpSource.Fetcher = { api =>
      if (api.vendorId == "hang-1") {
        latch.await(120, java.util.concurrent.TimeUnit.SECONDS)
        Failure(new RuntimeException("woke late"))
      } else Success(json)
    }
    val apis2 = Seq(
      VendorApi("ta-1", "hang-1", "app", "s", Some("wholecell")),
      VendorApi("ta-2", "ok-1", "app", "s", Some("wholecell")))
    val t0 = System.nanoTime()
    val res = try SyncJob.sync(spark, apis2.toDS(), hangingFetch, sink,
      MergeWriter.Accumulate, now = Timestamp.valueOf("2026-08-12 00:00:00"),
      fetchDeadline = 2.seconds)
    finally latch.countDown() // release the abandoned daemon thread
    val byVendor = res.summary.map(s => s.vendorId -> s).toMap
    assert(byVendor("hang-1").status == "fetch_timeout")
    assert(byVendor("hang-1").error.exists(_.contains("deadline")))
    // the healthy vendor is unaffected by its neighbor's hang
    assert(byVendor("ok-1").status == "ok" && byVendor("ok-1").totalFetched == 1)
    // and the sync returned promptly — bounded by the deadline, not
    // the hung fetch (generous bar so a loaded box can't flake it)
    assert((System.nanoTime() - t0) / 1e9 < 60,
      "sync wall time tracked the hung fetch, not the deadline")
  }

  test("executor-side fetch produces the identical sync as the driver pool") {
    import spark.implicits._
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    // a SERIALIZABLE fetcher: captures plain strings, never the spec
    // instance — the executor path ships the closure into tasks
    val v100 = resourceText("vendor_items_v100.json")
    val v200 = resourceText("vendor_items_v200.json")
    val serializableFetch: graft.sources.HttpSource.Fetcher = { api =>
      api.vendorId match {
        case "v-100" => Success(v100)
        case "v-200" => Success(v200)
        case "v-400" => Failure(new RuntimeException("boom"))
        case other   => Failure(new IllegalStateException(s"unexpected $other"))
      }
    }
    val now = Timestamp.valueOf("2026-08-12 00:00:00")
    val execSink = Files.createTempDirectory("graft-exec").toString + "/vp"
    val execRes = SyncJob.sync(spark, apis.toDS(), serializableFetch, execSink,
      MergeWriter.Accumulate, now = now, executorFetch = true)
    val drvSink = Files.createTempDirectory("graft-drv").toString + "/vp"
    val drvRes = SyncJob.sync(spark, apis.toDS(), serializableFetch, drvSink,
      MergeWriter.Accumulate, now = now)
    // identical summaries — statuses (ok / unsupported_database /
    // fetch_failed), counters, and input order all line up
    assert(execRes.summary == drvRes.summary,
      s"summaries diverged:\n${execRes.summary}\nvs\n${drvRes.summary}")
    // identical sink contents
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vendorId"), col("product"), col("condition"),
        col("database"), to_json(col("selectedOptions")).as("opts"))
      .collect().map(_.toSeq).toSet
    assert(canon(execRes.sink) == canon(drvRes.sink))
  }

  test("partial write: a one-vendor sync leaves other vendors' partition files byte-identical") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft-partial").toString + "/vp"
    run(sink, MergeWriter.Accumulate) // both vendors land

    def fingerprint(sub: String): Map[String, String] = {
      val dir = new java.io.File(s"$sink/$sub")
      assert(dir.isDirectory, s"$sub missing")
      dir.listFiles().filter(_.getName.endsWith(".parquet")).map { f =>
        val md = java.security.MessageDigest.getInstance("MD5")
        f.getName -> md.digest(java.nio.file.Files.readAllBytes(f.toPath))
          .map("%02x".format(_)).mkString
      }.toMap
    }
    val v100Before = fingerprint("vendorId=v-100")
    assert(v100Before.nonEmpty)

    // second sync touches ONLY v-200 — v-100's partition must not be
    // rewritten (not even to identical contents: the file set and
    // bytes stay the same because the swap never visits it)
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val res2 = SyncJob.sync(spark,
      apis.filter(_.vendorId == "v-200").toDS(), fetch, sink,
      MergeWriter.Accumulate, now = Timestamp.valueOf("2026-08-13 00:00:00"))
    assert(fingerprint("vendorId=v-100") == v100Before,
      "untouched vendor's files were rewritten")

    // and accumulate semantics still hold for the touched vendor:
    // the re-synced group merges (updated=1), its option stock doubles
    assert(res2.summary.map(s => s.vendorId -> s).toMap
      .apply("v-200").updatedVendorProducts == 1)
    val stock = res2.sink.filter(col("vendorId") === "v-200")
      .select(explode(col("selectedOptions")).as("o"))
      .select(col("o.stock")).as[Int].collect().sum
    val stockOnce = run(
      Files.createTempDirectory("graft-partial2").toString + "/vp",
      MergeWriter.Accumulate).sink
      .filter(col("vendorId") === "v-200")
      .select(explode(col("selectedOptions")).as("o"))
      .select(col("o.stock")).as[Int].collect().sum
    assert(stock == 2 * stockOnce)
  }

  test("a crashed per-vendor swap restores the backup dir on the next partial write") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft-heal").toString + "/vp"
    run(sink, MergeWriter.Accumulate)
    // simulate the crash window: v-100's live dir moved aside to the
    // __vold_ backup, new dir never moved in
    val live = new java.io.File(s"$sink/vendorId=v-100")
    val backup = new java.io.File(s"${sink}__vold_vendorId=v-100")
    assert(live.isDirectory)
    java.nio.file.Files.move(live.toPath, backup.toPath)
    assert(!live.exists())
    // the prescribed recovery is "re-run the sync" — for the CRASHED
    // vendor itself. The snapshot READ must restore the backup before
    // listing files, or the merge would see v-100 as absent, mark all
    // its rows insert, and the write would erase the accumulated
    // stock while deleting the backup.
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val res = SyncJob.sync(spark, apis.toDS(), fetch, sink,
      MergeWriter.Accumulate, now = Timestamp.valueOf("2026-08-13 00:00:00"))
    assert(live.isDirectory && !backup.exists(),
      "crashed swap backup was not restored")
    // accumulate-on-resync over the RESTORED state: stock doubles
    // (7 → 14 per the golden) and the re-synced groups merge, not
    // insert — both impossible if the read had seen v-100 as missing
    val v100 = res.summary.map(s => s.vendorId -> s).toMap.apply("v-100")
    assert(v100.newVendorProducts == 0 && v100.updatedVendorProducts == 2,
      s"v-100 treated as new after crash recovery: $v100")
    assert(v100.totalStockProcessed == 14,
      s"v-100 accumulated stock lost: ${v100.totalStockProcessed}")
  }

  test("accumulate mode doubles stock on re-sync; replace mode is idempotent") {
    import spark.implicits._
    val accSink = Files.createTempDirectory("graft-acc").toString + "/vp"
    run(accSink, MergeWriter.Accumulate)
    val second = run(accSink, MergeWriter.Accumulate)
    val stock2 = second.sink
      .filter(col("vendorId") === "v-100" && col("product") === "ap-0001")
      .select(explode(col("selectedOptions")).as("o"))
      .filter(col("o.color") === "Black")
      .select(col("o.stock")).as[Int].head()
    assert(stock2 == 8) // 4 + 4: the documented non-idempotent accumulate
    assert(second.summary.find(_.vendorId == "v-100").get.updatedVendorProducts == 2)

    val repSink = Files.createTempDirectory("graft-rep").toString + "/vp"
    run(repSink, MergeWriter.Replace)
    val secondRep = run(repSink, MergeWriter.Replace)
    val stockRep = secondRep.sink
      .filter(col("vendorId") === "v-100" && col("product") === "ap-0001")
      .select(explode(col("selectedOptions")).as("o"))
      .filter(col("o.color") === "Black")
      .select(col("o.stock")).as[Int].head()
    assert(stockRep == 4)
  }

  test("K2 write-back persists the backfilled database default") {
    import spark.implicits._
    val sink = Files.createTempDirectory("graft-k2").toString + "/vp"
    val credPath = Files.createTempDirectory("graft-cred").toString + "/apis"
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    SyncJob.sync(spark, apis.toDS(), fetch, sink, MergeWriter.Accumulate,
      now = Timestamp.valueOf("2026-08-12 00:00:00"),
      credentialsOutPath = Some(credPath))
    // A fresh read (nothing shared with the sync) sees the default.
    val persisted = spark.read.parquet(credPath).as[VendorApi]
      .collect().map(a => a.vendorId -> a.database).toMap
    assert(persisted("v-200") == Some("wholecell")) // was None pre-sync
    assert(persisted("v-300") == Some("other-db"))  // untouched
  }

  test("dry-run computes the full summary without touching the sink") {
    val sink = Files.createTempDirectory("graft-dry").toString + "/vp"
    import spark.implicits._
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val res = SyncJob.sync(spark, apis.toDS(), fetch, sink, MergeWriter.Accumulate,
      now = Timestamp.valueOf("2026-08-12 00:00:00"), dryRun = true)
    assert(!new java.io.File(sink).exists()) // sink never created
    val v100 = res.summary.find(_.vendorId == "v-100").get
    assert(v100.totalFetched == 9 && v100.newVendorProducts == 2)
    // the returned frame is the computed (unwritten) snapshot
    assert(res.sink.filter(col("vendorId") === "v-100").count() == 2)
  }

  test("unchanged rows keep their updatedAt across a later sync") {
    val sink = Files.createTempDirectory("graft-upd").toString + "/vp"
    run(sink, MergeWriter.Accumulate)
    // Second sync touches only v-200's vendors; v-100 rows are 'keep'.
    import spark.implicits._
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val later = Timestamp.valueOf("2026-09-01 00:00:00")
    val res = SyncJob.sync(spark,
      apis.filter(_.vendorId == "v-200").toDS(), fetch, sink,
      MergeWriter.Accumulate, now = later)
    val stamps = res.sink.select(col("vendorId"), col("updatedAt"))
      .as[(String, Timestamp)].collect().groupBy(_._1)
    assert(stamps("v-100").forall(_._2 == Timestamp.valueOf("2026-08-12 00:00:00")))
    assert(stamps("v-200").forall(_._2 == later))
  }

  test("full sync against a JDBC-backed sink matches the parquet run") {
    import spark.implicits._
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val now = Timestamp.valueOf("2026-08-12 00:00:00")
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-jdbc-sync")}/db;create=true"
    val store = MergeWriter.JdbcStore(url, "vendor_products")
    val jdbcRes = SyncJob.syncStore(spark, apis.toDS(), fetch, store,
      MergeWriter.Accumulate, now = now)
    val pqSink = Files.createTempDirectory("graft-pq-ref").toString + "/vp"
    val pqRes = run(pqSink, MergeWriter.Accumulate)
    // identical summaries...
    assert(jdbcRes.summary.sortBy(_.vendorId) == pqRes.summary.sortBy(_.vendorId))
    // ...and identical sink contents (canonicalized row set)
    def canon(df: org.apache.spark.sql.DataFrame) = df
      .select(col("vendorId"), col("product"), col("condition"),
        col("database"), to_json(col("selectedOptions")).as("opts"))
      .collect().map(_.toSeq).toSet
    assert(canon(jdbcRes.sink) == canon(pqRes.sink))
    // second sync against the SAME JDBC table accumulates (state
    // really round-trips through Derby)
    val second = SyncJob.syncStore(spark, apis.toDS(), fetch, store,
      MergeWriter.Accumulate, now = now)
    val stock2 = second.sink
      .filter(col("vendorId") === "v-100" && col("product") === "ap-0001")
      .select(explode(col("selectedOptions")).as("o"))
      .filter(col("o.color") === "Black")
      .select(col("o.stock")).as[Int].head()
    assert(stock2 == 8)
  }

  test("JDBC-backed admin catalog yields the same sync as the JSON one") {
    import spark.implicits._
    val url = s"jdbc:derby:${Files.createTempDirectory("graft-admin")}/db;create=true"
    // the JSON fixture, flattened to the relational projection
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val admin = SyncJob.readAdmin(spark)
    admin.select(col("_id"), col("name"),
        col("specifications.storage").as("storage"))
      .write.format("jdbc").option("url", url)
      .option("dbtable", "admin_products").mode("overwrite").save()

    val jsonRun = run(
      Files.createTempDirectory("graft-aj").toString + "/vp", MergeWriter.Accumulate)
    spark.conf.set("graft.sync.admin.path", url)
    spark.conf.set("graft.sync.admin.table", "admin_products")
    try {
      val jdbcRun = SyncJob.sync(spark, apis.toDS(), fetch,
        Files.createTempDirectory("graft-ad").toString + "/vp",
        MergeWriter.Accumulate, now = Timestamp.valueOf("2026-08-12 00:00:00"))
      assert(jdbcRun.summary == jsonRun.summary,
        "JDBC-admin sync diverged from the JSON-admin sync")
    } finally {
      // restore BOTH keys: leaving path at the jdbc URL with table
      // unset would leak the one combination readAdmin rejects into
      // the shared session
      spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
      spark.conf.unset("graft.sync.admin.table")
    }
  }

  test("filtered sync (§3.2) only touches vendors of the given database") {
    val sink = Files.createTempDirectory("graft-filt").toString + "/vp"
    val res = {
      import spark.implicits._
      spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
      SyncJob.sync(spark, apis.toDS(), fetch, sink, MergeWriter.Accumulate,
        filterDb = Some("wholecell"),
        now = Timestamp.valueOf("2026-08-12 00:00:00"))
    }
    // v-300 (other-db) is excluded entirely, not even an error row
    assert(!res.summary.exists(_.vendorId == "v-300"))
    assert(res.summary.map(_.vendorId).toSet == Set("v-100", "v-200", "v-400"))
  }
}
