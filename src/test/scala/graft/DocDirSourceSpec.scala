package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._
import graft.sources.{DocDirSource, DocStore}

/** The graft-docs DSv2 source: collections are subdirectories, one
  * JSON document per file — the exported shape of the reference's
  * MongoDB store. Pins the read, the from_json typed mapping,
  * collection pushdown reaching FILE LISTING, bin-packing, and the
  * readAdmin docs: backend end-to-end through a full sync. */
class DocDirSourceSpec extends SparkSpec {

  private def writeDoc(root: String, coll: String, name: String, body: String): Unit = {
    val dir = Paths.get(root, coll)
    Files.createDirectories(dir)
    Files.write(dir.resolve(name), body.getBytes("UTF-8"))
  }

  private def fixtureRoot(): String = {
    val root = Files.createTempDirectory("graft-docdir").toString
    writeDoc(root, "admin_products", "p1.json",
      """{"_id": "ap-1", "name": "iPhone 12", "specifications": {"storage": "128GB"}}""")
    writeDoc(root, "admin_products", "p2.json",
      """{"_id": "ap-2", "name": "Galaxy S21", "specifications": {"storage": "256GB"}}""")
    writeDoc(root, "vendors", "v1.json", """{"vendorId": "v-100"}""")
    // non-json files are not documents
    Files.write(Paths.get(root, "vendors", "README.txt"), "x".getBytes)
    root
  }

  test("raw read: every collection's documents, schema fixed") {
    val root = fixtureRoot()
    val df = spark.read.format("graft-docs").load(root)
    assert(df.schema == DocDirSource.Schema)
    assert(df.count() == 3)
    assert(df.filter(col("collection") === "vendors").count() == 1)
    val sizes = df.select(col("size")).as[Long](org.apache.spark.sql.Encoders.scalaLong)
      .collect()
    assert(sizes.forall(_ > 0))
  }

  test("collection filter is pushed into file listing") {
    val root = fixtureRoot()
    // unit level: the listing itself prunes
    assert(DocDirSource.planFiles(root, None).size == 3)
    val pruned = DocDirSource.planFiles(root, Some(Set("admin_products")))
    assert(pruned.size == 2 && pruned.forall(_.collection == "admin_products"))
    // plan level: the pushed filter reaches the scan description
    val df = spark.read.format("graft-docs").load(root)
      .filter(col("collection") === "admin_products")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("collections=admin_products"),
      "pushdown missing from scan:\n" + plan.take(2000))
    assert(df.count() == 2)
  }

  test("bin-packing bounds partition count by bytes plus per-file open cost") {
    import DocDirSource.{DocFile, pack}
    val files = (1 to 10).map(i => DocFile(s"/f$i", "c", 0L, 10L))
    assert(pack(files, 1000L, openCost = 0L).size == 1)
    assert(pack(files, 25L, openCost = 0L).map(_.size).sum == 10)
    assert(pack(files, 25L, openCost = 0L).forall(_.map(_.size).sum <= 30))
    assert(pack(Seq(DocFile("/big", "c", 0L, 10000L)), 100L, 0L).size == 1) // oversize alone
    assert(pack(Seq.empty, 100L).isEmpty)
    // the Spark openCostInBytes analog: a million tiny docs must NOT
    // collapse into one serial partition — default cost caps a
    // 128 MB partition at ~32 open files
    val tiny = (1 to 320).map(i => DocFile(s"/t$i", "c", 0L, 2048L))
    val packed = pack(tiny, 128L * 1024 * 1024)
    assert(packed.size >= 10, s"tiny files collapsed into ${packed.size} partitions")
    assert(packed.forall(_.size <= 32))
    assert(packed.map(_.size).sum == 320)
  }

  test("readCollection maps documents through from_json to typed rows") {
    val root = fixtureRoot()
    val admin = DocStore.readCollection(spark, root, "admin_products",
      graft.model.Schemas.adminProduct)
    val rows = admin.select(col("_id"), col("name"),
        col("specifications.storage")).collect()
      .map(r => (r.getString(0), r.getString(1), r.getString(2))).sortBy(_._1)
    assert(rows.toSeq == Seq(("ap-1", "iPhone 12", "128GB"),
      ("ap-2", "Galaxy S21", "256GB")))
  }

  test("full sync with the admin catalog served from the document store") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-docdir-sync").toString
    // same catalog content as the admin_products.json fixture, one
    // document per file — the sync must behave identically
    val fixture = ujsonLikeSplit(resourceText("admin_products.json"))
    fixture.zipWithIndex.foreach { case (doc, i) =>
      writeDoc(root, "admin_products", s"d$i.json", doc)
    }
    spark.conf.set("graft.sync.admin.path", s"docs:$root#admin_products")
    try {
      val sink = Files.createTempDirectory("graft-docdir-sink").toString + "/vp"
      val apis = Seq(graft.model.VendorApi("a", "v-100", "app", "s", Some("wholecell")))
      val fetch: graft.sources.HttpSource.Fetcher =
        _ => scala.util.Success(resourceText("vendor_items_v100.json"))
      val res = graft.pipeline.SyncJob.sync(spark, apis.toDS(), fetch, sink,
        now = java.sql.Timestamp.valueOf("2026-08-13 00:00:00"))
      val s = res.summary.head
      // same counters as SyncJobSpec's golden for v-100
      assert(s.totalFetched == 9 && s.validProducts == 3 && s.skippedProducts == 1)
    } finally spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
  }

  /** Split the multiLine JSON array fixture into one string per
    * element — documents for the docdir — without a JSON library:
    * elements are `{...}` objects at nesting depth 1. */
  private def ujsonLikeSplit(arrayJson: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    var depth = 0; var start = -1; var inStr = false; var esc = false
    arrayJson.zipWithIndex.foreach { case (c, i) =>
      if (esc) esc = false
      else if (inStr) { if (c == '\\') esc = true else if (c == '"') inStr = false }
      else c match {
        case '"' => inStr = true
        case '{' => depth += 1; if (depth == 1) start = i
        case '}' => if (depth == 1 && start >= 0) { out += arrayJson.substring(start, i + 1); start = -1 }; depth -= 1
        case _ =>
      }
    }
    out.result()
  }
}
