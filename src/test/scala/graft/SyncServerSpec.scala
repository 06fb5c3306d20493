package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.model.VendorApi
import graft.pipeline.SyncServer
import graft.sink.MergeWriter

/** The HTTP service skin over SyncJob: GET /health, /products,
  * /products/wholecell against a live server on an ephemeral port
  * with fixture fetchers — response envelopes in the reference's
  * field names, per-vendor fault isolation inside the 200 path, 404
  * and the sink actually written. */
class SyncServerSpec extends SparkSpec {

  private def get(port: Int, path: String): (Int, String) = {
    val conn = new java.net.URL(s"http://127.0.0.1:$port$path")
      .openConnection().asInstanceOf[java.net.HttpURLConnection]
    conn.setRequestMethod("GET")
    conn.setConnectTimeout(10000); conn.setReadTimeout(120000)
    val code = conn.getResponseCode
    val is = if (code >= 400) conn.getErrorStream else conn.getInputStream
    val body = new String(is.readAllBytes(), "UTF-8")
    conn.disconnect()
    (code, body)
  }

  test("health, full sync, filtered sync, 404 — live round-trips") {
    import spark.implicits._
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val sink = Files.createTempDirectory("graft-server-sink").toString + "/vp"
    val apis = Seq(
      VendorApi("a1", "v-100", "app1", "s1", Some("wholecell")),
      VendorApi("a2", "v-300", "app3", "s3", Some("other-db")),  // error row
      VendorApi("a4", "v-400", "app4", "s4", Some("wholecell"))) // fetch fails
    val fetch: graft.sources.HttpSource.Fetcher = { api =>
      api.vendorId match {
        case "v-100" => scala.util.Success(resourceText("vendor_items_v100.json"))
        case _ => scala.util.Failure(new RuntimeException("boom"))
      }
    }
    val server = SyncServer.start(spark, 0, () => apis.toDS(), fetch, sink)
    val port = server.getAddress.getPort
    try {
      val (hc, hb) = get(port, "/health")
      assert(hc == 200 && hb.contains("\"ok\":true"))

      val (pc, pb) = get(port, "/products")
      assert(pc == 200, pb)
      assert(pb.contains("\"message\":\"Vendor sync complete\""))
      // reference field names, ok row counters (SyncJobSpec goldens)
      assert(pb.contains("\"vendorId\":\"v-100\"") &&
        pb.contains("\"totalFetched\":9") && pb.contains("\"validProducts\":3"))
      // fault isolation: failed vendors are error entries in the 200
      assert(pb.contains("\"vendorId\":\"v-300\"") && pb.contains("\"error\":"))
      assert(pb.contains("\"vendorId\":\"v-400\"") && pb.contains("boom"))
      assert(pb.contains("\"timestamp\":\""))
      // and the sink was really written
      assert(MergeWriter.readSnapshot(spark, sink)
        .filter(col("vendorId") === "v-100").count() > 0)

      val (wc, wb) = get(port, "/products/wholecell")
      assert(wc == 200, wb)
      assert(wb.contains("\"message\":\"Wholecell vendor sync complete\""))
      // other-db vendor filtered OUT of the wholecell route entirely
      assert(!wb.contains("v-300"))

      val (nc, _) = get(port, "/products/nope")
      assert(nc == 404)
    } finally server.stop(0)
  }

  test("empty wholecell credential set gets the dedicated response") {
    import spark.implicits._
    spark.conf.set("graft.sync.admin.path", resourcePath("admin_products.json"))
    val sink = Files.createTempDirectory("graft-server-empty").toString + "/vp"
    val apis = Seq(VendorApi("a2", "v-300", "app3", "s3", Some("other-db")))
    val fetch: graft.sources.HttpSource.Fetcher =
      _ => scala.util.Failure(new IllegalStateException("never called"))
    val server = SyncServer.start(spark, 0, () => apis.toDS(), fetch, sink)
    try {
      val (c, b) = get(server.getAddress.getPort, "/products/wholecell")
      assert(c == 200)
      assert(b.contains("\"message\":\"No Wholecell vendors found\"") &&
        b.contains("\"summary\":[]"), b)
    } finally server.stop(0)
  }
}
