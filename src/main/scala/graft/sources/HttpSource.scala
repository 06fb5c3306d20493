package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration
import java.util.Base64
import scala.util.Try

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.model.{Schemas, VendorApi}

/** S3: the vendor HTTP REST source (products.js:233-240) — a
  * driver-side fetch per vendor credential with a Basic-auth header
  * built from `appId:appSecret`, parsed against the explicit
  * envelope schema `{data: [...]}` (malformed/missing `data` →
  * empty, P11's array guard).
  *
  * The fetcher is pluggable so tests inject JSON fixtures instead of
  * sockets. The per-vendor item payload is small relative to the
  * relational work (the reference loads it into one JS array); the
  * DataFrame fan-out happens immediately after parse, so everything
  * downstream is executor-parallel.
  */
object HttpSource {

  /** Per-vendor payload fetch. MUST BE THREAD-SAFE: SyncJob invokes
    * it from a bounded pool (up to SyncJob.FetchParallelism
    * concurrent calls) to overlap vendors' network waits. A stateless
    * fetcher like httpFetcher below (one connection per call) is safe
    * by construction; implementations holding shared mutable state
    * (token refresh, rate limiter, reused session) must synchronize
    * it. */
  type Fetcher = VendorApi => Try[String]

  /** Real HTTP fetcher (driver-side, one GET per vendor; stateless —
    * each call opens its own connection, so concurrent invocation is
    * safe). */
  def httpFetcher(baseUrl: String,
      timeout: Duration = Duration.ofSeconds(30)): Fetcher = { api =>
    Try {
      val auth = Base64.getEncoder.encodeToString(
        s"${api.appId}:${api.appSecret}".getBytes(StandardCharsets.UTF_8))
      val client = HttpClient.newBuilder().connectTimeout(timeout).build()
      val req = HttpRequest.newBuilder(URI.create(baseUrl))
        .timeout(timeout)
        .header("Authorization", s"Basic $auth")
        .header("Accept", "application/json")
        .GET().build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      if (resp.statusCode() / 100 != 2)
        throw new RuntimeException(s"HTTP ${resp.statusCode()} from $baseUrl")
      resp.body()
    }
  }

  /** Wrap any fetcher with bounded retry + exponential backoff —
    * beyond-reference hardening (the reference's one-shot fetch turns
    * every transient 5xx/reset into a failed vendor sync; at hundreds
    * of vendors per run some transient is near-certain). Retries are
    * per-vendor and sleep ON THE FETCH POOL'S thread, so one flaky
    * vendor delays only its own slot, never the other 15. Total worst
    * case stays bounded: attempts × (timeout + backoff). Statelessness
    * (and thus thread-safety) is inherited from the wrapped fetcher. */
  def withRetry(fetch: Fetcher, attempts: Int = 3,
      backoff: Duration = Duration.ofMillis(500),
      sleep: Long => Unit = Thread.sleep): Fetcher = {
    // validated at WRAP time: throwing inside the returned fetcher
    // would escape the per-vendor Try isolation and abort the whole
    // sync from the fetch pool
    require(attempts >= 1, "attempts must be >= 1")
    api =>
    var result = fetch(api)
    var attempt = 1
    while (result.isFailure && attempt < attempts) {
      sleep(backoff.toMillis << (attempt - 1)) // 1×, 2×, 4×, …
      result = fetch(api)
      attempt += 1
    }
    result
  }

  /** Parse one vendor's envelope JSON into items tagged with the
    * vendorId. Corrupt JSON or a non-array `data` yields zero rows
    * (P11 guard) rather than failing the whole sync. */
  def parseItems(spark: SparkSession, vendorId: String, json: String): DataFrame = {
    import spark.implicits._
    val raw: Dataset[String] = spark.createDataset(Seq(json))
    spark.read.schema(Schemas.vendorItemEnvelope).json(raw)
      .select(explode(coalesce(col("data"),
        array().cast(Schemas.vendorItemEnvelope("data").dataType))).as("item"))
      .select(lit(vendorId).as("vendorId"), col("item.*"))
  }

  /** One executor-side fetch outcome: exactly one of payload/error is
    * null. */
  final case class FetchResult(vendorId: String, payload: String, error: String)

  /** EXECUTOR-SIDE fetch fan-out — the scale alternative to the
    * driver pool: the credentials are distributed one vendor per task
    * and each task runs the fetcher on its executor, so payload bytes
    * land distributed and never transit the driver. Right when
    * vendors × payload outgrow one machine's NIC/heap; the driver
    * pool remains the default (reference semantics, simpler failure
    * model, an overall deadline).
    *
    * The fetcher must be SERIALIZABLE (capture plain values, not
    * enclosing test/session state) in addition to thread-safe. A
    * failed task is retried by Spark — fetches are at-least-once,
    * safe for the idempotent GETs this source models. Per-vendor
    * fault isolation is preserved: a vendor's failure is its row's
    * `error`, never a task failure. The result is persisted by the
    * caller's first action; one fetch feeds both the status collect
    * and the items parse. */
  def fetchOnExecutors(spark: SparkSession, apis: Seq[VendorApi],
      fetch: Fetcher): DataFrame = {
    import spark.implicits._
    if (apis.isEmpty)
      return spark.emptyDataset[FetchResult].toDF()
    spark.createDataset(apis)
      .repartition(apis.size) // one vendor per task: full overlap
      .mapPartitions(_.map { api =>
        fetch(api) match {
          case scala.util.Success(json) => FetchResult(api.vendorId, json, null)
          case scala.util.Failure(e) =>
            FetchResult(api.vendorId, null, String.valueOf(e.getMessage))
        }
      }).toDF()
  }

  /** Distributed twin of parseItems over (vendorId, payload) rows:
    * the same envelope schema and P11 array guard, expressed as a
    * `from_json` projection so parsing runs where the payload lives.
    * Corrupt JSON → null struct → zero rows, exactly the driver
    * path's PERMISSIVE behavior (equivalence is spec-pinned). */
  def parseItemsDistributed(fetched: DataFrame): DataFrame = {
    val dataType = Schemas.vendorItemEnvelope("data").dataType
    fetched
      .select(col("vendorId"),
        from_json(col("payload"), Schemas.vendorItemEnvelope).as("env"))
      .select(col("vendorId"),
        explode(coalesce(col("env.data"), array().cast(dataType))).as("item"))
      .select(col("vendorId"), col("item.*"))
  }
}
