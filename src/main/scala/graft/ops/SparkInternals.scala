package graft.ops

import org.apache.spark.sql.SparkSession

/** THE fence around Spark-internal API surfaces the engine touches.
  *
  * Two non-public contracts live here and nowhere else, so a Spark
  * minor bump that moves them breaks exactly ONE file:
  *
  *   - `org.apache.spark.sql.classic.SparkSession` — the concrete
  *     session class behind the `sql.SparkSession` interface since the
  *     Spark 4 connect/classic split. Verified against Spark 4.1.x;
  *     on upgrade, re-check the package (pre-4.0 this was the public
  *     class itself, and the module has moved once already).
  *   - `SQLConf.withExistingConf` — the thread-local conf override
  *     the analyzer's `SQLConf.get` consults before the session conf.
  *     Verified against Spark 4.1.x: ResolveTimeZone and every other
  *     analysis-time conf read go through `SQLConf.get`, which is what
  *     makes the pin below both effective and thread-scoped.
  */
object SparkInternals {

  private def classic(spark: SparkSession): org.apache.spark.sql.classic.SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]

  /** Run `body` with SQL conf overrides visible ONLY to this thread's
    * plan construction: a clone of the session conf with `pairs`
    * applied is installed as the thread-local `SQLConf.get` for the
    * duration. Concurrent planning on other threads — a streaming
    * micro-batch mid-analysis — never sees the overrides, and there
    * is no session-global set/restore race. Conf reads that happen at
    * EXECUTION time are unaffected — this pins what the analyzer
    * bakes into the plan (time-zone resolution, ANSI flags), nothing
    * later. */
  def withThreadConf[T](spark: SparkSession, pairs: (String, String)*)(body: => T): T = {
    val conf = classic(spark).sessionState.conf.clone()
    pairs.foreach { case (k, v) => conf.setConfString(k, v) }
    org.apache.spark.sql.internal.SQLConf.withExistingConf(conf)(body)
  }

  /** Build a frame whose rendered timestamps are UTC wall clock in
    * ANY session timezone: `date_format` resolves its zone at
    * ANALYSIS time (ResolveTimeZone reads `SQLConf.get` when the
    * frame is built), so pinning UTC during construction bakes it
    * into the plan. */
  def withUtcRendering[T](spark: SparkSession)(body: => T): T =
    withThreadConf(spark, "spark.sql.session.timeZone" -> "UTC")(body)

  /** True when the session's SQL cache registry holds nothing —
    * CacheScope's post-query invariant probe. */
  def sqlCacheEmpty(spark: SparkSession): Boolean =
    classic(spark).sharedState.cacheManager.isEmpty
}
