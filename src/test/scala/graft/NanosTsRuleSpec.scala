package graft

import org.apache.spark.sql.functions._
import graft.plans.NanosTsPushdownRule

/** NanosTsPushdownRule: sound derived bounds for ts-range predicates
  * under the TIMESTAMP(NANOS) long physical form, verified two ways —
  * exhaustive value-level equivalence (the rewritten filter keeps
  * EXACTLY the rows the unrewritten one keeps, across sign
  * boundaries where div's truncation flips between floor and ceil),
  * and plan-level: the derived long bound reaches PushedFilters. */
class NanosTsRuleSpec extends SparkSpec {

  /** A long-form events file (ts in NANOS), as `nanosAsLong` would
    * present it: written once per suite run. The nanos window spans
    * negative/zero/positive epochs so truncation-toward-zero's two
    * regimes are both populated, plus every offset around the ±999
    * slack edges. */
  private lazy val longFormDir: String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_nanos_").toString
    val nanos = (-3000000L to 3000000L by 1777L) ++
      (-2000L to 2000L) ++ Seq(Long.MinValue / 2, Long.MaxValue / 2)
    nanos.zipWithIndex.map { case (n, i) => (i.toLong, n) }
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  private def loaded = graft.sources.Tables.normEventsTs(
    spark.read.parquet(s"$longFormDir/events.parquet"))

  test("rewritten range filters keep exactly the unrewritten rows — all five shapes") {
    NanosTsPushdownRule.ensureInjected(spark)
    // ground truth computed WITHOUT the rule: the same predicate on a
    // a frame Spark materialized first (rule can't fire across the
    // localCheckpoint boundary's leaf)
    val base = loaded.localCheckpoint(true)
    // literal = 1 micro: the boundary where a = -999..999 all map to
    // d = 0 and truncation's floor/ceil regimes meet
    for (cmpName <- Seq("geq", "gt", "leq", "lt", "eq")) {
      val pred: org.apache.spark.sql.Column = {
        val tsLit = to_timestamp(lit("1970-01-01 00:00:00.000001")) // = 1 micro
        cmpName match {
          case "geq" => col("ts") >= tsLit
          case "gt" => col("ts") > tsLit
          case "leq" => col("ts") <= tsLit
          case "lt" => col("ts") < tsLit
          case "eq" => col("ts") === tsLit
        }
      }
      val expect = base.filter(pred).select(col("event_id"))
        .collect().map(_.getLong(0)).toSet
      val got = loaded.filter(pred).select(col("event_id"))
        .collect().map(_.getLong(0)).toSet
      assert(got == expect,
        s"$cmpName: rewritten filter diverged (missing=${expect -- got} " +
          s"extra=${got -- expect})")
    }
    // conjunction of both directions (the common range shape)
    val lo = to_timestamp(lit("1969-12-31 23:59:59.999"))
    val hi = to_timestamp(lit("1970-01-01 00:00:00.002"))
    val pred = col("ts") >= lo && col("ts") < hi
    val expect = base.filter(pred).collect().map(_.getLong(0)).toSet
    val got = loaded.filter(pred).collect().map(_.getLong(0)).toSet
    assert(got == expect, s"range: missing=${expect -- got} extra=${got -- expect}")
  }

  test("the derived long bound reaches the parquet scan's PushedFilters") {
    NanosTsPushdownRule.ensureInjected(spark)
    val df = loaded
      .filter(col("ts") >= to_timestamp(lit("1970-01-01 00:00:00.001")))
      .select(col("event_id"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("GreaterThanOrEqual(ts,"),
      "derived raw-long bound did not reach PushedFilters:\n" + plan.take(2000))
  }

  test("idempotent: re-optimizing an already-bounded filter adds nothing") {
    NanosTsPushdownRule.ensureInjected(spark)
    val df = loaded.filter(col("ts") >= to_timestamp(lit("1970-01-01 00:00:00.001")))
    val once = df.queryExecution.optimizedPlan
    val twice = NanosTsPushdownRule(once)
    assert(twice.fastEquals(once), "rule is not a fixpoint on its own output")
  }
}
