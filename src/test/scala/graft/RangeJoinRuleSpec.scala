package graft

import java.sql.Timestamp
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.plans.RangeJoinBucketingRule

/** The no-equi-key interval join must be rewritten to a bucketed
  * equi join by RangeJoinBucketingRule — identical results to the
  * naive (BNLJ) plan, with the pair-product operator gone. */
class RangeJoinRuleSpec extends SparkSpec {

  override def beforeAll(): Unit = {
    super.beforeAll()
    RangeJoinBucketingRule.ensureInjected(spark)
  }

  override def afterAll(): Unit = {
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RangeJoinBucketingRule)
    spark.conf.unset(RangeJoinBucketingRule.BinConfKey)
    super.afterAll()
  }

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def withoutRule[A](f: => A): A = {
    // the rule is ALSO config-injected (SparkSpec builds the session
    // with graft.functions.GraftExtensions), so disabling means the
    // conf kill switch, not just dropping the runtime injection
    spark.conf.set(RangeJoinBucketingRule.EnabledConfKey, "false")
    try f finally spark.conf.unset(RangeJoinBucketingRule.EnabledConfKey)
  }

  /** AQE query-stage wrappers are leaf nodes (their subtree is not in
    * `children`), so operator presence is checked on the plan STRING,
    * the same convention PlanSpec uses. */
  private def pairProductOps(df: DataFrame): Int = {
    df.collect()
    val flat = (df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }).toString
    "BroadcastNestedLoopJoin|CartesianProduct".r.findAllIn(flat).size
  }

  private def rows(df: DataFrame): Set[Seq[Any]] =
    df.collect().map(_.toSeq).toSet

  private lazy val intervals = {
    import spark.implicits._
    Seq(
      (10L, ts("2024-01-01 10:00:00")),
      (11L, ts("2024-01-01 10:07:30")),  // bounds straddle a bucket edge
      (12L, ts("2024-01-01 23:55:00"))). // window crosses midnight
      toDF("err_id", "s")
  }

  private lazy val probes = {
    import spark.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00")),   // == lo of 10 (inclusive)
      (2L, ts("2024-01-01 10:09:59")),
      (3L, ts("2024-01-01 10:10:00")),   // == lo+W of 10 (excluded by <)
      (4L, ts("2024-01-01 10:17:29")),
      (5L, ts("2024-01-02 00:04:59")),
      (6L, ts("2024-01-03 09:00:00"))).  // matches nothing
      toDF("click_id", "ts")
  }

  test("timestamp interval join: same rows as the naive plan, no pair-product operator") {
    def query = intervals.join(probes,
      probes("ts") >= intervals("s") &&
        probes("ts") < intervals("s") + expr("INTERVAL 10 MINUTES"))
    val naive = withoutRule { assert(pairProductOps(query) === 1); rows(query) }
    assert(pairProductOps(query) === 0)
    assert(rows(query) === naive)
    assert(naive.map(r => (r(0), r(2))) === Set(
      (10L, 1L), (10L, 2L), (11L, 2L), (11L, 3L), (11L, 4L), (12L, 5L)))
  }

  test("numeric inclusive bounds: same rows as the naive plan, no pair-product operator") {
    import spark.implicits._
    val ranges = Seq((1L, 100L), (2L, 199L)).toDF("rid", "lo")
    val points = Seq((1L, 100L), (2L, 200L), (3L, 299L), (4L, 300L)).toDF("pid", "v")
    def query = ranges.join(points,
      points("v") >= ranges("lo") && points("v") <= ranges("lo") + lit(100L))
    val naive = withoutRule { assert(pairProductOps(query) === 1); rows(query) }
    assert(pairProductOps(query) === 0)
    assert(rows(query) === naive)
    assert(naive.map(r => (r(0), r(2))) === Set(
      (1L, 1L), (1L, 2L), (2L, 2L), (2L, 3L)))
  }

  test("a join that already has an equi key is left alone") {
    import spark.implicits._
    val a = Seq((1L, 100L)).toDF("k", "lo")
    val b = Seq((1L, 150L), (2L, 150L)).toDF("k2", "v")
    val q = a.join(b, a("k") === b("k2") &&
      b("v") >= a("lo") && b("v") <= a("lo") + lit(100L))
    assert(!q.queryExecution.optimizedPlan.toString.contains("graft_bkt"))
    assert(rows(q) === Set(Seq(1L, 100L, 1L, 150L)))
  }

  test("independent end column: fires only with an explicit bin width") {
    import spark.implicits._
    val ranges = Seq((1L, 100L, 250L), (2L, 400L, 420L)).toDF("rid", "lo", "hi")
    val points = Seq((1L, 100L), (2L, 250L), (3L, 260L), (4L, 419L)).toDF("pid", "v")
    def query = ranges.join(points,
      points("v") >= ranges("lo") && points("v") <= ranges("hi"))
    val naive = withoutRule { rows(query) }
    // no width derivable and no conf → untouched (still the naive plan)
    assert(pairProductOps(query) === 1)
    spark.conf.set(RangeJoinBucketingRule.BinConfKey, "100")
    try {
      assert(pairProductOps(query) === 0)
      assert(rows(query) === naive)
      assert(naive.map(r => (r(0), r(3))) === Set(
        (1L, 1L), (1L, 2L), (2L, 4L)))
    } finally spark.conf.unset(RangeJoinBucketingRule.BinConfKey)
  }
}
