package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.CalendarInterval

/** Optimizer rule: rewrite a no-equi-key interval join into a
  * bucketed equi join.
  *
  * Spark plans a bare range predicate — `probe.ts >= i.s && probe.ts
  * < i.s + W` with no equality conjunct — as a broadcast-nested-loop
  * join: the full pair product, quadratic at scale. This rule detects
  * the shape and rewrites it to the bucketed form the engine
  * hand-codes in `EventQueries.e5RangeJoin` (SURVEY §8): quantize the
  * probe column into width-W buckets, explode each interval onto the
  * bucket range its bounds span (2 rows for a width-W window), and
  * join on bucket EQUALITY with the original predicate kept as the
  * residual filter. Shuffle volume becomes 2·|intervals| + |probes|
  * rows instead of the product — the rewrite behind industrial
  * range-join optimizations, done as a `Rule[LogicalPlan]` so the
  * naive declarative query gets the scale plan for free.
  *
  * Fires only when ALL hold:
  *  - inner join whose condition has NO equi conjunct between the
  *    sides (with one, Spark already plans a hash/sort-merge join and
  *    the range predicate is a cheap residual);
  *  - conjuncts bound one side's column p into `[lo, lo + W)` (any
  *    mix of strict/inclusive) where lo comes from the other side and
  *    W is a foldable positive literal (numeric `Add` or day-time
  *    `TimestampAddInterval`) — or, when the upper bound is an
  *    independent column (start/end interval tables), the session
  *    sets `spark.graft.rangejoin.bin` to an explicit bucket width
  *    (seconds for timestamps), the same knob industrial range-join
  *    hints expose;
  *  - p, lo, hi are deterministic.
  *
  * Correctness does not depend on the width: buckets are generated as
  * `sequence(bucket(lo), bucket(hi))` with the SAME float pipeline as
  * the probe's bucket, and `bucket` is monotone, so every probe value
  * within [lo, hi] lands inside the interval's generated range even
  * at IEEE rounding boundaries (a hand-rolled `floor+1` would miss a
  * probe whose quotient rounds across the next bucket edge). A probe
  * row carries ONE bucket and the generated range is strictly
  * increasing, so a qualifying pair meets on exactly one bucket value
  * — no duplicate results, no dedup pass.
  *
  * Registered via `GraftExtensions` (`spark.sql.extensions`) or at
  * runtime with [[RangeJoinBucketingRule.ensureInjected]].
  */
object RangeJoinBucketingRule extends Rule[LogicalPlan] with PredicateHelper {

  val BinConfKey = "spark.graft.rangejoin.bin"

  /** Session kill switch (default on) — config-injected rules cannot
    * be removed at runtime, so the off-switch is a conf, the same
    * shape as Spark's own optimizer flags. */
  val EnabledConfKey = "spark.graft.rangejoin.enabled"

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (!conf.getConfString(EnabledConfKey, "true").toBoolean) plan
    else plan.transform {
      case j @ Join(_, _, Inner, Some(cond), _)
          if j.resolved && cond.deterministic && !hasEquiKey(j) =>
        rewrite(j).getOrElse(j)
    }

  private def hasEquiKey(j: Join): Boolean =
    splitConjunctivePredicates(j.condition.get).exists {
      case EqualTo(l, r) => spansSides(j, l, r)
      case EqualNullSafe(l, r) => spansSides(j, l, r)
      case _ => false
    }

  private def spansSides(j: Join, l: Expression, r: Expression): Boolean = {
    val (lo, ro) = (j.left.outputSet, j.right.outputSet)
    (l.references.subsetOf(lo) && r.references.subsetOf(ro) &&
      l.references.nonEmpty && r.references.nonEmpty) ||
    (l.references.subsetOf(ro) && r.references.subsetOf(lo) &&
      l.references.nonEmpty && r.references.nonEmpty)
  }

  /** A one-sided bound `probe OP boundExpr` normalized so the probe
    * expression is on the left. */
  private case class Bound(probe: Expression, bound: Expression, isLower: Boolean)

  private def boundsOf(j: Join, e: Expression): Option[Bound] = {
    val (lo, ro) = (j.left.outputSet, j.right.outputSet)
    def oneSided(a: Expression, b: Expression): Boolean =
      a.references.nonEmpty && b.references.nonEmpty &&
        ((a.references.subsetOf(lo) && b.references.subsetOf(ro)) ||
         (a.references.subsetOf(ro) && b.references.subsetOf(lo)))
    e match {
      case GreaterThanOrEqual(a, b) if oneSided(a, b) => Some(Bound(a, b, isLower = true))
      case GreaterThan(a, b) if oneSided(a, b) => Some(Bound(a, b, isLower = true))
      case LessThanOrEqual(a, b) if oneSided(a, b) => Some(Bound(a, b, isLower = false))
      case LessThan(a, b) if oneSided(a, b) => Some(Bound(a, b, isLower = false))
      case _ => None
    }
  }

  private def stripCast(e: Expression): Expression = e match {
    case Cast(c, _, _, _) => stripCast(c)
    case _ => e
  }

  /** Bucket width implied by `hi` relative to `lo`, in the units of
    * the probe's cast-to-double domain (epoch seconds for
    * timestamps, raw value otherwise). */
  private def widthOf(lo: Expression, hi: Expression): Option[Double] = {
    def litWidth(l: Literal): Option[Double] = l.dataType match {
      case _: DayTimeIntervalType =>
        Some(l.value.asInstanceOf[Long] / 1e6)
      case CalendarIntervalType =>
        val i = l.value.asInstanceOf[CalendarInterval]
        if (i.months == 0) Some(i.days * 86400.0 + i.microseconds / 1e6) else None
      case _: NumericType =>
        Some(l.value.toString.toDouble)
      case _ => None
    }
    stripCast(hi) match {
      case Add(b, l: Literal, _) if stripCast(b).semanticEquals(stripCast(lo)) => litWidth(l)
      case Add(l: Literal, b, _) if stripCast(b).semanticEquals(stripCast(lo)) => litWidth(l)
      case TimestampAddInterval(b, l: Literal, _) if stripCast(b).semanticEquals(stripCast(lo)) =>
        litWidth(l)
      case _ => None
    }
  }

  /** `floor(cast(x as double) / W)` as a long — monotone in x; the
    * identical expression buckets probes and interval bounds.
    * Time-zone-aware nodes built inside the optimizer must carry the
    * session zone explicitly (the analyzer's ResolveTimeZone has
    * already run, so an unset zone leaves the plan unresolved). */
  private def bucketOf(x: Expression, w: Double): Expression = {
    val zone = Some(conf.sessionLocalTimeZone)
    Cast(Floor(Divide(Cast(x, DoubleType, zone), Literal(w))), LongType, zone)
  }

  private def rewrite(j: Join): Option[LogicalPlan] = {
    val conjuncts = splitConjunctivePredicates(j.condition.get)
    val bounds = conjuncts.flatMap(boundsOf(j, _))
    // group the bounds by probe expression; need one probe with both
    // a lower and an upper bound from the opposite side
    val candidates = bounds.groupBy(_.probe.canonicalized).values.flatMap { bs =>
      for {
        lower <- bs.find(_.isLower)
        upper <- bs.find(!_.isLower)
      } yield (lower.probe, lower.bound, upper.bound)
    }
    candidates.headOption.flatMap { case (p, loB, hiB) =>
      // probe must be entirely from one side, both bounds from the other
      val probeFromLeft = p.references.subsetOf(j.left.outputSet)
      val intervalSide = if (probeFromLeft) j.right else j.left
      val probeSide = if (probeFromLeft) j.left else j.right
      val ok = loB.references.subsetOf(intervalSide.outputSet) &&
        hiB.references.subsetOf(intervalSide.outputSet) &&
        supportedDomain(p.dataType)
      val width = widthOf(loB, hiB).orElse(confBin).filter(_ > 0)
      if (!ok || width.isEmpty) None
      else {
        val w = width.get
        // interval side: explode onto sequence(bucket(lo), bucket(hi))
        val seq = Sequence(bucketOf(loB, w), bucketOf(hiB, w), None,
          Some(conf.sessionLocalTimeZone))
        val bktI = AttributeReference("graft_bkt", LongType, nullable = false)()
        val gen = Generate(Explode(seq), unrequiredChildIndex = Nil,
          outer = false, qualifier = None,
          generatorOutput = Seq(bktI), child = intervalSide)
        // probe side: its single bucket
        val bktPAlias = Alias(bucketOf(p, w), "graft_bkt_p")()
        val proj = Project(probeSide.output :+ bktPAlias, probeSide)
        val newCond = And(EqualTo(bktI, bktPAlias.toAttribute), j.condition.get)
        val (nl, nr) = if (probeFromLeft) (proj, gen) else (gen, proj)
        Some(Project(j.output, Join(nl, nr, Inner, Some(newCond), j.hint)))
      }
    }
  }

  private def supportedDomain(dt: DataType): Boolean = dt match {
    case _: NumericType | TimestampType | TimestampNTZType => true
    case _ => false
  }

  private def confBin: Option[Double] =
    Option(conf.getConfString(BinConfKey, null)).map(_.toDouble)

  /** Runtime injection for sessions built without
    * `spark.sql.extensions` — idempotent. */
  def ensureInjected(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(RangeJoinBucketingRule))
      spark.experimental.extraOptimizations = cur :+ RangeJoinBucketingRule
  }
}
