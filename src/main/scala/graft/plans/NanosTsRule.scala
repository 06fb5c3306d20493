package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType, TimestampType}

/** Restores parquet pushdown for timestamp-range predicates on the
  * TIMESTAMP(NANOS) physical form.
  *
  * Under `nanosAsLong`, a NANOS-form `ts` column reads as LONG and
  * `Tables.normEventsTs` converts it with
  * `timestamp_micros(ts div 1000)` — integer division, because epoch
  * nanos exceed double's mantissa. That arithmetic is opaque to
  * parquet filter pushdown: a `ts >= T` range predicate stops at the
  * Filter node and every row group is read, silently costing the
  * full scan that partition/row-group pruning should have skipped —
  * at 100 TB, the difference between reading a day and reading a
  * decade.
  *
  * The rule derives, for each comparison between the converted
  * expression and a timestamp literal, a SOUND bound on the RAW long
  * column and appends it as an extra conjunct — the original
  * predicate stays as the exact residual (the
  * [[RangeJoinBucketingRule]] superset-plus-residual philosophy), so
  * rewritten plans are equality-preserving BY CONSTRUCTION and only
  * the derived, scan-pushable conjunct is new.
  *
  * Bound soundness under `div`'s truncation-toward-zero semantics
  * (floor for a ≥ 0, ceil for a < 0 — the sign cases differ, so the
  * uniform ±999 slack is what makes one bound valid for both):
  * with d = a div 1000 and literal micros m,
  *   d ≥ m ⟹ a ≥ 1000m − 999        d > m ⟹ a ≥ 1000m + 1
  *   d ≤ m ⟹ a ≤ 1000m + 999        d < m ⟹ a ≤ 1000m − 1
  *   d = m ⟹ 1000m − 999 ≤ a ≤ 1000m + 999
  * NanosTsRuleSpec exhaustively checks all five shapes against every
  * nanos value in a window spanning negative/zero/positive epochs.
  */
object NanosTsPushdownRule extends Rule[LogicalPlan] with PredicateHelper {

  /** |micros| above this would overflow `micros * 1000`; such
    * literals (year ±294k) get no derived bound. */
  private val MaxSafeMicros = Long.MaxValue / 1000 - 1

  /** timestamp_micros(a div 1000) over a long column. */
  private object NanosToTs {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(IntegralDivide(a, DivisorThousand(), _))
        if a.dataType == LongType => Some(a)
      case _ => None
    }
  }

  private object DivisorThousand {
    def unapply(e: Expression): Boolean = e match {
      case Literal(1000L, LongType) => true
      case Literal(1000, IntegerType) => true
      case Cast(Literal(1000, IntegerType), LongType, _, _) => true
      case _ => false
    }
  }

  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, TimestampType) if math.abs(m) <= MaxSafeMicros => Some(m)
      case _ => None
    }
  }

  private def geq(a: Expression, v: Long) =
    GreaterThanOrEqual(a, Literal(v, LongType))
  private def leq(a: Expression, v: Long) =
    LessThanOrEqual(a, Literal(v, LongType))

  /** Derived raw-long bounds for one conjunct (empty when the shape
    * doesn't match). Both operand orders are normalized here. */
  private def boundsOf(conjunct: Expression): Seq[Expression] = conjunct match {
    case GreaterThanOrEqual(NanosToTs(a), TsLit(m)) => Seq(geq(a, m * 1000 - 999))
    case LessThanOrEqual(TsLit(m), NanosToTs(a)) => Seq(geq(a, m * 1000 - 999))
    case GreaterThan(NanosToTs(a), TsLit(m)) => Seq(geq(a, m * 1000 + 1))
    case LessThan(TsLit(m), NanosToTs(a)) => Seq(geq(a, m * 1000 + 1))
    case LessThanOrEqual(NanosToTs(a), TsLit(m)) => Seq(leq(a, m * 1000 + 999))
    case GreaterThanOrEqual(TsLit(m), NanosToTs(a)) => Seq(leq(a, m * 1000 + 999))
    case LessThan(NanosToTs(a), TsLit(m)) => Seq(leq(a, m * 1000 - 1))
    case GreaterThan(TsLit(m), NanosToTs(a)) => Seq(leq(a, m * 1000 - 1))
    case EqualTo(NanosToTs(a), TsLit(m)) =>
      Seq(geq(a, m * 1000 - 999), leq(a, m * 1000 + 999))
    case EqualTo(TsLit(m), NanosToTs(a)) =>
      Seq(geq(a, m * 1000 - 999), leq(a, m * 1000 + 999))
    case _ => Nil
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan transform {
    case f @ Filter(cond, child) =>
      val conjuncts = splitConjunctivePredicates(cond)
      // idempotent under the fixed-point batch: a bound already
      // present (semantically) is never appended again
      val derived = conjuncts.flatMap(boundsOf)
        .filterNot(d => conjuncts.exists(_.semanticEquals(d)))
        .distinct
      if (derived.isEmpty) f
      else Filter((conjuncts ++ derived).reduce(And), child)
  }

  /** Runtime injection for sessions built without
    * `spark.sql.extensions` — idempotent; called by the events
    * loader exactly when the NANOS long form is detected. */
  def ensureInjected(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(NanosTsPushdownRule))
      spark.experimental.extraOptimizations = cur :+ NanosTsPushdownRule
  }
}
