package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.{Inner, LeftOuter}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{BooleanType, DataType}

/** Marker wrapping the ON condition of an `ASOF JOIN` between parse
  * and rewrite.
  *
  * [[GraftSqlParser]] turns `… ASOF [LEFT] JOIN r ON cond` into
  * `… [LEFT] JOIN r ON graft_asof_marker(cond)` — a shape Spark's
  * grammar accepts — and [[AsofJoinRewriteRule]] replaces the marked
  * join with the window-bounded equi join that implements as-of
  * semantics. The marker must survive analysis and the optimizer's
  * early passes intact, which its shape guarantees:
  *  - it is ONE conjunct whose references span both join sides, so
  *    predicate pushdown can neither split it nor move it below the
  *    join;
  *  - `foldable` is false, so constant folding cannot erase it even
  *    when the wrapped condition folds.
  *
  * It is never meant to execute: if the rewrite rule is not injected
  * (a session without `spark.sql.extensions` and without
  * [[AsofJoinRewriteRule.ensureInjected]]), evaluation fails with an
  * actionable message instead of silently running the marked join as
  * a plain join — wrong rows are worse than a loud error. */
case class GraftAsofCond(child: Expression)
    extends UnaryExpression with Predicate {
  override def foldable: Boolean = false
  override def nullable: Boolean = child.nullable
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BooleanType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_asof_marker expects a boolean join condition, got ${child.dataType}")
  private def notRewritten = new UnsupportedOperationException(
    "ASOF JOIN was parsed but not rewritten: register " +
      "graft.plans.AsofJoinRewriteRule (spark.sql.extensions=" +
      "graft.functions.GraftExtensions or AsofJoinRewriteRule" +
      ".ensureInjected), and keep the ASOF condition to equality " +
      "conjuncts plus exactly one </<=/>/>= between the two sides")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    throw notRewritten
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw notRewritten
  override protected def withNewChildInternal(newChild: Expression): GraftAsofCond =
    copy(child = newChild)
}

/** Optimizer rule: lower an `ASOF JOIN` (marked by [[GraftAsofCond]],
  * see [[GraftSqlParser]]) into the window-bounded equi join.
  *
  * Semantics implemented (DuckDB `ASOF JOIN`, reference e3's shape):
  * for each left row, the single right row sharing the equality keys
  * whose ordering column is the LATEST satisfying `l.t >= r.t` (or
  * `>`; the EARLIEST for `<=`/`<`) — `LEFT` keeps unmatched left rows
  * with nulls. The lowering:
  *
  * {{{
  *   l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t
  *   ⇒ l LEFT JOIN (r + next = lead(t) OVER (PARTITION BY k
  *                                           ORDER BY t, tiebreaks))
  *       ON l.k = r.k AND l.t >= r.t
  *          AND (next IS NULL OR NOT l.t >= next)
  * }}}
  *
  * Exactly one right row survives per (left row, key): the matching
  * rows form a prefix of the window order (nulls sort FIRST in both
  * directions so a null ordering value can never be the `next` of a
  * real one), and only the prefix's last element has a `next` that
  * fails the predicate. Ties on the ordering column are broken by the
  * remaining right columns (ascending for backward as-of, descending
  * for forward), picking the max/min tuple — the same row the
  * engine's one-pass form keeps (EventQueries.e3AsofJoinOf orders by
  * (ts, side, id), so the largest id at the winning timestamp wins
  * there too).
  *
  * Scale note: the rewrite plans as a hash/sort-merge EQUI join on
  * the keys with the range bound as residual — per-key work is
  * O(clicks × errors) in the worst (single hot key) case, the classic
  * residual-filter cost. This rule is the SQL DOOR for as-of queries;
  * the engine's production paths remain the linear one-pass
  * (EventQueries.e3AsofJoin), the skew-safe two-phase (e12), and the
  * probe-routed auto form (e15).
  *
  * Registered via `GraftExtensions` (`spark.sql.extensions`) or at
  * runtime with [[AsofJoinRewriteRule.ensureInjected]]. */
object AsofJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(_, _, _, Some(cond), _) if j.resolved &&
        splitConjunctivePredicates(cond).exists(_.isInstanceOf[GraftAsofCond]) =>
      rewrite(j)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"ASOF JOIN: $msg")

  private def rewrite(j: Join): LogicalPlan = {
    j.joinType match {
      case LeftOuter | Inner =>
      case t => fail(s"only ASOF JOIN and ASOF LEFT JOIN are supported, got $t")
    }
    val (markers, outer) = splitConjunctivePredicates(j.condition.get)
      .partition(_.isInstanceOf[GraftAsofCond])
    if (markers.size != 1) fail("exactly one ASOF condition per join")
    val inner = splitConjunctivePredicates(
      markers.head.asInstanceOf[GraftAsofCond].child)

    val (lset, rset) = (j.left.outputSet, j.right.outputSet)
    // Some(true) = left-side expression, Some(false) = right-side
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty || !e.deterministic) None
      else if (e.references.subsetOf(lset)) Some(true)
      else if (e.references.subsetOf(rset)) Some(false)
      else None

    var eqs = Seq.empty[(Expression, Expression)] // (left expr, right expr)
    // (left expr, right expr, predicate builder, backward?)
    var ineq: Option[(Expression, Expression,
      (Expression, Expression) => Expression, Boolean)] = None
    def setIneq(l: Expression, r: Expression,
        mk: (Expression, Expression) => Expression, back: Boolean): Unit = {
      if (ineq.isDefined) fail("more than one ordering inequality in the condition")
      ineq = Some((l, r, mk, back))
    }
    inner.foreach {
      case e @ (EqualTo(_, _) | EqualNullSafe(_, _)) =>
        val (a, b) = e match {
          case EqualTo(x, y) => (x, y)
          case EqualNullSafe(x, y) => (x, y)
        }
        (sideOf(a), sideOf(b)) match {
          case (Some(true), Some(false)) => eqs :+= ((a, b))
          case (Some(false), Some(true)) => eqs :+= ((b, a))
          case _ => fail(s"equality does not span the two sides: ${e.sql}")
        }
      case c: BinaryComparison =>
        (sideOf(c.left), sideOf(c.right)) match {
          case (Some(true), Some(false)) => c match {
            case _: GreaterThanOrEqual => setIneq(c.left, c.right, GreaterThanOrEqual, true)
            case _: GreaterThan => setIneq(c.left, c.right, GreaterThan, true)
            case _: LessThanOrEqual => setIneq(c.left, c.right, LessThanOrEqual, false)
            case _: LessThan => setIneq(c.left, c.right, LessThan, false)
            case other => fail(s"unsupported comparison: ${other.sql}")
          }
          case (Some(false), Some(true)) => c match {
            // mirrored spelling: r.t <= l.t ≡ l.t >= r.t
            case _: LessThanOrEqual => setIneq(c.right, c.left, GreaterThanOrEqual, true)
            case _: LessThan => setIneq(c.right, c.left, GreaterThan, true)
            case _: GreaterThanOrEqual => setIneq(c.right, c.left, LessThanOrEqual, false)
            case _: GreaterThan => setIneq(c.right, c.left, LessThan, false)
            case other => fail(s"unsupported comparison: ${other.sql}")
          }
          case _ => fail(s"comparison does not span the two sides: ${c.sql}")
        }
      case other => fail(s"unsupported conjunct in the ASOF condition: ${other.sql}")
    }
    val (lexpr, rexpr, mk, backward) = ineq.getOrElse(
      fail("no ordering inequality (</<=/>/>=) in the condition"))
    if (!RowOrdering.isOrderable(rexpr.dataType))
      fail(s"ordering column type is not orderable: ${rexpr.dataType}")

    // backward as-of keeps the LATEST matching right row → ascending
    // window, survivor = last match; forward keeps the EARLIEST →
    // descending. NullsFirst in BOTH directions: a null ordering value
    // never matches the predicate, and putting nulls first keeps them
    // out of every real row's lead.
    val dir = if (backward) Ascending else Descending
    def so(e: Expression) = SortOrder(e, dir, NullsFirst, Seq.empty)
    val ties = j.right.output
      .filterNot(a => rexpr.semanticEquals(a))
      .filter(a => RowOrdering.isOrderable(a.dataType))
    val sorts = so(rexpr) +: ties.map(so(_))
    val partKeys = eqs.map(_._2)
    val lead = Lead(rexpr, Literal(1), Literal(null, rexpr.dataType), false)
    val nxt = Alias(WindowExpression(lead,
      WindowSpecDefinition(partKeys, sorts, lead.frame)), "__graft_asof_next")()
    val win = Window(Seq(nxt), partKeys, sorts, j.right, None)
    val nref = nxt.toAttribute
    val boundary = Or(IsNull(nref), Not(mk(lexpr, nref)))
    val cond = (inner ++ outer :+ boundary).reduce(And)
    Project(j.output, Join(j.left, win, j.joinType, Some(cond), j.hint))
  }

  /** Runtime injection for sessions built without
    * `spark.sql.extensions` — idempotent. NOTE: only the REWRITE can
    * be injected at runtime; the `ASOF JOIN` SYNTAX needs the parser,
    * which Spark only accepts at session build time (the extensions
    * config route). */
  def ensureInjected(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraOptimizations
    if (!cur.contains(AsofJoinRewriteRule))
      spark.experimental.extraOptimizations = cur :+ AsofJoinRewriteRule
  }
}
