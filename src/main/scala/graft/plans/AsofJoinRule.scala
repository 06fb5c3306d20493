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
  * a plain join — wrong rows are worse than a loud error.
  *
  * `probeTag` records the PROBE side: [[AsofProbeTagRule]] stamps it
  * at analysis time with the exprIds of the join's left child's
  * output, and [[AsofJoinRewriteRule]] refuses to rewrite if any
  * tagged id has migrated to the right side — an optimizer rule that
  * swaps or re-associates the marked join's children (e.g. CBO join
  * reorder, off by default) would otherwise silently invert the
  * as-of direction through the mirrored-comparison branch. A plain
  * Seq[Long] rather than ExprId so the tag is inert data: not a
  * child, no references, invisible to every transform. */
case class GraftAsofCond(child: Expression, probeTag: Seq[Long] = Nil)
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

/** Placeholder condition of `ASOF JOIN … USING (c1…, t)` between
  * parse and analysis. The parser cannot lower USING to an ON text
  * directly — the bare column names would be ambiguous there (both
  * sides expose them) — so it parks the names as data and
  * [[AsofProbeTagRule]] builds the real condition at analysis time,
  * where per-side resolution exists: equality on every column but the
  * last, `left.t >= right.t` on the last (the DuckDB ASOF USING
  * default), and USING's output dedup (left columns + right columns
  * minus the USING set — the left side supplies the key and ordering
  * values, as USING semantics require).
  *
  * DELIBERATELY never `resolved`: the enclosing Join stays unresolved
  * until the rule replaces this, so a `SELECT *` above expands against
  * the DEDUPED projection, never the raw two-sided join — the same
  * device Spark's own UsingJoin type uses. A session that parses it
  * without the rule (impossible via GraftExtensions, which registers
  * both) fails analysis loudly rather than running anything. */
case class GraftAsofUsing(cols: Seq[String])
    extends LeafExpression with Predicate {
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override lazy val resolved: Boolean = false
  private def notLowered = new UnsupportedOperationException(
    "ASOF JOIN … USING was parsed but not lowered: register " +
      "graft.plans.AsofProbeTagRule (spark.sql.extensions=" +
      "graft.functions.GraftExtensions)")
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any =
    throw notLowered
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    throw notLowered
}

/** Analysis-time half of the ASOF door, two jobs in one resolution
  * rule (registered alongside the parser in `GraftExtensions` — the
  * expressions it handles can only be born from that parser, so a
  * session that can produce them always has this rule):
  *
  *  1. USING lowering: replace a [[GraftAsofUsing]] condition with
  *     the per-side-resolved equality + `>=` conjunction (wrapped in
  *     the marker, probe side pre-stamped) and project the join's
  *     output down to USING's deduped column set.
  *  2. Probe-side stamp (see [[GraftAsofCond.probeTag]]): the FIRST
  *     resolved sighting of a marked join records its left child's
  *     output exprIds into the marker, before any optimizer batch
  *     could reorder the join's children.
  *
  * Both are idempotent (a lowered USING leaves no GraftAsofUsing; only
  * empty tags are stamped), so the analyzer's fixed-point batches
  * converge. */
object AsofProbeTagRule extends Rule[LogicalPlan] {
  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case j @ Join(left, right, _, Some(u: GraftAsofUsing), _)
        if left.resolved && right.resolved =>
      def pick(side: LogicalPlan, label: String, c: String): Attribute =
        side.output.filter(a => conf.resolver(a.name, c)) match {
          case Seq(one) => one
          case Seq() => throw new IllegalArgumentException(
            s"ASOF JOIN USING column `$c` is missing on the $label side")
          case _ => throw new IllegalArgumentException(
            s"ASOF JOIN USING column `$c` is ambiguous on the $label side")
        }
      val pairs = u.cols.map(c => (pick(left, "left", c), pick(right, "right", c)))
      val conds: Seq[Expression] =
        pairs.init.map { case (l, r) => EqualTo(l, r): Expression } :+
          GreaterThanOrEqual(pairs.last._1, pairs.last._2)
      val marked = GraftAsofCond(conds.reduce(And),
        left.output.map(_.exprId.id))
      val dropped = pairs.map(_._2.exprId).toSet
      Project(left.output ++ right.output.filterNot(a => dropped(a.exprId)),
        j.copy(condition = Some(marked)))
    case j @ Join(left, _, _, Some(cond), _) if j.resolved && cond.exists {
          case m: GraftAsofCond => m.probeTag.isEmpty
          case _ => false
        } =>
      val ids = left.output.map(_.exprId.id)
      j.copy(condition = Some(cond.transform {
        case m: GraftAsofCond if m.probeTag.isEmpty => m.copy(probeTag = ids)
      }))
  }
}

/** Optimizer rule: lower an `ASOF JOIN` (marked by [[GraftAsofCond]],
  * see [[GraftSqlParser]]) into an equivalent Spark plan.
  *
  * Semantics implemented (DuckDB `ASOF JOIN`, reference e3's shape):
  * for each left row, the single right row sharing the equality keys
  * whose ordering column is the LATEST satisfying `l.t >= r.t` (or
  * `>`; the EARLIEST for `<=`/`<`) — `LEFT` keeps unmatched left rows
  * with nulls. Two lowerings, both producing the identical rows
  * (spec-pinned against each other and against first-principles
  * fixtures, ties included):
  *
  *  - WINDOW (default): the union-tag-window one-pass shape — the
  *    very plan the engine's hand-written as-of uses
  *    (EventQueries.e3AsofJoinOf). ONE shuffle of |L|+|R| rows on the
  *    key, linear at any skew. See [[rewriteToWindow]].
  *  - JOIN (`spark.graft.asof.lowering=join`, and the automatic
  *    fallback for shapes the window form cannot express):
  *
  * {{{
  *   l ASOF LEFT JOIN r ON l.k = r.k AND l.t >= r.t
  *   ⇒ l LEFT JOIN (r + next = lead(t) OVER (PARTITION BY k
  *                                           ORDER BY t, tiebreaks))
  *       ON l.k = r.k AND l.t >= r.t
  *          AND (next IS NULL OR NOT l.t >= next)
  * }}}
  *
  * In the join form exactly one right row survives per (left row,
  * key): the matching rows form a prefix of the window order (nulls
  * sort FIRST in both directions so a null ordering value can never
  * be the `next` of a real one), and only the prefix's last element
  * has a `next` that fails the predicate. Ties on the ordering column
  * break to the remaining right columns (ascending for backward
  * as-of, descending for forward), picking the max/min tuple — the
  * same row the engine's one-pass form keeps. Its cost term is the
  * equi join's range residual: O(|L_k|·|R_k|) inside a hot key —
  * which is why the linear window form is the default.
  *
  * Registered via `GraftExtensions` (`spark.sql.extensions`) or at
  * runtime with [[AsofJoinRewriteRule.ensureInjected]]. */
object AsofJoinRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Lowering strategy: "window" (default — the linear union-tag-
    * window one-pass shape, see [[rewriteToWindow]]) or "join" (the
    * window-bounded equi join, see [[rewriteToJoin]]). The window
    * form automatically falls back to the join form on shapes it
    * cannot express. */
  val LoweringConfKey = "spark.graft.asof.lowering"

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
    val marker = markers.head.asInstanceOf[GraftAsofCond]
    val inner = splitConjunctivePredicates(marker.child)

    val (lset, rset) = (j.left.outputSet, j.right.outputSet)
    // the probe side was stamped at analysis time (AsofProbeTagRule);
    // if any stamped column now sits under the RIGHT child, an
    // optimizer rule reordered the marked join's children, and the
    // mirrored-comparison branch below would silently invert the
    // as-of direction — fail loudly instead. Column pruning may DROP
    // stamped ids from the left side (legal), so only right-side
    // presence is the swap signal.
    if (marker.probeTag.nonEmpty &&
        rset.exists(a => marker.probeTag.contains(a.exprId.id)))
      fail("the marked join's children were reordered between analysis " +
        "and this rewrite (the parsed probe/left relation's columns now " +
        "sit on the right side) — as-of direction would invert; disable " +
        "the reordering rule over ASOF joins or use the DataFrame-API as-of")
    // Some(true) = left-side expression, Some(false) = right-side
    def sideOf(e: Expression): Option[Boolean] =
      if (e.references.isEmpty || !e.deterministic) None
      else if (e.references.subsetOf(lset)) Some(true)
      else if (e.references.subsetOf(rset)) Some(false)
      else None

    var eqs = Seq.empty[(Expression, Expression)] // (left expr, right expr)
    // (left expr, right expr, predicate builder, backward?, inclusive?)
    var ineq: Option[(Expression, Expression,
      (Expression, Expression) => Expression, Boolean, Boolean)] = None
    def setIneq(l: Expression, r: Expression,
        mk: (Expression, Expression) => Expression,
        back: Boolean, incl: Boolean): Unit = {
      if (ineq.isDefined) fail("more than one ordering inequality in the condition")
      ineq = Some((l, r, mk, back, incl))
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
            case _: GreaterThanOrEqual => setIneq(c.left, c.right, GreaterThanOrEqual, true, true)
            case _: GreaterThan => setIneq(c.left, c.right, GreaterThan, true, false)
            case _: LessThanOrEqual => setIneq(c.left, c.right, LessThanOrEqual, false, true)
            case _: LessThan => setIneq(c.left, c.right, LessThan, false, false)
            case other => fail(s"unsupported comparison: ${other.sql}")
          }
          case (Some(false), Some(true)) => c match {
            // mirrored spelling: r.t <= l.t ≡ l.t >= r.t
            case _: LessThanOrEqual => setIneq(c.right, c.left, GreaterThanOrEqual, true, true)
            case _: LessThan => setIneq(c.right, c.left, GreaterThan, true, false)
            case _: GreaterThanOrEqual => setIneq(c.right, c.left, LessThanOrEqual, false, true)
            case _: GreaterThan => setIneq(c.right, c.left, LessThan, false, false)
            case other => fail(s"unsupported comparison: ${other.sql}")
          }
          case _ => fail(s"comparison does not span the two sides: ${c.sql}")
        }
      case other => fail(s"unsupported conjunct in the ASOF condition: ${other.sql}")
    }
    val (lexpr, rexpr, mk, backward, inclusive) = ineq.getOrElse(
      fail("no ordering inequality (</<=/>/>=) in the condition"))
    if (!RowOrdering.isOrderable(rexpr.dataType))
      fail(s"ordering column type is not orderable: ${rexpr.dataType}")

    val strategy = conf.getConfString(LoweringConfKey, "window")
    // null-safe equalities MATCH null keys; the window lowering's
    // null-right filter would drop those rows, so they take the join
    // form, which keeps the original conjuncts verbatim
    val hasNullSafeEq = inner.exists(_.isInstanceOf[EqualNullSafe])
    val viaWindow =
      if (strategy == "join" || hasNullSafeEq) None
      else rewriteToWindow(j, outer, eqs, lexpr, rexpr, backward, inclusive)
    viaWindow.getOrElse(
      rewriteToJoin(j, inner, outer, eqs, lexpr, rexpr, mk, backward))
  }

  /** The LINEAR lowering (default): the union-tag-window one-pass
    * shape the engine's own as-of uses (EventQueries.e3AsofJoinOf) —
    * no join at all, so no per-hot-key pair residual:
    *
    * {{{
    *   Union(left rows tagged side=L with a NULL right-struct,
    *         right rows tagged side=R carrying struct(right cols))
    *   → last(struct, ignoreNulls) OVER (PARTITION BY key
    *       ORDER BY t [asc|desc], side, struct  ROWS UNBOUNDED
    *       PRECEDING)
    *   → keep side=L rows; unpack the struct back to the right cols
    * }}}
    *
    * Side ordering encodes strictness: for an INCLUSIVE bound a right
    * row at the left row's own t must be visible (right sorts first
    * at equal t); STRICT flips it. NullsFirst everywhere + right rows
    * with null key/t filtered out (they can never match) means a left
    * row with null key or t reads a null struct — the unmatched-left
    * semantics — with no special casing. Ties on t break to the same
    * struct tuple [[rewriteToJoin]]'s tiebreaks pick (struct field
    * order is the right output order; the constant-in-group t field
    * cannot reorder anything). Cost: ONE shuffle of |L|+|R| rows on
    * the key — linear at any skew, the same plan a hand-written
    * one-pass as-of produces.
    *
    * Falls back to the join lowering (None) when: the right struct is
    * not orderable (tie discipline would be lost), an eq conjunct's
    * two sides have different types (positional Union needs exact
    * types; analysis normally coerces, so this is belt-and-braces),
    * or a LEFT OUTER marked join carries extra non-ASOF conjuncts
    * (outer-join condition semantics differ from a post-filter). */
  private def rewriteToWindow(j: Join, outer: Seq[Expression],
      eqs: Seq[(Expression, Expression)], lexpr: Expression,
      rexpr: Expression, backward: Boolean,
      inclusive: Boolean): Option[LogicalPlan] = {
    import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Complete, Last}
    import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
    if (j.joinType == LeftOuter && outer.nonEmpty) return None
    if (eqs.exists { case (l, r) => l.dataType != r.dataType }) return None
    if (lexpr.dataType != rexpr.dataType) return None
    val rcols = j.right.output
    val rstructType = StructType(
      rcols.map(a => StructField(a.name, a.dataType, nullable = true)))
    if (!RowOrdering.isOrderable(rstructType)) return None

    val sideL = if (inclusive) 1 else 0
    val sideR = 1 - sideL
    // L branch: original left attrs ride through un-aliased, so their
    // exprIds survive the Union (output adopts the FIRST child's ids)
    val lProj = Project(
      Seq(Alias(Literal(sideL, IntegerType), "__graft_side")()) ++
        eqs.map(_._1).zipWithIndex.map { case (e, i) => Alias(e, s"__graft_k$i")() } ++
        Seq(Alias(lexpr, "__graft_t")()) ++
        j.left.output ++
        Seq(Alias(Literal(null, rstructType), "__graft_r")()),
      j.left)
    // R branch: rows whose key or t is null can never match a left
    // row — dropping them here is what makes the null handling above
    // fall out of NullsFirst ordering alone
    val rKeep = (rexpr +: eqs.map(_._2))
      .map(IsNotNull(_): Expression).reduce(And)
    val rProj = Project(
      Seq(Alias(Literal(sideR, IntegerType), "__graft_side")()) ++
        eqs.map(_._2).zipWithIndex.map { case (e, i) => Alias(e, s"__graft_k$i")() } ++
        Seq(Alias(rexpr, "__graft_t")()) ++
        j.left.output.map(a => Alias(Literal(null, a.dataType), a.name)()) ++
        Seq(Alias(CreateStruct(rcols), "__graft_r")()),
      Filter(rKeep, j.right))
    val union = Union(Seq(lProj, rProj), byName = false, allowMissingCol = false)
    val uOut = union.output
    val (sideA, tA, rA) = (uOut.head, uOut(1 + eqs.size), uOut.last)
    val keyA = uOut.slice(1, 1 + eqs.size)

    val dir = if (backward) Ascending else Descending
    val sorts = Seq(
      SortOrder(tA, dir, NullsFirst, Seq.empty),
      SortOrder(sideA, Ascending, NullsFirst, Seq.empty),
      SortOrder(rA, dir, NullsFirst, Seq.empty))
    val frame = SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow)
    val lastAgg = AggregateExpression(
      Last(rA, ignoreNulls = true), Complete, isDistinct = false)
    val matched = Alias(WindowExpression(lastAgg,
      WindowSpecDefinition(keyA, sorts, frame)), "__graft_asof_match")()
    val win = Window(Seq(matched), keyA, sorts, union, None)
    val mRef = matched.toAttribute

    val keepLeft = EqualTo(sideA, Literal(sideL, IntegerType))
    val filt = Filter(
      if (j.joinType == Inner) And(keepLeft, IsNotNull(mRef)) else keepLeft,
      win)
    // restore the right columns under their ORIGINAL exprIds so the
    // already-planned consumers above the join resolve unchanged
    val restored = rcols.zipWithIndex.map { case (a, i) =>
      Alias(GetStructField(mRef, i, Some(a.name)), a.name)(exprId = a.exprId)
    }
    val leftRestored = j.left.output.map(a => uOut.find(_.exprId == a.exprId).get)
    val proj = Project(leftRestored ++ restored, filt)
    Some(if (outer.isEmpty) proj else Filter(outer.reduce(And), proj))
  }

  /** The JOIN lowering (fallback, and `spark.graft.asof.lowering=join`):
    * window-bounded equi join — general (any orderable ordering
    * column, extra pushed-in conjuncts), but the range residual costs
    * O(|L_k|·|R_k|) inside a hot key. */
  private def rewriteToJoin(j: Join, inner: Seq[Expression],
      outer: Seq[Expression], eqs: Seq[(Expression, Expression)],
      lexpr: Expression, rexpr: Expression,
      mk: (Expression, Expression) => Expression,
      backward: Boolean): LogicalPlan = {
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
