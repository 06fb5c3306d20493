package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, Percentile}
import org.apache.spark.sql.types.{DoubleType, LongType}
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** DuckDB-dialect aliases for the SQL door.
  *
  * `SparkEntry.oracleSql` is written in DuckDB's dialect (the
  * driver's oracle engine). Registering EXACT-semantics Spark
  * equivalents under the DuckDB names lets the same text drive both
  * engines — every alias here is either a pure rename of a builtin
  * Catalyst expression or a composition with provably identical
  * semantics, and `SqlGatewaySpec`'s inventory test enforces
  * row-identity per query against the DataFrame result, so a
  * subtly-divergent alias can never silently count as portable
  * (that guard is what keeps this shim honest — see KnownDivergent
  * there for the regexp_replace counter-example this layer
  * deliberately does NOT alias, since the name already exists in
  * Spark with different 4-arg semantics).
  *
  * Scoped to [[graft.SqlGateway.open]] rather than GraftExtensions:
  * these names exist for oracle-text symmetry at the SQL door, not
  * as engine API.
  */
object DuckDbCompat {

  /** DuckDB strftime %-codes → Java DateTimeFormatter patterns for
    * the subset the oracle texts use; unknown codes throw at
    * registration-resolution time rather than silently mis-format. */
  private[graft] def javaFormat(fmt: String): String = {
    val out = new StringBuilder
    var i = 0
    while (i < fmt.length) {
      val c = fmt.charAt(i)
      if (c == '%') {
        require(i + 1 < fmt.length, s"dangling % in strftime format '$fmt'")
        fmt.charAt(i + 1) match {
          case 'Y' => out.append("yyyy")
          case 'm' => out.append("MM")
          case 'd' => out.append("dd")
          case 'H' => out.append("HH")
          case 'M' => out.append("mm")
          case 'S' => out.append("ss")
          case 'f' => out.append("SSSSSS")
          case '%' => out.append('%')
          case other => throw new IllegalArgumentException(
            s"unsupported strftime code %$other in '$fmt'")
        }
        i += 2
      } else {
        // literal chars that are letters must be quoted for Java
        if (c.isLetter) out.append('\'').append(c).append('\'')
        else out.append(c)
        i += 1
      }
    }
    out.toString
  }

  private def strLit(e: Expression): String = e match {
    case Literal(s: UTF8String, _) => s.toString
    case _ => throw new IllegalArgumentException(
      s"compat alias requires a string literal, got $e")
  }

  /** DuckDB time_bucket origin for interval buckets: 2000-01-03
    * 00:00:00 (Monday — aligns week buckets on Mondays, the
    * TimescaleDB convention DuckDB follows). */
  private val BucketOriginMicros = 946857600000000L

  private def intervalMicros(e: Expression): Long = e match {
    // Spark 4 parses INTERVAL '1 hour' as an ANSI day-time interval
    // (a micros long); the legacy CalendarInterval form is kept for
    // programmatic literals
    case Literal(us: Long, _: org.apache.spark.sql.types.DayTimeIntervalType) => us
    case Literal(iv: CalendarInterval, _) =>
      require(iv.months == 0, s"time_bucket alias: month intervals unsupported ($iv)")
      iv.days * 86400000000L + iv.microseconds
    case _ => throw new IllegalArgumentException(
      s"time_bucket alias requires an interval literal, got $e")
  }

  /** epoch(ts): double seconds INCLUDING the fractional part —
    * DuckDB's epoch() semantics (unix_timestamp would truncate). */
  private def epochSeconds(ts: Expression): Expression =
    Divide(Cast(UnixMicros(ts), DoubleType), Literal(1e6, DoubleType))

  /** time_bucket(iv, ts) = ts - pmod(ts - origin, iv), in micros —
    * Pmod's [0, iv) range gives exact FLOOR alignment on both sides
    * of the origin (timestamps here predate 2000, so truncating
    * division would round the wrong way). */
  private def timeBucket(iv: Expression, ts: Expression): Expression = {
    val us = UnixMicros(ts)
    val w = Literal(intervalMicros(iv), LongType)
    MicrosToTimestamp(Subtract(us,
      Pmod(Subtract(us, Literal(BucketOriginMicros, LongType)), w)))
  }

  private def f(name: String, arities: Set[Int])(
      build: Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(DuckDbCompat.getClass.getName, name),
      (children: Seq[Expression]) => {
        require(arities.contains(children.size),
          s"$name takes ${arities.toSeq.sorted.mkString("/")} arguments, " +
            s"got ${children.size}")
        build(children)
      })

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(
      f("string_split_regex", Set(2))(c => StringSplit(c(0), c(1), Literal(-1))),
      f("list_filter", Set(2))(c => ArrayFilter(c(0), c(1))),
      f("list_transform", Set(2))(c => ArrayTransform(c(0), c(1))),
      f("list_distinct", Set(1))(c => ArrayDistinct(c(0))),
      f("list_intersect", Set(2))(c => ArrayIntersect(c(0), c(1))),
      f("list_concat", Set(2))(c => Concat(c)),
      f("list_sort", Set(1))(c => SortArray(c(0), Literal(true))),
      // DuckDB list_extract: 1-based, NULL out of range — exactly
      // Spark's element_at under non-ANSI (the `arr[i]` bracket
      // syntax itself is unbridgeable: 0-based in Spark, 1-based in
      // DuckDB, so portable texts must spell the function name). The
      // ordinal casts to INT: DuckDB indexes with BIGINT (its
      // generate_series element type) while Spark's ElementAt
      // requires IntegerType — same value domain at any real arity.
      f("list_extract", Set(2))(c =>
        ElementAt(c(0), Cast(c(1), org.apache.spark.sql.types.IntegerType))),
      // DuckDB list_value(x, ...) = Spark array(x, ...) — the bracket
      // list literal `[x]` is DuckDB-only syntax (and DuckDB's
      // array_value makes a fixed-size ARRAY, which its own UNNEST
      // then refuses — LIST is the interoperable shape). Any arity:
      // the rendered-model texts spell whole embedding-dimension
      // centroids through it.
      f("list_value", (1 to 4096).toSet)(c => CreateArray(c)),
      // list_dot_product ≡ the native graft_dot expression — the
      // forward-accumulation parity every vector oracle already
      // rests on (the other direction: DuckDB runs graft_dot's
      // semantics under ITS name)
      f("list_dot_product", Set(2))(c => graft.functions.DotProduct(c(0), c(1))),
      // DuckDB list_reverse = Spark reverse on arrays (same name
      // exists in Spark only for strings+arrays via reverse();
      // list_reverse itself is unclaimed)
      f("list_reverse", Set(1))(c => Reverse(c(0))),
      // DuckDB array_slice(list, begin, end): 1-based INCLUSIVE end.
      // Spark Slice takes (start, length) — length = end − begin + 1.
      // Exact on the domain the oracle texts use (positive in-bounds
      // begin ≤ end — the slice windows are generated to fit);
      // negative/overflow edge semantics differ and are out of scope,
      // enforced as ever by the row-identity inventory test.
      f("array_slice", Set(3))(c =>
        Slice(c(0), c(1), Add(Subtract(c(2), c(1)), Literal(1)))),
      f("list", Set(1))(c => CollectList(c(0))),
      f("list_min", Set(1))(c => ArrayMin(c(0))),
      f("array_to_string", Set(2))(c => ArrayJoin(c(0), c(1), None)),
      f("regexp_matches", Set(2))(c => RLike(c(0), c(1))),
      f("unnest", Set(1))(c => Explode(c(0))),
      f("epoch", Set(1))(c => epochSeconds(c(0))),
      f("epoch_us", Set(1))(c => UnixMicros(c(0))),
      f("generate_series", Set(2, 3))(c =>
        if (c.size == 2) new Sequence(c(0), c(1)) else new Sequence(c(0), c(1), c(2))),
      f("strftime", Set(2))(c =>
        DateFormatClass(c(0), Literal(javaFormat(strLit(c(1)))))),
      f("time_bucket", Set(2))(c => timeBucket(c(0), c(1))),
      f("quantile_cont", Set(2))(c => new Percentile(c(0), c(1))),
      f("xor", Set(2))(c => BitwiseXor(c(0), c(1))),
      f("str_split", Set(2))(c =>
        // DuckDB str_split is a PLAIN split; Spark StringSplit is
        // regex-based, so the literal separator must be quoted
        StringSplit(c(0), Literal(java.util.regex.Pattern.quote(strLit(c(1)))),
          Literal(-1))),
      f("range", Set(2))(c => rangeExclusive(c(0), c(1))),
      f("list_zip", Set(2))(c =>
        // DuckDB names zip-struct fields list_1, list_2, ...
        new ArraysZip(c, Seq(Literal("list_1"), Literal("list_2")))))

  /** DuckDB range(a, b): end-EXCLUSIVE, EMPTY when a >= b. Spark's
    * Sequence is end-inclusive and DESCENDS when start > stop, so the
    * band filter (a <= x < b) is what restores both edge semantics —
    * for a >= b every generated element fails it. */
  private def rangeExclusive(a: Expression, b: Expression): Expression = {
    val x = UnresolvedNamedLambdaVariable(Seq("graft_range_x"))
    ArrayFilter(new Sequence(a, Subtract(b, Literal(1))),
      LambdaFunction(And(GreaterThanOrEqual(x, a), LessThan(x, b)), Seq(x)))
  }

  /** Names where a Spark builtin EXISTS but DuckDB's semantics are a
    * strict superset and our alias reproduces the builtin's behavior
    * on the builtin's domain: `len` (Spark: strings only, INT out;
    * DuckDB: strings AND lists, BIGINT out — LenOf dispatches and
    * matches DuckDB's type). Session-scoped shadowing, SQL door only. */
  val overrides: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] =
    Seq(f("len", Set(1))(c => LenOf(c(0))),
      // DuckDB make_timestamp(micros): a 1-arg form Spark's builtin
      // (6/7-arg calendar fields) never claims — different-arity
      // superset, like `len`. Non-1-arg calls delegate verbatim to
      // the builtin builder so the calendar form keeps Spark
      // semantics through the SQL door.
      f("make_timestamp", (1 to 8).toSet)(c =>
        if (c.size == 1) MicrosToTimestamp(c(0))
        else org.apache.spark.sql.catalyst.analysis.FunctionRegistry.builtin
          .lookupFunctionBuilder(FunctionIdentifier("make_timestamp"))
          .map(_(c)).getOrElse(throw new IllegalStateException(
            "builtin make_timestamp missing"))))

  /** Idempotent runtime registration (the GraftFunctions contract).
    * Except for the documented [[overrides]], never shadows an
    * existing name: a DuckDB name that collides with a Spark builtin
    * of DIFFERENT semantics (regexp_replace) must stay the builtin,
    * and the text stays dialect-divergent. */
  def ensureRegistered(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    functions.foreach { case (ident, info, builder) =>
      if (!registry.functionExists(ident))
        registry.registerFunction(ident, info, builder)
    }
    overrides.foreach { case (ident, info, builder) =>
      registry.registerFunction(ident, info, builder)
    }
  }
}

/** DuckDB `len`: length of a string OR element count of a list —
  * one name, type-dispatched. Dispatch needs the child's resolved
  * type, hence a RuntimeReplaceable rather than a builder-time
  * choice. Returns BIGINT like DuckDB (Spark's size() is INT). */
case class LenOf(child: Expression) extends UnaryExpression
    with RuntimeReplaceable {
  override lazy val replacement: Expression = child.dataType match {
    case _: org.apache.spark.sql.types.ArrayType =>
      Cast(Size(child, legacySizeOfNull = false), LongType)
    case _ => Cast(Length(child), LongType)
  }
  override protected def withNewChildInternal(newChild: Expression): LenOf =
    copy(child = newChild)
}
