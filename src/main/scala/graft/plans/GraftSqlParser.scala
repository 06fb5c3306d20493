package graft.plans

import org.apache.spark.sql.catalyst.{FunctionIdentifier, TableIdentifier}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.types.{DataType, StructType}

/** Delegating parser that accepts `ASOF [LEFT] JOIN` — the one
  * construct of the reference workload's SQL dialect Spark's grammar
  * lacks (SURVEY §2: e3's as-of lookup; the round-13 verdict's
  * remaining SQL-door gap).
  *
  * Spark's ANTLR grammar is not extensible in place, so the bridge is
  * a bounded TEXT lowering ahead of the real parser: the `ASOF` token
  * is dropped and the join's ON condition is wrapped in the
  * `graft_asof_marker(…)` function (see [[GraftAsofCond]]), which
  * [[AsofJoinRewriteRule]] later replaces with the window-bounded
  * equi join. The lowering tokenizes honestly (string literals,
  * quoted identifiers, comments, nesting) rather than regexing, and
  * only ever fires on the exact token sequence `ASOF [LEFT|INNER]
  * JOIN` in join position — everything else passes through verbatim,
  * and SQL without the substring `asof` skips the scan entirely.
  *
  * The session-aware constructor also routes top-level
  * `WITH RECURSIVE … UNION` (distinct) statements through
  * [[RecursiveSqlBridge]] — the driver-paced fixpoint evaluation of
  * the one other DuckDB construct Spark cannot run (its native
  * recursion is UNION ALL-only, and these texts' cyclic walks REQUIRE
  * distinct-step termination). The bridge fires only on that exact
  * shape; everything else, including UNION ALL recursion, reaches the
  * delegate verbatim.
  *
  * Registered via `GraftExtensions` (`spark.sql.extensions=`
  * `graft.functions.GraftExtensions`); there is no runtime injection
  * route for parsers, so sessions built without the config reject
  * ASOF SQL exactly as stock Spark does. */
class GraftSqlParser(delegate: ParserInterface,
    session: Option[org.apache.spark.sql.SparkSession] = None)
    extends ParserInterface {
  private def lower(sqlText: String): String = {
    val t = AsofSqlRewrite(sqlText)
    session.flatMap(s => RecursiveSqlBridge.maybeBridge(s, t)).getOrElse(t)
  }
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(lower(sqlText))
  // the interface DEFAULT routes through parsePlan and DROPS the
  // parameter context — forward it to the delegate explicitly so
  // parameterized spark.sql(text, args) keeps its binding. The
  // recursion bridge only fires when NO bindings ride along: its
  // internal spark.sql calls are parameterless, so a bound :param in
  // the base/step would read as unbound mid-evaluation — a
  // parameterized recursive text instead reaches Spark's native path
  // and fails loudly there (UNION ALL recursion still runs).
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan = {
    import org.apache.spark.sql.catalyst.parser.{NamedParameterContext, PositionalParameterContext}
    val hasArgs = ctx match {
      case NamedParameterContext(m) => m.nonEmpty
      case PositionalParameterContext(s) => s.nonEmpty
      case _ => true // unknown context shape: be conservative, no bridge
    }
    val t = if (hasArgs) AsofSqlRewrite(sqlText) else lower(sqlText)
    delegate.parsePlanWithParameters(t, ctx)
  }
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(lower(sqlText))
  override def parseExpression(sqlText: String): Expression =
    delegate.parseExpression(sqlText)
  override def parseTableIdentifier(sqlText: String): TableIdentifier =
    delegate.parseTableIdentifier(sqlText)
  override def parseFunctionIdentifier(sqlText: String): FunctionIdentifier =
    delegate.parseFunctionIdentifier(sqlText)
  override def parseMultipartIdentifier(sqlText: String): Seq[String] =
    delegate.parseMultipartIdentifier(sqlText)
  override def parseTableSchema(sqlText: String): StructType =
    delegate.parseTableSchema(sqlText)
  override def parseDataType(sqlText: String): DataType =
    delegate.parseDataType(sqlText)
  override def parseRoutineParam(sqlText: String): StructType =
    delegate.parseRoutineParam(sqlText)
}

/** The text lowering behind [[GraftSqlParser]]: rewrite every
  * `… ASOF [LEFT|INNER] JOIN rel ON cond …` into
  * `… [LEFT|INNER] JOIN rel ON graft_asof_marker(cond) …`.
  *
  * One occurrence per pass, outermost first (an ASOF inside the right
  * side's parenthesized subquery sits at depth > 0 during the outer
  * scan and is picked up by the next pass), iterated to fixpoint.
  * Guards that keep the lowering honest instead of clever:
  *  - `ASOF` directly after `FROM`/`JOIN`/`,` is a RELATION named
  *    asof, not the join keyword — skipped;
  *  - a second depth-0 `JOIN`/`USING` before the `ON` (an
  *    unparenthesized right-deep join chain) is rejected loudly
  *    rather than mis-wrapped;
  *  - the condition ends at the first depth-0 clause keyword, comma,
  *    semicolon, or unbalanced `)`; `LEFT`/`RIGHT` followed by `(`
  *    are the string functions, not join keywords, and do not end it.
  */
object AsofSqlRewrite {

  def apply(sql: String): String = {
    if (!sql.toLowerCase(java.util.Locale.ROOT).contains("asof")) return sql
    var cur = sql
    var guard = 0
    while (true) {
      rewriteOne(cur) match {
        case Some(next) =>
          guard += 1
          if (guard > 64) throw new IllegalArgumentException(
            "ASOF JOIN: more than 64 ASOF joins in one statement")
          cur = next
        case None => return cur
      }
    }
    cur // unreachable
  }

  private[plans] case class Tok(s: String, start: Int, end: Int, word: Boolean)

  private def eqi(a: String, b: String): Boolean = a.equalsIgnoreCase(b)

  /** Clause keywords that terminate an ON condition at depth 0. */
  private val Stop = Set("WHERE", "GROUP", "HAVING", "WINDOW", "ORDER",
    "LIMIT", "UNION", "EXCEPT", "INTERSECT", "MINUS", "JOIN", "ON",
    "USING", "ASOF", "CROSS", "NATURAL", "QUALIFY", "DISTRIBUTE",
    "CLUSTER", "SORT", "FETCH", "OFFSET", "LATERAL")
  /** Also join keywords — but valid FUNCTION names when followed by
    * `(` (`left(s, 3)`), so they terminate only when not called. */
  private val StopUnlessCall = Set("LEFT", "RIGHT", "FULL", "INNER",
    "SEMI", "ANTI")
  /** A word directly after one of these (or after a comma or a dot)
    * is a relation or alias NAME, not the ASOF keyword: `FROM asof
    * JOIN b`, `events AS asof JOIN b`, `sch.asof JOIN b` all name a
    * relation `asof` — in those positions no left relation precedes,
    * so an ASOF join is not grammatical in EITHER dialect. Everywhere
    * ELSE the DuckDB reading wins, and that covers TWO implicit-alias
    * ambiguities, not one:
    *  - after a closing paren: `(subquery) ASOF JOIN b` IS an as-of
    *    join (ASOF is a contextual keyword there), though stock Spark
    *    would have read `asof` as the subquery's implicit alias;
    *  - after a bare relation identifier: `FROM events ASOF JOIN b`
    *    IS an as-of join, though stock Spark would have read `asof`
    *    as `events`' implicit alias followed by a PLAIN join — valid
    *    Spark SQL whose RESULT silently changes under the extensions
    *    parser if the text never references the `asof` alias.
    * These lowered texts are DuckDB-dialect by purpose, so the DuckDB
    * reading is the right default; every fired lowering logs a
    * warning (see [[rewriteOne]]) so an affected Spark-dialect text
    * is visible rather than silent, a text that DID reference
    * `asof.col` fails LOUDLY at analysis once the token is consumed,
    * and `AS asof` states alias intent unambiguously (the rewrite
    * never fires after `AS`). */
  private val RelationLead = Set("FROM", "JOIN", "AS")

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  private def rewriteOne(sql: String): Option[String] = {
    val toks = tokenize(sql)
    var i = 0
    while (i < toks.length) {
      val relationPos = i > 0 && {
        val p = toks(i - 1)
        p.s == "," || p.s == "." ||
          (p.word && RelationLead.contains(
            p.s.toUpperCase(java.util.Locale.ROOT)))
      }
      if (toks(i).word && eqi(toks(i).s, "ASOF") && !relationPos) {
        var k = i + 1
        if (k < toks.length && toks(k).word &&
            (eqi(toks(k).s, "LEFT") || eqi(toks(k).s, "INNER"))) k += 1
        if (k < toks.length && toks(k).word && eqi(toks(k).s, "JOIN")) {
          // visible reinterpretation notice: `rel ASOF JOIN` / `(sub)
          // ASOF JOIN` would have parsed in STOCK Spark as an implicit
          // alias named asof plus a plain join — the RelationLead doc's
          // two ambiguous positions — so every fire says which token
          // was consumed and where
          log.warn(s"graft: lowering ASOF JOIN at offset ${toks(i).start} " +
            "(token 'asof' consumed as the join keyword, DuckDB dialect; " +
            "stock Spark would have read it as an implicit relation alias " +
            "— write 'AS asof' if an alias was intended)")
          // java.lang.StringBuilder: its 3-arg append is the REAL
          // (CharSequence, from, until) slice — Scala's would
          // auto-tuple the args into append(Any)
          val sb = new java.lang.StringBuilder
          val close = findJoinClose(toks, k + 1)
          // a CHAINED right side (`… ASOF JOIN b JOIN c ON bc ON ab`,
          // ONs matching inside-out) must be parenthesized in the
          // lowered text: Spark's grammar has no deferred-ON
          // right-deep chain, and an unparenthesized CROSS JOIN
          // would steal the ON. `( rel JOIN … )` is valid Spark
          // relation syntax with inner qualifiers still visible.
          def appendRight(upTo: Int): Unit = {
            sb.append(sql, 0, toks(i).start)            // up to ASOF
            sb.append(sql, toks(i).end, toks(k).end)    // [LEFT|INNER] JOIN
            if (close.chained) sb.append(" (")
            sb.append(sql, toks(k).end, upTo)           // the right side
            if (close.chained) sb.append(" )")
          }
          close match {
            case OnAt(on, _) =>
              val condEnd = findCondEnd(sql, toks, on + 1)
              appendRight(toks(on).start)
              sb.append(" ON graft_asof_marker(")
              sb.append(sql, toks(on).end, condEnd)     // the condition
              sb.append(") ")
              sb.append(sql, condEnd, sql.length)
            case UsingAt(u, cols, closeEnd, _) =>
              // `USING (k…, t)` → `ON graft_asof_using('k'…, 't')`:
              // the column list rides as string literals because the
              // bare names would be AMBIGUOUS in ON position (both
              // sides expose them); AsofProbeTagRule lowers the
              // placeholder at analysis time, where per-side
              // resolution and USING's output dedup are expressible
              appendRight(toks(u).start)
              sb.append(" ON graft_asof_using(")
              // quote/backslash-bearing names were rejected at parse
              // time (parseUsingList), so plain quoting is exact here
              sb.append(cols.map("'" + _ + "'").mkString(", "))
              sb.append(") ")
              sb.append(sql, closeEnd, sql.length)
          }
          return Some(sb.toString)
        }
      }
      i += 1
    }
    None
  }

  private sealed trait JoinClose { def chained: Boolean }
  private case class OnAt(idx: Int, chained: Boolean) extends JoinClose
  /** USING close: keyword index, column names (unquoted), and the
    * char offset just past the list's closing paren. */
  private case class UsingAt(idx: Int, cols: Seq[String], closeEnd: Int,
    chained: Boolean) extends JoinClose

  /** The ASOF join's OWN closing clause — its ON condition or USING
    * list. An unparenthesized right-deep chain (`A ASOF JOIN B JOIN C
    * ON bc ON ab`) closes joins inside-out: each depth-0 JOIN between
    * ours and its close opens one more pending join, and each ON /
    * USING closes the most recent one — ours is the clause that
    * arrives with nothing pending. CROSS and NATURAL joins never take
    * a close, so they do not add to the pending count. The right
    * relation's parens are skipped whole. */
  private def findJoinClose(toks: Vector[Tok], from: Int): JoinClose = {
    def bareJoin(at: Int): Boolean = {
      // walk back over join modifiers (incl. OUTER, which is not in
      // StopUnlessCall because it is never an ON-condition stopper);
      // CROSS/NATURAL head = no ON
      val modifiers = StopUnlessCall + "OUTER"
      var b = at - 1
      while (b >= 0 && toks(b).word && modifiers.contains(
          toks(b).s.toUpperCase(java.util.Locale.ROOT))) b -= 1
      !(b >= 0 && toks(b).word && {
        val u = toks(b).s.toUpperCase(java.util.Locale.ROOT)
        u == "CROSS" || u == "NATURAL"
      })
    }
    var d = 0
    var pending = 0
    var sawJoin = false // ANY depth-0 join (incl. CROSS/NATURAL) →
                        // the right side must be parenthesized in the
                        // lowered text: Spark's grammar has no
                        // deferred-ON right-deep chain, and an
                        // unparenthesized CROSS would steal the ON
    var m = from
    while (m < toks.length) {
      val t = toks(m)
      if (t.s == "(") d += 1
      else if (t.s == ")") {
        d -= 1
        if (d < 0) throw new IllegalArgumentException(
          "ASOF JOIN: no ON/USING clause before the enclosing subquery closes")
      } else if (d == 0 && t.word) {
        val u = t.s.toUpperCase(java.util.Locale.ROOT)
        if (u == "ON") {
          if (pending == 0) return OnAt(m, sawJoin)
          pending -= 1
        } else if (u == "USING") {
          if (pending == 0) return parseUsingList(toks, m, sawJoin)
          pending -= 1
        } else if (u == "JOIN") {
          sawJoin = true
          if (bareJoin(m)) pending += 1
        }
      }
      m += 1
    }
    throw new IllegalArgumentException("ASOF JOIN: no ON/USING clause found")
  }

  /** Parse `USING (c1, c2, …)` starting at the USING token: bare or
    * backtick-quoted identifiers, comma-separated. */
  private def parseUsingList(toks: Vector[Tok], at: Int,
      chained: Boolean): UsingAt = {
    def bad(msg: String): Nothing =
      throw new IllegalArgumentException(s"ASOF JOIN USING: $msg")
    var m = at + 1
    if (m >= toks.length || toks(m).s != "(") bad("expected ( after USING")
    m += 1
    val cols = Seq.newBuilder[String]
    var expectIdent = true
    while (m < toks.length && toks(m).s != ")") {
      val t = toks(m)
      if (expectIdent) {
        if (t.word) cols += t.s
        else if (t.s.length >= 2 && t.s.startsWith("`") && t.s.endsWith("`")) {
          val name = t.s.substring(1, t.s.length - 1).replace("``", "`")
          // the names ride through the lowering as single-quoted
          // string literals, and Spark's lexer concatenates adjacent
          // literals ('a''b' → ab) and treats backslash as an escape
          // — a quote or backslash in the name would be silently
          // mangled into a confusing missing-column error later, so
          // refuse it HERE with the real reason (no sane schema
          // names columns this way; backticked-with-quote names can
          // still be joined via an explicit ON condition)
          if (name.contains('\'') || name.contains('\\') ||
              name.contains('"'))
            bad(s"column name ${t.s} contains a quote or backslash — " +
              "not representable in the lowered ON condition; use an " +
              "explicit ON clause for this join")
          cols += name
        } else bad(s"expected a column name, got ${t.s}")
        expectIdent = false
      } else {
        if (t.s != ",") bad(s"expected , or ), got ${t.s}")
        expectIdent = true
      }
      m += 1
    }
    if (m >= toks.length) bad("unclosed column list")
    val out = cols.result()
    if (out.isEmpty || expectIdent) bad("empty or trailing-comma column list")
    UsingAt(at, out, toks(m).end, chained)
  }

  /** Character offset just past the ON condition's last token. */
  private def findCondEnd(sql: String, toks: Vector[Tok], from: Int): Int = {
    var d = 0
    var e = from
    while (e < toks.length) {
      val t = toks(e)
      if (t.s == "(") d += 1
      else if (t.s == ")") {
        if (d == 0) return t.start
        d -= 1
      } else if (d == 0 && (t.s == "," || t.s == ";")) {
        return t.start
      } else if (d == 0 && t.word) {
        val u = t.s.toUpperCase(java.util.Locale.ROOT)
        if (Stop.contains(u)) return t.start
        if (StopUnlessCall.contains(u) &&
            !(e + 1 < toks.length && toks(e + 1).s == "(")) return t.start
      }
      e += 1
    }
    sql.length
  }

  /** Token stream with comments dropped; string literals and quoted
    * identifiers are single non-word tokens, so keywords and parens
    * inside them can never confuse the scan. */
  private[plans] def tokenize(sql: String): Vector[Tok] = {
    val out = Vector.newBuilder[Tok]
    val n = sql.length
    var i = 0
    def isWordStart(c: Char) = c.isLetter || c == '_' || c == '$'
    def isWordPart(c: Char) = c.isLetterOrDigit || c == '_' || c == '$'
    while (i < n) {
      val c = sql.charAt(i)
      if (c.isWhitespace) i += 1
      else if (c == '-' && i + 1 < n && sql.charAt(i + 1) == '-') {
        val nl = sql.indexOf('\n', i)
        i = if (nl < 0) n else nl + 1
      } else if (c == '/' && i + 1 < n && sql.charAt(i + 1) == '*') {
        val close = sql.indexOf("*/", i + 2)
        i = if (close < 0) n else close + 2
      } else if (c == '\'' || c == '"') {
        val start = i
        i += 1
        var done = false
        while (i < n && !done) {
          val ch = sql.charAt(i)
          if (ch == '\\' && i + 1 < n) i += 2
          else if (ch == c) {
            if (i + 1 < n && sql.charAt(i + 1) == c) i += 2 // '' / "" escape
            else { i += 1; done = true }
          } else i += 1
        }
        out += Tok(sql.substring(start, i), start, i, word = false)
      } else if (c == '`') {
        val start = i
        i += 1
        var done = false
        while (i < n && !done) {
          if (sql.charAt(i) == '`') {
            if (i + 1 < n && sql.charAt(i + 1) == '`') i += 2
            else { i += 1; done = true }
          } else i += 1
        }
        out += Tok(sql.substring(start, i), start, i, word = false)
      } else if (isWordStart(c) || c.isDigit) {
        val start = i
        while (i < n && isWordPart(sql.charAt(i))) i += 1
        out += Tok(sql.substring(start, i), start, i, word = isWordStart(c))
      } else {
        out += Tok(c.toString, i, i + 1, word = false)
        i += 1
      }
    }
    out.result()
  }
}
