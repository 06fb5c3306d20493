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
  * Registered via `GraftExtensions` (`spark.sql.extensions=`
  * `graft.functions.GraftExtensions`); there is no runtime injection
  * route for parsers, so sessions built without the config reject
  * ASOF SQL exactly as stock Spark does. */
class GraftSqlParser(delegate: ParserInterface) extends ParserInterface {
  override def parsePlan(sqlText: String): LogicalPlan =
    delegate.parsePlan(AsofSqlRewrite(sqlText))
  // the interface DEFAULT routes through parsePlan and DROPS the
  // parameter context — forward it to the delegate explicitly so
  // parameterized spark.sql(text, args) keeps its binding
  override def parsePlanWithParameters(sqlText: String,
      ctx: org.apache.spark.sql.catalyst.parser.ParameterContext): LogicalPlan =
    delegate.parsePlanWithParameters(AsofSqlRewrite(sqlText), ctx)
  override def parseQuery(sqlText: String): LogicalPlan =
    delegate.parseQuery(AsofSqlRewrite(sqlText))
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

  private case class Tok(s: String, start: Int, end: Int, word: Boolean)

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
          val on = findOn(toks, k + 1)
          val condEnd = findCondEnd(sql, toks, on + 1)
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
          sb.append(sql, 0, toks(i).start)            // up to ASOF
          sb.append(sql, toks(i).end, toks(on).end)   // JOIN … ON, ASOF dropped
          sb.append(" graft_asof_marker(")
          sb.append(sql, toks(on).end, condEnd)       // the condition
          sb.append(") ")
          sb.append(sql, condEnd, sql.length)
          return Some(sb.toString)
        }
      }
      i += 1
    }
    None
  }

  /** Index of the ASOF join's own ON keyword: first depth-0 ON after
    * the JOIN token (the right relation's parens are skipped whole). */
  private def findOn(toks: Vector[Tok], from: Int): Int = {
    var d = 0
    var m = from
    while (m < toks.length) {
      val t = toks(m)
      if (t.s == "(") d += 1
      else if (t.s == ")") {
        d -= 1
        if (d < 0) throw new IllegalArgumentException(
          "ASOF JOIN: no ON clause before the enclosing subquery closes")
      } else if (d == 0 && t.word) {
        val u = t.s.toUpperCase(java.util.Locale.ROOT)
        if (u == "ON") return m
        if (u == "JOIN") throw new IllegalArgumentException(
          "ASOF JOIN: unparenthesized join chain between ASOF JOIN and its " +
            "ON is unsupported — parenthesize the right side")
        if (u == "USING") throw new IllegalArgumentException(
          "ASOF JOIN … USING is unsupported — spell the condition with ON")
      }
      m += 1
    }
    throw new IllegalArgumentException("ASOF JOIN: no ON clause found")
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
  private def tokenize(sql: String): Vector[Tok] = {
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
