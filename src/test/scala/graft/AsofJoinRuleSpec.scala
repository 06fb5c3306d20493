package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.plans.AsofSqlRewrite
import graft.sources.Tables

/** The ASOF JOIN SQL door: GraftSqlParser's text lowering +
  * AsofJoinRewriteRule's window-bounded equi join, pinned against the
  * engine's own one-pass as-of form and against hand-computed
  * fixtures. The shared SparkSpec session is built with
  * `spark.sql.extensions=graft.functions.GraftExtensions`, i.e. the
  * production activation route. */
class AsofJoinRuleSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  // ---------------- text lowering ----------------

  test("AsofSqlRewrite: lowers ASOF LEFT JOIN and leaves the rest verbatim") {
    val in = """SELECT a.x FROM a ASOF LEFT JOIN b ON a.k = b.k AND a.t >= b.t
               WHERE a.x > 0 ORDER BY a.x"""
    val out = AsofSqlRewrite(in)
    assert(!out.toUpperCase.contains("ASOF LEFT"))
    assert(out.replaceAll("\\s+", " ")
        .contains("LEFT JOIN b ON graft_asof_marker(") &&
      out.contains("a.k = b.k AND a.t >= b.t"))
    // the condition wrap must close BEFORE the WHERE clause
    assert(out.indexOf(") ") < out.indexOf("WHERE"),
      s"marker did not close before WHERE: $out")
    // no-ASOF text returns the same reference, untouched
    val plain = "SELECT 1 FROM t WHERE x = 'asof text'"
    assert(AsofSqlRewrite(plain) eq plain)
  }

  test("AsofSqlRewrite: a relation NAMED asof is not the keyword; " +
      "LEFT( in the condition does not end it; strings are opaque") {
    val named = "SELECT * FROM asof JOIN b ON asof.k = b.k"
    assert(AsofSqlRewrite(named) == named)
    // alias / qualified / subquery-alias positions are NAMES too
    val aliased = "SELECT * FROM events AS asof JOIN b ON asof.k = b.k"
    assert(AsofSqlRewrite(aliased) == aliased)
    val qualified = "SELECT * FROM sch.asof JOIN b ON k = j"
    assert(AsofSqlRewrite(qualified) == qualified)
    // after `)` the DuckDB reading wins: `(subquery) ASOF JOIN` is
    // the as-of keyword (an implicit alias named asof must be
    // spelled `AS asof`) — so this DOES lower
    val unaliased = "SELECT * FROM (SELECT 1 AS k, 2 AS t) ASOF JOIN b ON k = b.k AND t >= b.t"
    assert(AsofSqlRewrite(unaliased).contains("graft_asof_marker("))
    // and a previous join's parenthesized ON condition does not
    // shadow a following ASOF join
    val chained = "SELECT * FROM a JOIN b ON (a.k = b.k) ASOF JOIN c ON a.k = c.k AND a.t >= c.t"
    assert(AsofSqlRewrite(chained).contains("graft_asof_marker( a.k = c.k"))
    val fn = """SELECT * FROM a ASOF JOIN b
               ON left(a.k, 3) = left(b.k, 3) AND a.t > b.t LIMIT 5"""
    val out = AsofSqlRewrite(fn)
    assert(out.contains("graft_asof_marker(") &&
      out.contains("left(b.k, 3) AND a.t > b.t") &&
      out.trim.endsWith("LIMIT 5"), s"LEFT( mis-ended the condition: $out")
    val str = "SELECT ' ASOF JOIN ' AS s FROM t"
    assert(AsofSqlRewrite(str) == str, "string literal was rewritten")
  }

  test("AsofSqlRewrite: nested ASOF in a subquery lowers on the next pass") {
    val in = """SELECT * FROM a ASOF JOIN
               (SELECT * FROM c ASOF LEFT JOIN d ON c.k = d.k AND c.t >= d.t) b
               ON a.k = b.k AND a.t >= b.t"""
    val out = AsofSqlRewrite(in)
    assert(!out.toUpperCase.split("\\s+").contains("ASOF"))
    assert("graft_asof_marker".r.findAllIn(out).size == 2,
      s"expected both joins lowered: $out")
  }

  test("AsofSqlRewrite: unparenthesized join chains wrap the ASOF's OWN ON " +
      "(inside-out matching), and USING lowers to the placeholder") {
    // `JOIN c ON b.k = c.k` closes first; the LAST ON is the ASOF's —
    // and the chained right side gains parens (Spark's grammar has no
    // deferred-ON right-deep chain)
    val chain = "SELECT * FROM a ASOF JOIN b JOIN c ON b.k = c.k ON a.k = b.k AND a.t >= b.t"
    val outC = AsofSqlRewrite(chain).replaceAll("\\s+", " ")
    assert(outC.contains(
      "JOIN ( b JOIN c ON b.k = c.k ) ON graft_asof_marker( a.k = b.k AND a.t >= b.t)"),
      s"chain mis-wrapped: $outC")
    // CROSS / NATURAL joins take no ON and must not shift the match;
    // they too get parenthesized so the CROSS cannot steal the ON
    val cross = "SELECT * FROM a ASOF JOIN b CROSS JOIN c ON a.k = b.k AND a.t >= b.t"
    assert(AsofSqlRewrite(cross).replaceAll("\\s+", " ")
      .contains("JOIN ( b CROSS JOIN c ) ON graft_asof_marker("),
      s"CROSS JOIN shifted the ON match: ${AsofSqlRewrite(cross)}")
    // …including with the full modifier stack (OUTER must be walked
    // back over to see the NATURAL head)
    val natOuter = "SELECT * FROM a ASOF JOIN b NATURAL LEFT OUTER JOIN c ON a.k = b.k AND a.t >= b.t"
    assert(AsofSqlRewrite(natOuter).replaceAll("\\s+", " ")
      .contains("JOIN ( b NATURAL LEFT OUTER JOIN c ) ON graft_asof_marker("),
      s"NATURAL LEFT OUTER JOIN miscounted as ON-taking: ${AsofSqlRewrite(natOuter)}")
    // USING parks the column list as string literals for the
    // analysis-time lowering (bare names would be ambiguous in ON)
    val using = "SELECT * FROM a ASOF JOIN b USING (k, t) WHERE x > 0"
    val outU = AsofSqlRewrite(using)
    assert(outU.contains("ON graft_asof_using('k', 't')") &&
      !outU.toUpperCase.contains("USING (") &&
      outU.contains("WHERE x > 0"), s"USING mis-lowered: $outU")
    val quoted = "SELECT * FROM a ASOF LEFT JOIN b USING (`weird k`, ts)"
    assert(AsofSqlRewrite(quoted).replaceAll("\\s+", " ")
      .contains("LEFT JOIN b ON graft_asof_using('weird k', 'ts')"))
    // a USING that closes an INNER pending join is not the ASOF's
    val inner = "SELECT * FROM a ASOF JOIN b JOIN c USING (k) ON a.k = b.k AND a.t >= b.t"
    assert(AsofSqlRewrite(inner).replaceAll("\\s+", " ")
      .contains("JOIN ( b JOIN c USING (k) ) ON graft_asof_marker("),
      s"inner USING consumed as the ASOF close: ${AsofSqlRewrite(inner)}")
    val empty = "SELECT * FROM a ASOF JOIN b USING ()"
    assert(intercept[IllegalArgumentException](AsofSqlRewrite(empty))
      .getMessage.contains("column list"))
    // a quote/backslash in a backticked USING name would be mangled
    // by Spark's lexer once it rides as a string literal ('a''b'
    // concatenates; backslash escapes) — rejected loudly at parse
    // time instead of surfacing later as a missing-column error
    for (bad <- Seq("SELECT * FROM a ASOF JOIN b USING (`k'q`, t)",
        "SELECT * FROM a ASOF JOIN b USING (`k\\q`)")) {
      assert(intercept[IllegalArgumentException](AsofSqlRewrite(bad))
        .getMessage.contains("quote or backslash"), s"not rejected: $bad")
    }
  }

  // ---------------- end-to-end through spark.sql ----------------

  test("ASOF LEFT JOIN through the SQL door equals the engine's one-pass as-of") {
    SqlGateway.open(spark, sf)
    val viaSql = spark.sql(SparkEntry.oracleSql("e3_asof_join"))
    assert(rows(viaSql) == rows(SparkEntry.queries("e3_asof_join")(spark, sf)),
      "ASOF SQL rows diverge from EventQueries.e3AsofJoin")
    // the marker must be rewritten away and the plan must be the
    // window-bounded EQUI join — no nested-loop fallback
    val opt = viaSql.queryExecution.optimizedPlan
    assert(!opt.expressions.exists(_.exists(
        _.isInstanceOf[graft.plans.GraftAsofCond])) &&
      !opt.exists(p => p.expressions.exists(_.exists(
        _.isInstanceOf[graft.plans.GraftAsofCond]))),
      "marker survived optimization")
    assert(opt.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Window]),
      "rewrite did not insert the as-of window")
    // the DEFAULT lowering is the linear one-pass shape: a union +
    // window, NO join operator at all
    assert(opt.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Union]),
      "default lowering should be the union-tag-window form")
    assert(!opt.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Join]),
      "default lowering should not plan any join")
    val phys = viaSql.queryExecution.executedPlan.toString
    assert(!phys.contains("BroadcastNestedLoopJoin") &&
      !phys.contains("CartesianProduct"),
      s"ASOF lowering planned a pair product:\n$phys")
  }

  test("join lowering (conf) is row-identical to the window lowering") {
    SqlGateway.open(spark, sf)
    val text = SparkEntry.oracleSql("e3_asof_join")
    val viaWindow = rows(spark.sql(text))
    spark.conf.set(graft.plans.AsofJoinRewriteRule.LoweringConfKey, "join")
    try {
      val df = spark.sql(text)
      assert(df.queryExecution.optimizedPlan.exists(_.isInstanceOf[
          org.apache.spark.sql.catalyst.plans.logical.Join]),
        "conf=join should plan the window-bounded equi join")
      assert(rows(df) == viaWindow, "the two lowerings diverge")
    } finally spark.conf.unset(graft.plans.AsofJoinRewriteRule.LoweringConfKey)
  }

  test("ASOF JOIN … USING: row-identical to the spelled-out ON form, " +
      "output deduped to USING semantics, LEFT keeps unmatched") {
    import spark.implicits._
    Seq((10L, 100L, "a"), (10L, 50L, "b"), (20L, 70L, "c"), (30L, 5L, "d"))
      .toDF("k", "t", "x").createOrReplaceTempView("ul")
    Seq((10L, 90L, 1.0), (10L, 40L, 2.0), (20L, 70L, 3.0), (40L, 1L, 4.0))
      .toDF("k", "t", "y").createOrReplaceTempView("ur")
    val viaUsing = spark.sql(
      "SELECT k, t, x, y FROM ul ASOF LEFT JOIN ur USING (k, t)")
    val viaOn = spark.sql(
      """SELECT l.k, l.t, l.x, r.y FROM ul l
         ASOF LEFT JOIN ur r ON l.k = r.k AND l.t >= r.t""")
    assert(rows(viaUsing) == rows(viaOn),
      "USING diverges from the equivalent ON form")
    assert(rows(viaUsing) ==
      Set("10|100|a|1.0", "10|50|b|2.0", "20|70|c|3.0", "30|5|d|null"),
      "USING rows wrong against the hand fixture")
    // SELECT *: USING dedups — left columns + right minus the USING
    // set, one k and one t (the left's), no duplicate names
    val star = spark.sql("SELECT * FROM ul ASOF LEFT JOIN ur USING (k, t)")
    assert(star.columns.toSeq == Seq("k", "t", "x", "y"),
      s"USING output not deduped: ${star.columns.toSeq}")
    assert(rows(star) == rows(viaUsing))
    // inner form drops the unmatched left row
    assert(rows(spark.sql(
        "SELECT k, t, x, y FROM ul ASOF JOIN ur USING (k, t)")) ==
      Set("10|100|a|1.0", "10|50|b|2.0", "20|70|c|3.0"))
    // a USING column missing on one side fails loudly at analysis
    val e = intercept[Exception](spark.sql(
      "SELECT * FROM ul ASOF JOIN ur USING (k, nope)").collect())
    assert(e.getMessage.contains("nope"), s"wrong error: ${e.getMessage}")
  }

  test("unparenthesized ASOF join chain end-to-end equals the " +
      "parenthesized form") {
    import spark.implicits._
    Seq((10L, 100L, "a"), (20L, 70L, "c"), (30L, 5L, "d"))
      .toDF("k", "t", "x").createOrReplaceTempView("cl")
    Seq((10L, 90L, 7L), (20L, 60L, 8L), (20L, 75L, 9L))
      .toDF("k", "t", "rid").createOrReplaceTempView("cr")
    Seq((7L, "r7"), (8L, "r8"), (9L, "r9"))
      .toDF("rid", "nm").createOrReplaceTempView("cs")
    val chained = spark.sql(
      """SELECT cl.k, cl.t, nm FROM cl
         ASOF LEFT JOIN cr JOIN cs ON cr.rid = cs.rid
           ON cl.k = cr.k AND cl.t >= cr.t""")
    val parenthesized = spark.sql(
      """SELECT cl.k, cl.t, nm FROM cl
         ASOF LEFT JOIN (SELECT cr.k, cr.t, nm FROM cr JOIN cs ON cr.rid = cs.rid) j
           ON cl.k = j.k AND cl.t >= j.t""")
    assert(rows(chained) == rows(parenthesized),
      "chained right side diverges from the parenthesized form")
    assert(rows(chained) == Set("10|100|r7", "20|70|r8", "30|5|null"))
  }

  test("tie discipline: both lowerings pick the identical row on " +
      "(key, t) ties, inclusive and strict") {
    import spark.implicits._
    Seq((1L, 10L, 100L)).toDF("cid", "u", "t").createOrReplaceTempView("lx")
    Seq((3L, 10L, 90L), (5L, 10L, 100L), (7L, 10L, 100L))
      .toDF("eid", "u", "t").createOrReplaceTempView("rx")
    def q(op: String) =
      s"""SELECT l.cid, r.eid FROM lx l
          ASOF LEFT JOIN rx r ON l.u = r.u AND l.t $op r.t"""
    def run(op: String, lowering: String): Set[String] = {
      spark.conf.set(graft.plans.AsofJoinRewriteRule.LoweringConfKey, lowering)
      try rows(spark.sql(q(op)))
      finally spark.conf.unset(graft.plans.AsofJoinRewriteRule.LoweringConfKey)
    }
    // inclusive backward: ties at t=100 break to the max tuple (eid 7)
    assert(run(">=", "window") == Set("1|7"))
    assert(run(">=", "join") == Set("1|7"))
    // strict backward: t=100 excluded, the t=90 row wins
    assert(run(">", "window") == Set("1|3"))
    assert(run(">", "join") == Set("1|3"))
    // forward inclusive: earliest at-or-after = min tuple at t=100
    assert(run("<=", "window") == Set("1|5"))
    assert(run("<=", "join") == Set("1|5"))
    // forward strict: nothing strictly after t=100 → null
    assert(run("<", "window") == Set("1|null"))
    assert(run("<", "join") == Set("1|null"))
  }

  test("null keys and null ordering values never match; null-safe " +
      "equality falls back to the join form and DOES match null keys") {
    import spark.implicits._
    Seq((1L, Option(10L), Option(100L)), (2L, None, Option(100L)),
        (3L, Option(10L), None))
      .toDF("cid", "u", "t").createOrReplaceTempView("lnull")
    Seq((5L, Option(10L), Option(90L)), (6L, None, Option(80L)),
        (7L, Option(10L), None))
      .toDF("eid", "u", "t").createOrReplaceTempView("rnull")
    val got = rows(spark.sql(
      """SELECT l.cid, r.eid FROM lnull l
         ASOF LEFT JOIN rnull r ON l.u = r.u AND l.t >= r.t"""))
    assert(got == Set("1|5", "2|null", "3|null"))
    // <=> matches the null key pair (cid 2 ↔ eid 6): join-form path
    val nullSafe = spark.sql(
      """SELECT l.cid, r.eid FROM lnull l
         ASOF LEFT JOIN rnull r ON l.u <=> r.u AND l.t >= r.t""")
    assert(nullSafe.queryExecution.optimizedPlan.exists(_.isInstanceOf[
        org.apache.spark.sql.catalyst.plans.logical.Join]),
      "null-safe equality should take the join lowering")
    assert(rows(nullSafe) == Set("1|5", "2|6", "3|null"))
  }

  test("ASOF (inner) JOIN equals the LEFT form filtered to matches") {
    SqlGateway.open(spark, sf)
    val inner = spark.sql(
      """SELECT c.event_id, c.user_id, e.err_id AS asof_err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
         ASOF JOIN
              (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.ts >= e.ts""")
    val left = SparkEntry.queries("e3_asof_join")(spark, sf)
      .filter(col("asof_err_id").isNotNull)
    assert(rows(inner) == rows(left))
  }

  test("forward ASOF (<=) picks the EARLIEST at-or-after row; " +
      "ties break to the smallest tuple") {
    SqlGateway.open(spark, sf)
    val viaSql = spark.sql(
      """SELECT c.event_id, e.err_id AS next_err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.ts <= e.ts""")
    // ground truth from first principles: min (ts, err_id) among
    // errors at-or-after the click, per click
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("ets"))
    val want = clicks.join(errors,
        col("user_id") === col("u") && col("ts") <= col("ets"), "left")
      .groupBy(col("event_id"))
      .agg(min(when(col("err_id").isNotNull,
        struct(col("ets"), col("err_id")))).as("m"))
      .select(col("event_id"), col("m.err_id").as("next_err_id"))
    assert(rows(viaSql) == rows(want))
  }

  test("unaliased-subquery ASOF runs as an as-of join, not a silent plain join") {
    SqlGateway.open(spark, sf)
    val df = spark.sql(
      """SELECT event_id, user_id, e.err_id AS asof_err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click')
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id AS u, ts AS ets
               FROM events WHERE event_type = 'error') e
           ON user_id = e.u AND ts >= e.ets""")
    assert(rows(df) == rows(SparkEntry.queries("e3_asof_join")(spark, sf)),
      "unaliased-subquery ASOF diverged from the aliased form")
  }

  test("parameterized spark.sql keeps its named-arg binding through the " +
      "delegating parser") {
    SqlGateway.open(spark, sf)
    val df = spark.sql(
      """SELECT c.event_id, c.user_id, e.err_id AS asof_err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = :lt) c
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = :rt) e
           ON c.user_id = e.user_id AND c.ts >= e.ts""",
      Map("lt" -> "click", "rt" -> "error"))
    assert(rows(df) == rows(SparkEntry.queries("e3_asof_join")(spark, sf)))
  }

  test("a PLAIN left join with the same condition is not hijacked") {
    SqlGateway.open(spark, sf)
    val plain = spark.sql(
      """SELECT c.event_id, e.err_id
         FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click') c
         LEFT JOIN
              (SELECT event_id AS err_id, user_id, ts FROM events WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.ts >= e.ts""")
    val asof = SparkEntry.queries("e3_asof_join")(spark, sf)
    // the plain join keeps EVERY matching error per click
    assert(plain.count() > asof.count(),
      "plain range left join should out-row the as-of pick at sf0.001")
  }

  test("ASOF with extra WHERE above and multiple equality keys") {
    SqlGateway.open(spark, sf)
    // second equality key folds the partition: constant TRUE-ish key
    // via event-day equality narrows matches to same-day errors
    val viaSql = spark.sql(
      """SELECT c.event_id, e.err_id AS asof_err_id
         FROM (SELECT event_id, user_id, CAST(ts AS DATE) AS d, ts
               FROM events WHERE event_type = 'click') c
         ASOF LEFT JOIN
              (SELECT event_id AS err_id, user_id, CAST(ts AS DATE) AS d, ts
               FROM events WHERE event_type = 'error') e
           ON c.user_id = e.user_id AND c.d = e.d AND c.ts >= e.ts
         WHERE c.event_id % 2 = 0""")
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"),
        col("ts").cast("date").as("d"), col("ts"))
      .filter(col("event_id") % 2 === 0)
    val errors = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"),
        col("ts").cast("date").as("ed"), col("ts").as("ets"))
    val want = clicks.join(errors,
        col("user_id") === col("u") && col("d") === col("ed") &&
          col("ts") >= col("ets"), "left")
      .groupBy(col("event_id"))
      .agg(max(when(col("err_id").isNotNull,
        struct(col("ets"), col("err_id")))).as("m"))
      .select(col("event_id"), col("m.err_id").as("asof_err_id"))
    assert(rows(viaSql) == rows(want))
  }
}
