package graft

import org.apache.spark.sql.functions._

import graft.plans.RecursiveSqlBridge

/** The driver-paced recursion bridge: `WITH RECURSIVE … UNION`
  * (distinct) through plain `spark.sql` on the extensions session.
  * Fixpoint semantics pinned against hand-computed fixtures on a
  * CYCLIC graph (the case UNION ALL recursion cannot terminate on),
  * shape-detection guards pinned at the unit level. The six oracle
  * texts themselves are covered by SqlGatewaySpec's inventory (now
  * the whole set) and by PortableScan. */
class RecursiveSqlBridgeSpec extends SparkSpec {

  private def rows(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("cyclic reachability: min-label components via UNION-distinct " +
      "recursion match the hand answer") {
    import spark.implicits._
    // two components, each containing a cycle: {1,2,3} and {7,8}
    Seq((1L, 2L), (2L, 3L), (3L, 1L), (7L, 8L), (8L, 7L))
      .toDF("s", "d").createOrReplaceTempView("redges")
    val got = spark.sql(
      """WITH RECURSIVE
         e AS (SELECT s AS src, d AS dst FROM redges
               UNION SELECT d, s FROM redges),
         walk(id, lbl) AS (
               SELECT src, src FROM e
               UNION
               SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id, min(lbl) AS comp FROM walk GROUP BY id""")
    assert(rows(got) == Set("1|1", "2|1", "3|1", "7|7", "8|7"))
    // re-running the identical statement reuses its view slot and
    // returns the same rows (the bounded-leak contract)
    assert(rows(spark.sql(
      """WITH RECURSIVE
         e AS (SELECT s AS src, d AS dst FROM redges
               UNION SELECT d, s FROM redges),
         walk(id, lbl) AS (
               SELECT src, src FROM e
               UNION
               SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id)
         SELECT id, min(lbl) AS comp FROM walk GROUP BY id""")) ==
      Set("1|1", "2|1", "3|1", "7|7", "8|7"))
  }

  test("depth-capped BFS recursion (the g6 shape, WHERE inside the step)") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (3L, 4L)).toDF("s", "d")
      .createOrReplaceTempView("bfsedges")
    val got = spark.sql(
      """WITH RECURSIVE
         walk(id, d) AS (
               SELECT CAST(1 AS BIGINT), 0 FROM (SELECT 1)
               UNION
               SELECT e.d, w.d + 1 FROM walk w JOIN bfsedges e ON e.s = w.id
               WHERE w.d < 2)
         SELECT id, min(d) AS dist FROM walk GROUP BY id""")
    // cap at 2 hops: node 4 (3 hops) is never reached
    assert(rows(got) == Set("1|0", "2|1", "3|2"))
  }

  test("shape guards: UNION ALL, non-recursive WITH, and missing column " +
      "lists pass through to the delegate untouched") {
    // UNION ALL recursion → None (Spark's native path handles it)
    assert(RecursiveSqlBridge.maybeBridge(spark,
      """WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 3)
         SELECT * FROM r""").isEmpty)
    // plain WITH (no RECURSIVE keyword) → None, cheap prefix check
    assert(RecursiveSqlBridge.maybeBridge(spark,
      "WITH t AS (SELECT 1 AS x) SELECT * FROM t").isEmpty)
    // recursive member without a column list → None (the bridge
    // cannot name the working columns; base may duplicate names)
    assert(RecursiveSqlBridge.maybeBridge(spark,
      """WITH RECURSIVE r AS (SELECT 1 AS n UNION SELECT n + 1 FROM r WHERE n < 3)
         SELECT * FROM r""").isEmpty)
    // no self-reference in any CTE body → None
    assert(RecursiveSqlBridge.maybeBridge(spark,
      """WITH RECURSIVE r(n) AS (SELECT 1 UNION SELECT 2)
         SELECT * FROM r""").isEmpty)
    // and the UNION ALL text actually RUNS natively on this session
    assert(rows(spark.sql(
      """WITH RECURSIVE r(n) AS (SELECT 1 UNION ALL SELECT n + 1 FROM r WHERE n < 3)
         SELECT * FROM r""")) == Set("1", "2", "3"))
  }

  test("a CTE declared AFTER the recursive member that references it " +
      "keeps its lexical slot in the final statement") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 1L), (5L, 6L), (6L, 5L)).toDF("s", "d")
      .createOrReplaceTempView("postedges")
    val got = rows(spark.sql(
      """WITH RECURSIVE
         e AS (SELECT s AS src, d AS dst FROM postedges
               UNION SELECT d, s FROM postedges),
         walk(id, lbl) AS (
               SELECT src, src FROM e
               UNION
               SELECT e.src, w.lbl FROM e JOIN walk w ON e.dst = w.id),
         agg AS (SELECT id, min(lbl) AS comp FROM walk GROUP BY id)
         SELECT * FROM agg"""))
    assert(got == Set("1|1", "2|1", "5|5", "6|5"),
      s"post-recursive CTE mis-scoped: $got")
  }

  test("parameterized statements never bridge: bindings would be lost " +
      "mid-evaluation, so they fail loudly on the native path") {
    val e = intercept[Exception](spark.sql(
      """WITH RECURSIVE r(n) AS (SELECT 1 UNION SELECT n + 1 FROM r WHERE n < :cap)
         SELECT * FROM r""", Map("cap" -> 3)).collect())
    // Spark's native recursion rejects UNION-distinct (or the unbound
    // construct) — EITHER way the failure is loud, never a silently
    // unbound parameter inside the bridge's internal statements
    assert(e != null)
    // and a parameterized NON-recursive statement still binds fine
    assert(spark.sql("SELECT :x AS v", Map("x" -> 7)).collect()(0).getInt(0) == 7)
  }

  test("acyclic UNION-distinct recursion agrees with the equivalent " +
      "UNION ALL native run") {
    import spark.implicits._
    Seq((1L, 2L), (2L, 3L), (1L, 3L)).toDF("s", "d")
      .createOrReplaceTempView("dagedges")
    def q(union: String) = s"""WITH RECURSIVE
         reach(id) AS (
               SELECT CAST(1 AS BIGINT) FROM (SELECT 1)
               $union
               SELECT e.d FROM reach r JOIN dagedges e ON e.s = r.id)
         SELECT DISTINCT id FROM reach"""
    assert(rows(spark.sql(q("UNION"))) == rows(spark.sql(q("UNION ALL"))))
    assert(rows(spark.sql(q("UNION"))) == Set("1", "2", "3"))
  }
}
