package graft

import graft.functions.DuckDbCompat

/** Unit pins for the SQL-door dialect aliases whose semantics are
  * COMPOSED rather than renamed — the renames (list_filter →
  * ArrayFilter etc.) are covered wholesale by SqlGatewaySpec's
  * row-identity inventory; these are the constructions where an edge
  * case could hide. */
class DuckDbCompatSpec extends SparkSpec {

  private def one(q: String): Any = {
    DuckDbCompat.ensureRegistered(spark)
    spark.sql(q).collect()(0).get(0)
  }

  test("strftime %-codes translate to Java patterns; letters are quoted") {
    assert(DuckDbCompat.javaFormat("%Y-%m-%d %H:%M:%S") ==
      "yyyy-MM-dd HH:mm:ss")
    assert(DuckDbCompat.javaFormat("%Y w%m") == "yyyy 'w'MM")
    intercept[IllegalArgumentException] { DuckDbCompat.javaFormat("%q") }
    assert(one("SELECT strftime(TIMESTAMP '1995-06-17 01:02:03', '%Y-%m-%d %H:%M:%S')")
      == "1995-06-17 01:02:03")
  }

  test("range is end-exclusive and EMPTY when start >= stop (unlike sequence)") {
    assert(one("SELECT range(1, 4)").asInstanceOf[scala.collection.Seq[_]].toSeq == Seq(1, 2, 3))
    assert(one("SELECT range(3, 3)").asInstanceOf[scala.collection.Seq[_]].toSeq.isEmpty)
    assert(one("SELECT range(5, 1)").asInstanceOf[scala.collection.Seq[_]].toSeq.isEmpty)
  }

  test("len dispatches: BIGINT char count on strings, element count on lists") {
    assert(one("SELECT len('abcd')") == 4L)
    assert(one("SELECT len(array(1, 2, 3))") == 3L)
  }

  test("epoch keeps the fractional seconds DuckDB reports") {
    assert(one("SELECT epoch(TIMESTAMP '1970-01-01 00:00:01.5')") == 1.5)
  }

  test("time_bucket uses the 2000-01-03 origin, exact below it") {
    // 1995-06-14 is a Wednesday; the Monday of its week is 1995-06-12
    // ONLY under the 2000-01-03 (Monday) origin with floor alignment —
    // epoch-origin (Thursday) bucketing would land on 1995-06-08
    assert(one("""SELECT CAST(time_bucket(INTERVAL '7 days',
        TIMESTAMP '1995-06-14 13:00:00') AS STRING)""") == "1995-06-12 00:00:00")
    assert(one("""SELECT CAST(time_bucket(INTERVAL '1 hour',
        TIMESTAMP '1995-06-14 13:59:59') AS STRING)""") == "1995-06-14 13:00:00")
  }

  test("str_split is PLAIN split — the separator is not a regex") {
    assert(one("SELECT str_split('a.b.c', '.')").asInstanceOf[scala.collection.Seq[_]].toSeq ==
      Seq("a", "b", "c"))
  }

  test("aliases never shadow a builtin except the documented overrides") {
    // regexp_replace must stay Spark's: aliasing it would silently
    // change 3-arg behavior for any session SQL
    assert(DuckDbCompat.functions.map(_._1.funcName)
      .forall(n => n != "regexp_replace"))
    // the pinned override list: len (type-dispatched superset) and
    // make_timestamp (1-arg micros form the builtin never claims)
    assert(DuckDbCompat.overrides.map(_._1.funcName).sorted ==
      Seq("len", "make_timestamp"))
  }

  test("make_timestamp: 1-arg is DuckDB micros, 6-arg stays the Spark builtin") {
    assert(one("SELECT CAST(make_timestamp(803134800000000) AS STRING)") ==
      "1995-06-14 13:00:00")
    assert(one("SELECT CAST(make_timestamp(1995, 6, 14, 13, 0, 0) AS STRING)") ==
      "1995-06-14 13:00:00")
  }
}
