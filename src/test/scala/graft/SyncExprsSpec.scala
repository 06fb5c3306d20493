package graft

import org.apache.spark.sql.functions._
import graft.expr.SyncExprs

/** Unit specs for the scalar layer (SURVEY §2.3) — P1 name
  * synthesis, P4 serial chain, P5 cents rounding vs JS Math.round,
  * P7/P8 variant resolution. */
class SyncExprsSpec extends SparkSpec {
  import spark.implicits._

  test("P1 productName: trim, null coalesce, inner whitespace") {
    val df = Seq(
      ("Apple", "iPhone 12"),
      (null, "S9"),
      ("Samsung", null),
      (null, null),
      ("  Apple  ", "  iPhone  ")).toDF("m", "mo")
      .select(SyncExprs.productName(col("m"), col("mo")).as("n"))
    assert(df.as[String].collect().toSeq ==
      Seq("Apple iPhone 12", "S9", "Samsung", "", "Apple iPhone"))
  }

  test("P4 serial: 4-way fallback priority") {
    val df = Seq(
      (Option("e"), Option("h"), Option("s"), 1L),
      (None, Option("h"), Option("s"), 2L),
      (None, None, Option("s"), 3L),
      (None, None, None, 4L)).toDF("esn", "hex", "sku", "id")
      .select(SyncExprs.serial(col("esn"), col("hex"), col("sku"), col("id")).as("x"))
    assert(df.as[String].collect().toSeq == Seq("e", "h", "s", "item_4"))
  }

  test("P5 centsToDollars matches JS Math.round(x/100) on 2k cases") {
    val cents = (0 until 2000).map(i => (i * 7919L + i) % 100000L)
    val got = cents.toDF("c")
      .select(SyncExprs.centsToDollars(col("c")).as("d"))
      .as[Long].collect().toSeq
    // JS Math.round rounds half toward +Infinity
    val expect = cents.map(c => math.floor(c / 100.0 + 0.5).toLong)
    assert(got == expect)
    // null cents → 0 dollars
    val n = Seq(Option.empty[Long]).toDF("c")
      .select(SyncExprs.centsToDollars(col("c")).as("d")).as[Long].head()
    assert(n == 0L)
  }

  test("P7/P8 resolveVariant: two-pass probe and fallbacks") {
    val cases = Seq(
      // pass 1: space-stripped capacity hits
      (Option("64GB 4GB RAM, 128GB 4GB RAM"), Option("128"), "128GB 4GB RAM"),
      // pass 2: raw capacity (with space) only matches unstripped;
      // FIRST containing entry wins (products.js:103-107)
      (Option("64GB 4GB RAM, 4GB RAM special"), Option("4GB RAM"), "64GB 4GB RAM"),
      // no spec entry matches → Unknown
      (Option("64GB 4GB RAM"), Option("999"), "Unknown"),
      // no admin storage → synthesized fallback
      (None, Option("128"), "128GB 4GB RAM"),
      // no capacity → Unknown regardless
      (Option("64GB 4GB RAM"), None, "Unknown"),
      (None, None, "Unknown"))
    val df = cases.map { case (s, c, _) => (s, c) }.toDF("storage", "capacity")
      .select(SyncExprs.resolveVariant(col("storage"), col("capacity")).as("v"))
    assert(df.as[String].collect().toSeq == cases.map(_._3))
  }

  test("P10 hasStock: empty and all-zero option arrays are skipped") {
    val df = Seq(
      (Seq((1, "a")), true),
      (Seq.empty[(Int, String)], false),
      (Seq((0, "a"), (0, "b")), false),
      (Seq((0, "a"), (2, "b")), true))
      .toDF("raw", "expect")
      .select(transform(col("raw"),
        r => struct(r.getField("_1").as("stock"), r.getField("_2").as("x")))
        .as("selectedOptions"), col("expect"))
    val got = df.select(SyncExprs.hasStock(col("selectedOptions")).as("g"), col("expect"))
      .as[(Boolean, Boolean)].collect()
    got.foreach { case (g, e) => assert(g == e) }
  }
}
