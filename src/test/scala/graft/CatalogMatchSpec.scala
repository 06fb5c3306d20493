package graft

import org.apache.spark.sql.functions._
import graft.ops.CatalogMatch

/** J1/J2/J5: two-pass fuzzy catalog match. */
class CatalogMatchSpec extends SparkSpec {
  import spark.implicits._

  private def admin = Seq(
    ("ap-1", "Apple iPhone 12", "64GB, 128GB"),
    ("ap-2", "Samsung Galaxy S21 Ultra", "128GB, 256GB"),
    ("ap-3", "Samsung Galaxy S21", "128GB"))
    .toDF("_id", "name", "storage")
    .select(col("_id"), col("name"), struct(col("storage")).as("specifications"))

  private def matchNames(names: String*) =
    CatalogMatch.matchCatalog(names.toDF("vendorName"), admin)
      .select(col("vendorName"), col("admin_id"))
      .as[(String, Option[String])].collect().toMap

  test("pass 1: exact match is case- and whitespace-insensitive") {
    val m = matchNames("apple IPHONE 12", "Apple iPhone 12  ")
    assert(m("apple IPHONE 12").contains("ap-1"))
    assert(m("Apple iPhone 12  ").contains("ap-1"))
  }

  test("pass 2: substring fallback picks shortest admin name deterministically") {
    // "galaxy s21" is contained in BOTH ap-2 and ap-3 → deterministic
    // tiebreak = shortest admin name (ap-3), not MongoDB natural order
    val m = matchNames("Galaxy S21")
    assert(m("Galaxy S21").contains("ap-3"))
  }

  test("pass 2 guard: names of length <= 3 never substring-match") {
    val m = matchNames("S21", "ung")
    assert(m("S21").isEmpty && m("ung").isEmpty)
  }

  test("unmatched names survive with null admin (J5 anti side)") {
    val m = matchNames("Nokia 3310", "Apple iPhone 12")
    assert(m("Nokia 3310").isEmpty)
    assert(m("Apple iPhone 12").contains("ap-1"))
  }

  test("output cardinality: exactly one row per input name") {
    val names = Seq("apple iphone 12", "Galaxy S21", "zzz", "S21")
    val out = CatalogMatch.matchCatalog(names.toDF("vendorName"), admin)
    assert(out.count() == names.size)
  }

  test("pass 1: duplicate-keyed catalog rows yield ONE deterministic match") {
    // Two admin rows share lower(trim(name)); the reference's findOne
    // returns one — without the pass-1 pick, each vendorName would
    // emit two rows and fan out every joined item downstream.
    val dupAdmin = Seq(
      ("ap-1", "Apple iPhone 12", "64GB"),
      ("ap-9", "APPLE IPHONE 12 ", "64GB"))
      .toDF("_id", "name", "storage")
      .select(col("_id"), col("name"), struct(col("storage")).as("specifications"))
    val out = CatalogMatch.matchCatalog(
      Seq("apple iphone 12").toDF("vendorName"), dupAdmin)
    val rows = out.as[(String, Option[String], Option[String], Option[String])].collect()
    assert(rows.length == 1)
    // tiebreak: shortest admin name then lexical → "APPLE IPHONE 12 "
    // (16 chars w/ trailing space) loses to "Apple iPhone 12" (15)
    assert(rows.head._2.contains("ap-1"))
  }
}
