package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.sources.{Formats, Tables}

/** CSV / JSON-lines interchange round-trips with explicit schemas. */
class FormatsSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def canon(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.collect().map(_.mkString("\u0000")).toSet

  test("documents round-trip through CSV (embedded punctuation survives quoting)") {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("text"))
    val tmp = Files.createTempDirectory("fmt-csv").toString
    Formats.writeCsv(docs, tmp)
    val back = Formats.readCsv(spark, docs.schema, tmp)
    assert(canon(back) == canon(docs))
  }

  test("CSV round-trips fields containing raw newlines (multiLine read)") {
    import spark.implicits._
    val df = Seq(
      (1L, "first line\nsecond line\nthird"),
      (2L, "no newlines here"),
      (3L, "quotes \" and, commas, too\nplus a newline")).toDF("id", "text")
    val tmp = Files.createTempDirectory("fmt-nl").toString
    Formats.writeCsv(df, tmp)
    val back = Formats.readCsv(spark, df.schema, tmp)
    assert(canon(back) == canon(df))
  }

  test("part table round-trips through JSON lines") {
    val part = Tables.part(spark, dir)
    val tmp = Files.createTempDirectory("fmt-json").toString
    Formats.writeJson(part, tmp)
    val back = Formats.readJson(spark, part.schema, tmp)
    assert(back.schema == part.schema)
    assert(canon(back) == canon(part))
  }

  test("orders round-trip through ORC, and filters push down to the ORC scan") {
    val orders = Tables.orders(spark, dir)
    val tmp = Files.createTempDirectory("fmt-orc").toString
    Formats.writeOrc(orders, tmp)
    val back = Formats.readOrc(spark, orders.schema, tmp)
    assert(back.schema == orders.schema)
    assert(canon(back) == canon(orders))
    // predicate pushdown + column pruning reach the ORC scan, same
    // plan quality as parquet (PlanSpec's s2 assertion, ORC edition)
    val q = back.filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val scan = q.queryExecution.executedPlan.collectLeaves().map(_.toString).mkString
    assert(scan.contains("PushedFilters: [IsNotNull(o_orderstatus), EqualTo(o_orderstatus,F)]"),
      s"pushdown missing from ORC scan:\n$scan")
    assert(!scan.contains("o_totalprice"), "column pruning failed on ORC scan")
  }

  test("FAILFAST surfaces malformed interchange rows instead of nulling them") {
    val tmp = Files.createTempDirectory("fmt-bad").toString
    Files.writeString(java.nio.file.Path.of(tmp, "bad.json"),
      """{"p_partkey": 1, "p_brand": "ok"}
        |{not json at all""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("p_partkey",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("p_brand",
        org.apache.spark.sql.types.StringType)))
    intercept[org.apache.spark.SparkException] {
      Formats.readJson(spark, schema, tmp).collect()
    }
  }
}
