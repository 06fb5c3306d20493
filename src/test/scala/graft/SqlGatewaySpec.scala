package graft

import org.apache.spark.sql.DataFrame

/** The SQL front door: temp views over the same loaders, native
  * functions callable from SQL, and the oracle-symmetry round trip —
  * the ANSI subset of SparkEntry.oracleSql must produce the SAME
  * rows through spark.sql as the DataFrame queries it oracles. */
class SqlGatewaySpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def rows(df: DataFrame): Set[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).toSet

  test("ANSI oracle SQL through the SQL door equals the DataFrame query") {
    // the portable (no DuckDB list_*/unnest) oracle entries: both
    // engines' SQL dialects accept these verbatim, so one text drives
    // Spark here and DuckDB in the driver's compare — symmetric
    val portable = Seq("q1_pricing_summary", "s1_full_scan",
      "s2_filtered_scan", "j3_broadcast_lookup", "a3_sum_reduce")
    SqlGateway.open(spark, sf)
    for (name <- portable) {
      val viaSql = rows(spark.sql(SparkEntry.oracleSql(name)))
      val viaDf = rows(SparkEntry.queries(name)(spark, sf))
      assert(viaSql == viaDf,
        s"$name: sql-door rows ${viaSql.size} != dataframe rows ${viaDf.size} " +
          s"(missing=${(viaDf -- viaSql).size} extra=${(viaSql -- viaDf).size})")
    }
  }

  test("native graft functions are callable from SQL") {
    SqlGateway.open(spark, sf)
    val got = spark.sql(
      """SELECT vec_id,
         round(graft_dot(CAST(embedding AS ARRAY<DOUBLE>),
                         CAST(embedding AS ARRAY<DOUBLE>)), 4) AS sq
         FROM embeddings ORDER BY vec_id LIMIT 5""").collect()
    assert(got.length == 5)
    assert(got.forall(_.getDouble(1) >= 0.0))
  }

  test("views ride the loaders: events.ts is a session-zone timestamp") {
    SqlGateway.open(spark, sf)
    val t = spark.sql("SELECT ts FROM events LIMIT 1").schema("ts").dataType
    assert(t == org.apache.spark.sql.types.TimestampType,
      s"events.ts through the SQL door is $t, not TIMESTAMP")
  }
}
