package graft

/** Every SparkEntry query executes at sf0.001; the ones with stable
  * small-scale output must return rows (the driver's t1-style
  * check). Threshold-y pair queries (near-dup at tiny sf) only need
  * to execute. */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // queries whose sf0.001 output could legitimately be empty
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "emb_near_dup")

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
    }
  }

  test("entry (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }
}
