package graft

/** Every SparkEntry query executes at sf0.001; the ones with stable
  * small-scale output must return rows (the driver's t1-style
  * check). Threshold-y pair queries (near-dup at tiny sf) only need
  * to execute. */
class QueriesSmokeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  // queries whose sf0.001 output could legitimately be empty
  private val mayBeEmpty = Set("dedup_ngram_jaccard", "dedup_minhash_lsh",
    "dedup_simhash", "emb_near_dup", "dedup_clusters", "dedup_clusters_lsh",
    "emb_dedup_clusters")

  // Long-lived-session invariant (SqlGateway/SyncServer): a query
  // must leave the SQL cache registry empty once its result has been
  // materialized — every in-function persist is either scoped
  // (CacheScope.withPersisted / explicit unpersist) or tied to the
  // returned frame (CacheScope.owned, released by the async
  // query-execution listener, hence the bounded wait).
  private def awaitNoSqlCache(name: String): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (!graft.ops.CacheScope.sqlCacheEmpty(spark) &&
      System.nanoTime() < deadline) Thread.sleep(25)
    assert(graft.ops.CacheScope.sqlCacheEmpty(spark),
      s"$name left entries in the SQL cache (unreleased owned entries: " +
        s"${graft.ops.CacheScope.pendingCount(spark)})")
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name executes at sf0.001") {
      spark.catalog.clearCache() // isolate from earlier suites' leftovers
      val n = fn(spark, dir).count()
      if (!mayBeEmpty(name)) assert(n > 0, s"$name returned no rows")
      awaitNoSqlCache(name)
    }
  }

  test("entry (driver smoke) returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracleSql key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without query: $missing")
  }

  // Queries WITHOUT a SQL oracle (hash-defined outputs) and where
  // their exact ground truth lives instead. A new query must either
  // ship an oracle or be added here WITH a real spec — this test is
  // the tripwire that keeps "rows-only" from quietly meaning
  // "unverified".
  // (The former entries for the ANN family, CMS heavy hitters,
  // k-means/SemDeDup, and the quality classifier moved OUT of this
  // list when those queries gained rendered-model DuckDB oracles —
  // their specs remain as the semantic ground truth on top.)
  private val groundTruthSpecs = Map(
    "t_compress_ratio" -> "TextQueriesSpec equals direct java.util.zip output per doc",
    "q_profile_hll" -> "CoreQueriesSpec within 10% of exact at two SFs",
    "q_quantiles_approx" -> "CoreQueriesSpec within 1% of exact quartiles at two SFs")
  // (t_bpe_tokens moved OUT in round 16 when the merge ranks gained a
  // rendered-model DuckDB oracle replaying the encode loop in SQL;
  // BpeSpec remains as the semantic ground truth on top.)
  // (ann_graph_topk moved OUT when it gained the rendered-graph
  // DuckDB oracle — VectorIndexSpec remains its semantic floor.)

  // Oracles rendered from trained-model registers — they appear in
  // SparkEntry.oracleSql only AFTER their query has run in this JVM
  // (Verify's evaluation order guarantees that at verify time). The
  // tripwire must not depend on which earlier tests ran in this JVM,
  // so these are credited statically; the companion test below keeps
  // the static list honest by actually populating the registers.
  private val registerBackedOracles =
    SparkEntry.registerGatedQueries.toSet

  test("every query has ground truth: a SQL oracle or a named exact spec") {
    val unverified = SparkEntry.queries.keySet --
      SparkEntry.oracleSql.keySet -- groundTruthSpecs.keySet --
      registerBackedOracles
    assert(unverified.isEmpty,
      s"queries with neither oracle nor ground-truth spec: $unverified")
    // and the allowlists carry no stale entries
    val stale = (groundTruthSpecs.keySet ++ registerBackedOracles) --
      SparkEntry.queries.keySet
    assert(stale.isEmpty, s"ground-truth entries for absent queries: $stale")
    val doubled = groundTruthSpecs.keySet.intersect(SparkEntry.oracleSql.keySet)
    assert(doubled.isEmpty, s"oracle-checked queries needlessly allowlisted: $doubled")
  }

  test("register-backed oracles render once their query has run") {
    registerBackedOracles.toSeq.sorted.foreach { name =>
      SparkEntry.queries(name)(spark, dir).count()
      assert(SparkEntry.oracleSql.contains(name),
        s"$name ran but rendered no oracle SQL")
    }
  }
}
