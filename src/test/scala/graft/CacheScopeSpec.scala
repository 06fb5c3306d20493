package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.ops.CacheScope

/** The cache-lifecycle mechanism itself (the per-query invariant is
  * asserted over every SparkEntry query in QueriesSmokeSpec).
  *
  * The subtle contract under test: [[CacheScope.owned]] must release
  * its deps for ANY action shape — `collect`/`show` act on the
  * returned Dataset's own QueryExecution (matching the un-analyzed
  * plan object), while `count`/`write` and actions on FURTHER
  * TRANSFORMATIONS build new plans over the ANALYZED plan object —
  * which is why Entry carries both. */
class CacheScopeSpec extends SparkSpec {

  private def freshDf(tag: String): DataFrame = {
    import spark.implicits._
    (1 to 100).map(i => (i.toLong, s"$tag$i")).toDF("id", "s")
  }

  private def cached(df: DataFrame): Boolean =
    df.storageLevel.useMemory || df.storageLevel.useDisk

  private def awaitReleased(df: DataFrame): Unit = {
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (cached(df) && System.nanoTime() < deadline) Thread.sleep(25)
    assert(!cached(df), "dep still cached after owning action completed")
  }

  test("withPersisted unpersists after the body, including on throw") {
    val df = freshDf("wp")
    val n = CacheScope.withPersisted(df) { df.count() }
    assert(n == 100 && !cached(df))
    val boom = freshDf("wpboom")
    intercept[RuntimeException] {
      CacheScope.withPersisted(boom) { boom.count(); throw new RuntimeException("x") }
    }
    assert(!cached(boom))
  }

  test("owned releases deps when the result itself is collected") {
    val dep = freshDf("oc").persist()
    val out = CacheScope.owned(dep.filter(col("id") > 10).select(col("id")), dep)
    assert(out.collect().length == 90)
    awaitReleased(dep)
  }

  test("owned releases deps when a TRANSFORMATION of the result is counted") {
    // count() and downstream transforms plan over the ANALYZED child —
    // the case the round-8 logical-only matching missed
    val dep = freshDf("ot").persist()
    val out = CacheScope.owned(dep.groupBy(col("s")).agg(sum(col("id")).as("t")), dep)
    assert(out.filter(col("t") > 0).count() == 100)
    awaitReleased(dep)
  }

  test("owned releases deps when the result is written") {
    val dep = freshDf("ow").persist()
    val out = CacheScope.owned(dep.select(col("id")), dep)
    val dir = java.nio.file.Files.createTempDirectory("graft_cachescope_").toString
    out.write.mode("overwrite").parquet(s"$dir/out.parquet")
    awaitReleased(dep)
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(dir))
  }

  test("owned survives DeduplicateRelations: same-source join compositions release") {
    // joining the owned result with another frame built from the SAME
    // source makes the analyzer rewrite one side with fresh expression
    // ids — identity matching alone would never release (the
    // qualityGateOf/classifierFrame failure round 9 fixed)
    val src = freshDf("dd")
    val dep = src.select(col("id"), length(col("s")).as("l")).persist()
    val out = CacheScope.owned(dep.groupBy(col("id")).agg(max(col("l")).as("m")), dep)
    val joined = src.select(col("id"), col("s")).join(out, Seq("id"))
    assert(joined.count() == 100)
    awaitReleased(dep)
    assert(CacheScope.pendingCount(spark) == 0)
  }

  test("unrelated actions do not release an owned entry") {
    val dep = freshDf("ou").persist()
    val out = CacheScope.owned(dep.select(col("id")), dep)
    freshDf("other").count() // unrelated plan — must not match
    Thread.sleep(200)
    assert(cached(dep), "unrelated action released the dep")
    assert(CacheScope.pendingCount(spark) >= 1)
    out.count()
    awaitReleased(dep)
    assert(CacheScope.pendingCount(spark) == 0)
  }

  // The abandoned owner must be created in its OWN frame: a reference
  // that ever appears in the test method's frame (including ScalaTest
  // assert-macro temporaries) can stay JVM-reachable until the method
  // returns, which would defeat the weak-reference sweep under test.
  private def registerAndDrop(dep: DataFrame): Unit = {
    CacheScope.owned(dep.select(col("id")), dep) // result discarded here
    ()
  }

  test("abandoned results (dropped unmaterialized) are swept via weak owners") {
    val baseline = CacheScope.pendingCount(spark)
    val dep = freshDf("ab").persist()
    registerAndDrop(dep)
    assert(CacheScope.pendingCount(spark) == baseline + 1)
    val deadline = System.nanoTime() + 15L * 1000 * 1000 * 1000
    while (CacheScope.pendingCount(spark) > baseline && System.nanoTime() < deadline) {
      System.gc()
      freshDf("abTick").count() // any completed query triggers the sweep
      Thread.sleep(50)
    }
    assert(CacheScope.pendingCount(spark) == baseline,
      "abandoned entry not swept after owner plans became unreachable")
    awaitReleased(dep)
  }

  test("MaxPending cap force-releases the oldest prepare-only entry") {
    val first = freshDf("cap0").persist()
    val keep = CacheScope.owned(first.select(col("id")), first)
    // fill the registry with MaxPending more live (referenced) entries
    val held = (1 to CacheScope.MaxPending).map { i =>
      val d = freshDf(s"cap$i").persist()
      (d, CacheScope.owned(d.select(col("id")), d))
    }
    assert(keep != null && held.size == CacheScope.MaxPending)
    awaitReleased(first) // oldest evicted despite its live reference
    CacheScope.releaseAll(spark)
    held.foreach { case (d, _) => awaitReleased(d) }
  }

  test("releaseAll is the escape hatch for never-materialized results") {
    val dep = freshDf("ra").persist()
    CacheScope.owned(dep.select(col("id")), dep)
    CacheScope.releaseAll(spark)
    awaitReleased(dep)
    assert(CacheScope.pendingCount(spark) == 0)
  }
}
