package graft

import graft.queries.{CurationQueries, TextQueries, VectorQueries}

/** The composed curation pass must be exactly the conjunction of its
  * component operators — each of which carries its own oracle/spec —
  * with no drift introduced by the fusion. */
class CurationQueriesSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.01"

  test("tCurationE2e equals the conjunction of its component operators") {
    val out = CurationQueries.tCurationE2e(spark, sf).collect()
      .map(r => r.getLong(0) ->
        ((r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4))))
      .toMap
    val gate = TextQueries.tQualityGate(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(5)).toMap
    val dupKeepers = TextQueries.dedupExact(spark, sf).collect()
      .map(_.getLong(1)).toSet
    val outliers = VectorQueries.embOutliers(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out.nonEmpty && out.size == gate.size,
      s"row count ${out.size} != gate count ${gate.size}")
    out.foreach { case (id, (q, d, o, k)) =>
      assert(q == gate(id), s"doc $id quality_ok != gate verdict")
      assert(d == !dupKeepers.contains(id), s"doc $id dup flag")
      assert(o == outliers.getOrElse(id, false), s"doc $id outlier flag")
      assert(k == (q && !d && !o), s"doc $id kept is not the conjunction")
    }
    // the decision table discriminates: some kept, some dropped, and
    // at least one drop per signal class at this SF
    assert(out.values.exists(_._4) && out.values.exists(!_._4))
  }
}
