package graft

import org.apache.spark.sql.functions.col
import graft.queries.RetrievalQueries
import graft.sources.Tables

/** Ground truth by independent driver-side recompute: BM25 and the
  * RRF fusion re-derived in plain Scala from the collected corpus,
  * compared EXACTLY (integer micro scores, ranks) against the
  * distributed results. */
class RetrievalQueriesSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"
  private val terms = Seq("dup", "vector", "stream")

  private lazy val docs: Seq[(Long, Array[String])] =
    Tables.documents(spark, dir).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1).trim.toLowerCase.split("\\s+")))
      .toSeq

  /** (doc_id, bm25_micro) for matching docs — the same formula in
    * the same evaluation order as the distributed query. */
  private lazy val bm25Truth: Seq[(Long, Long)] = {
    val nDocs = docs.size.toLong
    val sumDl = docs.map(_._2.length.toLong).sum
    val avgdl = sumDl.toDouble / nDocs
    val dfs = terms.map(t => docs.count(_._2.contains(t)).toLong)
    docs.flatMap { case (id, w) =>
      val dl = w.length.toLong
      val tfs = terms.map(t => w.count(_ == t).toLong)
      if (tfs.sum == 0) None
      else Some(id -> terms.indices.map { i =>
        val tf = tfs(i); val df = dfs(i)
        if (tf == 0) 0L
        else math.round((nDocs - df + 0.5) / (df + 0.5) *
          (tf * 2.2) / (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / avgdl)) * 1000000.0)
      }.sum)
    }
  }

  private def topK[A](scored: Seq[(Long, A)], k: Int)(
      implicit ord: Ordering[A]): Seq[(Long, Long, A)] =
    scored.sortBy { case (id, s) => (s, id) }(Ordering.Tuple2(ord.reverse, Ordering.Long))
      .take(k).zipWithIndex.map { case ((id, s), i) => (id, i + 1L, s) }

  test("t_bm25_topk equals a driver-side recompute exactly") {
    val got = RetrievalQueries.tBm25Topk(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._2)
    val want = topK(bm25Truth, 10)
    assert(got == want, s"got $got\nwant $want")
    assert(got.nonEmpty && got.head._3 > got.last._3,
      "rare-term idf should spread the score range")
  }

  test("t_hybrid_rrf equals a driver-side recompute of both arms") {
    val sRank: Map[Long, Long] =
      topK(bm25Truth, 50).map { case (id, rk, _) => id -> rk }.toMap
    val embs = Tables.embeddings(spark, dir).select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray)).toSeq
    def normed(v: Array[Double]): Array[Double] = {
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n)
    }
    val q0 = normed(embs.find(_._1 == 0L).get._2)
    def round4(x: Double): Double =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val cos = embs.filter(_._1 != 0L).map { case (id, v) =>
      val nv = normed(v)
      id -> round4(q0.zip(nv).map { case (a, b) => a * b }.sum)
    }
    val dRank: Map[Long, Long] =
      topK(cos, 50)(Ordering.Double.TotalOrdering)
        .map { case (id, rk, _) => id -> rk }.toMap
    val fusedTruth = (dRank.keySet ++ sRank.keySet).toSeq.map { id =>
      val d = dRank.get(id).map(r => math.round(1000000.0 / (60 + r))).getOrElse(0L)
      val s = sRank.get(id).map(r => math.round(1000000.0 / (60 + r))).getOrElse(0L)
      id -> (d + s)
    }
    val want = topK(fusedTruth, 10)
    val got = RetrievalQueries.tHybridRrf(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq.sortBy(_._2)
    assert(got == want, s"got $got\nwant $want")
    // arm ranks surfaced in the output agree with the recompute
    RetrievalQueries.tHybridRrf(spark, dir).collect().foreach { r =>
      val id = r.getLong(0)
      assert(Option(r.get(3)).map(_.asInstanceOf[Long]) == dRank.get(id))
      assert(Option(r.get(4)).map(_.asInstanceOf[Long]) == sRank.get(id))
    }
  }
}
