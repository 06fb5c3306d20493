package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.queries.VectorIndex
import graft.streaming.StreamOps

/** Streaming similarity serving: exact (annScoreBatch) and
  * stored-IVF-index (annServeBatch) paths through real MemoryStream
  * micro-batches. Serving is stateless, so N micro-batches must
  * produce exactly the one-shot batch answer for the same queries —
  * and the indexed path must agree with the exact path's top
  * neighbor while reading only probed cells. */
class StreamServeSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def queryVecs(ids: Seq[Long]): Seq[(Long, Array[Float])] = {
    val rows = graft.sources.Tables.embeddings(spark, dir)
      .filter(col("vec_id").isin(ids: _*))
      .select(col("vec_id"), col("embedding")).collect()
    rows.map(r => (r.getLong(0), r.getSeq[Float](1).toArray)).toSeq
  }

  private def runStream(fn: (DataFrame, Long) => DataFrame,
      batches: Seq[Seq[(Long, Array[Float])]]): Seq[org.apache.spark.sql.Row] = {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val in = MemoryStream[(Long, Array[Float])]
    val out = scala.collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val q = in.toDF().toDF("qid", "qemb").writeStream
      .foreachBatch { (b: DataFrame, id: Long) =>
        out ++= fn(b, id).collect()
        ()
      }
      .start()
    batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
    q.stop()
    out.toSeq
  }

  test("indexed streaming serving == one-shot search; self at sim 1.0; exact path agrees") {
    import spark.implicits._
    val idx = Files.createTempDirectory("graft-serve-idx").toString
    VectorIndex.buildIvf(spark, dir, idx)
    val ids = Seq(0L, 1L, 2L, 3L)
    val vecs = queryVecs(ids)
    // two micro-batches of two queries each
    val streamed = runStream(StreamOps.annServeBatch(idx), Seq(vecs.take(2), vecs.drop(2)))
    val oneShot = VectorIndex.searchIvf(spark, idx,
      vecs.toDF("qid", "qemb")).collect()
    assert(streamed.map(_.toString).sorted == oneShot.map(_.toString).sorted.toSeq,
      "micro-batched serving diverges from one-shot search")

    // every corpus query finds itself first at sim 1.0 on BOTH paths
    val exact = runStream(StreamOps.annScoreBatch(dir), Seq(vecs.take(2), vecs.drop(2)))
    for (rows <- Seq(streamed, exact); id <- ids) {
      val first = rows.filter(_.getLong(0) == id).minBy(_.getLong(1))
      assert(first.getLong(2) == id && first.getDouble(3) == 1.0,
        s"query $id did not retrieve itself first")
    }

    // and the indexed path's top non-self neighbor agrees with the
    // exact path's for at least 3 of 4 queries (recall floor at k=1)
    def topNonSelf(rows: Seq[org.apache.spark.sql.Row]) =
      ids.map { id =>
        id -> rows.filter(r => r.getLong(0) == id && r.getLong(2) != id)
          .minBy(_.getLong(1)).getLong(2)
      }.toMap
    val agree = ids.count(id => topNonSelf(streamed)(id) == topNonSelf(exact)(id))
    assert(agree >= 3, s"indexed serving agrees on only $agree/4 top neighbors")
  }
}
