package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.sources.Tables

/** Iterative graph dataflow over the star schema — the remaining
  * operator family of a large-scale curation pipeline (link-analysis
  * quality weighting, e.g. CommonCrawl's harmonic-centrality domain
  * ranking): each superstep is one join + one map-side-combinable
  * aggregation, the Pregel-on-DataFrames shape GraphX lowers to.
  *
  * The reference has no graph operators (SURVEY §2 — absence backed
  * by the full file inventory); this family is driver-brief
  * (LLM-pipeline) scope alongside SURVEY §8.
  */
object GraphQueries {

  /** Integer-exact PageRank over the part co-purchase graph (parts
    * sharing an order are linked — the item-importance signal a
    * marketplace curation pipeline derives from baskets).
    *
    * All arithmetic is in BIGINT micros with floor division so every
    * engine computes bit-identical ranks — a float PageRank's
    * per-node sums are IEEE order-dependent and can never
    * hash-match across engines (the t_bm25_topk integer-micros
    * argument applied to an iterative kernel). The recurrence, with
    * rank mass 1e6 per node and damping 85/100:
    *
    *   r0(n)   = 1_000_000
    *   r_i(n)  = 150_000 + (85 * Σ_{(m,n)∈E} (r_{i-1}(m) div deg(m))) div 100
    *
    * 100 TB design: the edge frame (with out-degree attached once)
    * is built by a bounded per-order self-join — fanout is
    * items-per-order squared, never corpus² — and persisted across
    * supersteps, so each iteration pays exactly one shuffle join
    * (ranks ⋈ edges) plus one map-side-combined sum keyed by the
    * uniform dst key; a celebrity hub's in-edges partial-aggregate
    * before the exchange. The rank frame is node-sized (graph
    * vocabulary, not corpus), `localCheckpoint(true)` truncates the
    * iterative lineage exactly as `clustersOf` does, and the node
    * list broadcast-joins back for dangling nodes. At 1000 executors
    * edges would be bucketed by src so the per-superstep join is
    * exchange-free on the big side.
    */
  def g1PageRank(spark: SparkSession, dir: String, iters: Int = 5): DataFrame = {
    val li = Tables.lineitem(spark, dir)
      .select(col("l_orderkey"), col("l_partkey"))
    val x = li.select(col("l_orderkey"), col("l_partkey").as("src"))
    val y = li.select(col("l_orderkey"), col("l_partkey").as("dst"))
    val edges = x.join(y, Seq("l_orderkey"))
      .filter(col("src") =!= col("dst"))
      .select(col("src"), col("dst")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val deg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    // degree rides the edge frame once; every superstep reuses it
    val ewd = edges.join(deg, Seq("src"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val nodes = li.select(col("l_partkey").as("node")).distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)

    var ranks = nodes.withColumn("r", lit(1000000L))
    for (_ <- 1 to iters) {
      val contrib = ewd.join(ranks, col("src") === col("node"))
        .select(col("dst").as("node"), expr("r div deg").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("s"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr("150000 + (85 * coalesce(s, 0)) div 100").as("r"))
        .localCheckpoint(true)
    }
    val out = ranks.select(col("node").as("part_key"),
      col("r").cast("long").as("rank_micros"))
    edges.unpersist(); ewd.unpersist(); nodes.unpersist()
    out
  }
}
