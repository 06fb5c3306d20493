package graft

import graft.ops.Bpe
import graft.queries.TextQueries

/** Ground truth for the BPE tokenizer: the classic Sennrich corpus
  * with hand-derived merges, encode known answers, and a per-doc
  * recompute of the distributed query on a fixture. */
class BpeSpec extends SparkSpec {

  // {low:5, lower:2, newest:6, widest:3} — the worked example from
  // Sennrich et al. 2016. Hand derivation with the </w> marker:
  //   round 1: (e,s)=9, (s,t)=9, (t,</w>)=9 tie → lexicographic (e,s)
  //   round 2: (es,t)=9, (t,</w>)=9 → (es,t)
  //   round 3: (est,</w>)=9 → it
  //   round 4: (l,o)=7, (o,w)=7 → (l,o)
  //   round 5: (lo,w)=7 → it
  private val corpus = Seq("low" -> 5L, "lower" -> 2L, "newest" -> 6L, "widest" -> 3L)

  test("train reproduces the hand-computed merge sequence") {
    val merges = Bpe.train(corpus, 5)
    assert(merges === Seq(
      ("e", "s"), ("es", "t"), ("est", "</w>"), ("l", "o"), ("lo", "w")))
  }

  test("train stops when no pairs remain") {
    // single one-char word: (a, </w>) is the only merge ever possible
    val merges = Bpe.train(Seq("a" -> 1L), 10)
    assert(merges === Seq(("a", "</w>")))
  }

  test("encode applies merges in rank order") {
    val ranks = Bpe.train(corpus, 5).zipWithIndex.map { case (p, i) => p -> i }.toMap
    // lowest: l o w e s t</w> →(e,s)→(es,t)→(est,</w>)→(l,o)→(lo,w)
    assert(Bpe.encode("lowest", ranks) === Seq("low", "est</w>"))
    assert(Bpe.encode("low", ranks) === Seq("low", "</w>"))
    // unseen word: only the merges that apply do
    assert(Bpe.encode("west", ranks) === Seq("w", "est</w>"))
    assert(Bpe.encode("", ranks) === Seq("</w>"))
  }

  test("zero merges leaves every word as chars + marker") {
    val ranks = Map.empty[(String, String), Int]
    assert(Bpe.encode("abc", ranks) === Seq("a", "b", "c", "</w>"))
  }

  test("tBpe per-doc counts equal a driver-side recompute on a fixture") {
    import spark.implicits._
    val docs = Seq(
      (1L, "low low low low low lower lower"),
      (2L, "newest newest newest newest newest newest"),
      (3L, "widest widest widest newest low"),
      (4L, "entirely unrelated words here")).toDF("doc_id", "text")

    val out = TextQueries.tBpeOf(docs, numMerges = 5, maxTrainVocab = 100)
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap

    // independent recompute: same tokenization, train on full vocab,
    // encode each word directly
    val words = docs.as[(Long, String)].collect().toSeq
      .flatMap { case (id, t) => t.toLowerCase.trim.split("\\s+").map(id -> _) }
    val wc = words.groupBy(_._2).map { case (w, g) => w -> g.size.toLong }.toSeq
    val ranks = Bpe.train(wc.sortBy { case (w, c) => (-c, w) }, 5)
      .zipWithIndex.map { case (p, i) => p -> i }.toMap
    val expected = words.groupBy(_._1).map { case (id, g) =>
      id -> ((g.size.toLong, g.map(w => Bpe.encode(w._2, ranks).length.toLong).sum))
    }
    assert(out === expected)
  }

  test("tBpe is deterministic across runs") {
    import spark.implicits._
    val docs = Seq((1L, "aa ab aa ba bb aa"), (2L, "ab ba aa")).toDF("doc_id", "text")
    val a = TextQueries.tBpeOf(docs, 10, 100).collect().map(_.toSeq).toSet
    val b = TextQueries.tBpeOf(docs, 10, 100).collect().map(_.toSeq).toSet
    assert(a === b)
  }

  test("oracle render guard: a non-BMP word (emoji) withholds the SQL " +
      "replay instead of rendering a code-point/UTF-16 divergent oracle") {
    import spark.implicits._
    // Bpe.symbols splits on UTF-16 chars (an emoji = two surrogate
    // halves) while the SQL replay's substr/length split on code
    // points — counts would diverge and merges would embed lone
    // surrogates into the rendered literals
    val docs = Seq((1L, "plain words here"), (2L, "a😀b twice a😀b"))
      .toDF("doc_id", "text")
    assert(TextQueries.tBpeOf(docs, 5, 100).count() == 2L,
      "the query itself must still run on a non-BMP corpus")
    assert(TextQueries.lastBpeMerges.isEmpty,
      "non-BMP vocabulary must withhold the rendered oracle")
    // and a clean corpus renders again
    val clean = Seq((1L, "low low lower newest")).toDF("doc_id", "text")
    TextQueries.tBpeOf(clean, 5, 100).count()
    assert(TextQueries.lastBpeMerges.nonEmpty,
      "a safe vocabulary must render the oracle")
  }
}
