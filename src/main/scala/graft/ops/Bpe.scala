package graft.ops

import scala.collection.mutable

/** Byte-pair-encoding tokenizer (Sennrich et al. 2016, the GPT-2
  * tokenizer family's training/encoding algebra) over word counts.
  *
  * The scale split mirrors how production tokenizer trainers work:
  * training never sees the corpus, only the (word, count) vocabulary
  * — a vocabulary-bounded aggregate any engine can produce from 100
  * TB — and encoding is a pure per-word function of the learned merge
  * ranks, so the distributed side encodes each DISTINCT word once and
  * joins the (broadcast, vocabulary-sized) result back to the corpus.
  * Nothing here touches Spark; `TextQueries.tBpe` owns the plumbing.
  */
object Bpe {

  /** End-of-word marker, kept distinct from any single character. */
  val EndMark = "</w>"

  /** A word's initial symbol sequence: its characters + the marker. */
  def symbols(word: String): Array[String] =
    (word.map(_.toString) :+ EndMark).toArray

  private def mergePair(syms: Array[String], a: String, b: String): Array[String] = {
    val out = new mutable.ArrayBuffer[String](syms.length)
    var j = 0
    while (j < syms.length) {
      if (j < syms.length - 1 && syms(j) == a && syms(j + 1) == b) {
        out += a + b; j += 2
      } else { out += syms(j); j += 1 }
    }
    out.toArray
  }

  /** Learn up to `numMerges` merges from weighted word counts.
    * Deterministic: the most frequent adjacent pair wins each round,
    * ties broken lexicographically on the pair itself. */
  def train(wordCounts: Seq[(String, Long)], numMerges: Int): Seq[(String, String)] = {
    var words = wordCounts.map { case (w, c) => (symbols(w), c) }.toArray
    val merges = mutable.ArrayBuffer.empty[(String, String)]
    var exhausted = false
    while (merges.length < numMerges && !exhausted) {
      val counts = mutable.HashMap.empty[(String, String), Long]
      words.foreach { case (syms, c) =>
        var j = 0
        while (j < syms.length - 1) {
          val p = (syms(j), syms(j + 1))
          counts(p) = counts.getOrElse(p, 0L) + c
          j += 1
        }
      }
      if (counts.isEmpty) exhausted = true
      else {
        val (a, b) = counts.toSeq.minBy { case ((x, y), c) => (-c, x, y) }._1
        merges += ((a, b))
        words = words.map { case (syms, c) => (mergePair(syms, a, b), c) }
      }
    }
    merges.toSeq
  }

  /** Encode one word by repeatedly merging its lowest-ranked present
    * pair — equivalent to applying the merge list in training order,
    * which is the canonical BPE apply. */
  def encode(word: String, ranks: Map[(String, String), Int]): Seq[String] = {
    var syms = symbols(word)
    var done = syms.length < 2
    while (!done) {
      var bestRank = Int.MaxValue
      var bestIdx = -1
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.getOrElse((syms(j), syms(j + 1)), Int.MaxValue)
        if (r < bestRank) { bestRank = r; bestIdx = j }
        j += 1
      }
      if (bestIdx < 0) done = true
      else {
        syms = mergePair(syms, syms(bestIdx), syms(bestIdx + 1))
        done = syms.length < 2
      }
    }
    syms.toSeq
  }
}
