package graft.ops

/** Full-batch logistic regression on a BOUNDED training sample —
  * pure driver-side math (no Spark), mirroring how `Bpe` owns merge
  * learning and `VectorQueries.pqTrain` owns codebook training: the
  * distributed side's job is producing the bounded sample and
  * scoring with the learned weights, never iterating over the
  * corpus.
  *
  * Features are standardized internally for GD conditioning and the
  * scaling is folded back into the returned weights, so callers
  * score RAW feature vectors with a plain dot product + bias.
  */
object LogReg {

  /** Train on (features, label∈{0,1}) rows; returns dims+1 weights,
    * bias last, in RAW (unstandardized) feature space.
    * Deterministic: fixed zero init, fixed iteration count. */
  def train(data: Seq[(Array[Double], Double)], iters: Int,
      lr: Double): Array[Double] = {
    require(data.nonEmpty, "empty training sample")
    val dims = data.head._1.length
    val n = data.length.toDouble
    val mu = Array.tabulate(dims)(j => data.map(_._1(j)).sum / n)
    val sd = Array.tabulate(dims) { j =>
      val v = data.map(d => { val c = d._1(j) - mu(j); c * c }).sum / n
      math.max(math.sqrt(v), 1e-12)
    }
    val xs = data.map { case (x, y) =>
      (Array.tabulate(dims)(j => (x(j) - mu(j)) / sd(j)), y)
    }
    val w = Array.fill(dims + 1)(0.0) // standardized space, bias last
    for (_ <- 0 until iters) {
      val grad = Array.fill(dims + 1)(0.0)
      xs.foreach { case (x, y) =>
        var z = w(dims); var j = 0
        while (j < dims) { z += w(j) * x(j); j += 1 }
        val e = 1.0 / (1.0 + math.exp(-z)) - y
        j = 0
        while (j < dims) { grad(j) += e * x(j); j += 1 }
        grad(dims) += e
      }
      var j = 0
      while (j <= dims) { w(j) -= lr * grad(j) / n; j += 1 }
    }
    // fold standardization into raw-space weights:
    // w·(x-mu)/sd + b  ==  (w/sd)·x + (b - Σ w_j mu_j / sd_j)
    val raw = Array.tabulate(dims)(j => w(j) / sd(j))
    raw :+ (w(dims) - (0 until dims).map(j => w(j) * mu(j) / sd(j)).sum)
  }
}
