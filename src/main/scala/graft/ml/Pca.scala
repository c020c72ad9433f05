package graft.ml

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Gram-sketch buffer: count, per-dimension sums, and the flattened
  * d×d sum of outer products. Size is a function of DIMENSION only
  * (1 + d + d² doubles — ~33 KB at d = 64), never of corpus size.
  */
final case class GramBuf(var n: Long, var s: Array[Double], var g: Array[Double])

/** Mergeable Gram/covariance sketch over embedding vectors — the
  * distributed half of PCA (SURVEY.md §2b q_embed_pca): ONE map-side-
  * combined aggregation reduces the corpus to a d²-sized sketch; the
  * eigen step then runs driver-side on the 64×64 matrix (the bounded-
  * collect pattern of KMeansLite's ≤4096 centroids). This split is the
  * standard tall-skinny PCA: corpus-scale work is embarrassingly
  * parallel outer products, nothing quadratic in rows anywhere.
  */
object Gram extends Aggregator[Seq[Float], GramBuf, Array[Double]] {

  val Dim = 64

  override def zero: GramBuf =
    GramBuf(0L, new Array[Double](Dim), new Array[Double](Dim * Dim))

  override def reduce(b: GramBuf, v: Seq[Float]): GramBuf = {
    val x = v.toArray
    // Fail fast with a clear message: a shorter vector would otherwise
    // throw ArrayIndexOutOfBounds deep in an executor and a longer one
    // would be SILENTLY truncated to its first Dim dimensions — a wrong
    // PCA with no error.
    require(x.length == Dim,
      s"Gram sketch expects $Dim-dimensional embeddings, got ${x.length}")
    b.n += 1
    var i = 0
    while (i < Dim) {
      val xi = x(i).toDouble
      b.s(i) += xi
      var j = 0
      val row = i * Dim
      while (j < Dim) { b.g(row + j) += xi * x(j); j += 1 }
      i += 1
    }
    b
  }

  override def merge(a: GramBuf, b: GramBuf): GramBuf = {
    a.n += b.n
    var i = 0
    while (i < Dim) { a.s(i) += b.s(i); i += 1 }
    i = 0
    while (i < Dim * Dim) { a.g(i) += b.g(i); i += 1 }
    a
  }

  /** Packed [n, s(0..d), g(0..d²)]. */
  override def finish(b: GramBuf): Array[Double] = {
    val out = new Array[Double](1 + Dim + Dim * Dim)
    out(0) = b.n.toDouble
    System.arraycopy(b.s, 0, out, 1, Dim)
    System.arraycopy(b.g, 0, out, 1 + Dim, Dim * Dim)
    out
  }

  override def bufferEncoder: Encoder[GramBuf] = Encoders.product[GramBuf]
  override def outputEncoder: Encoder[Array[Double]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Double]]()
}

/** Driver-side eigen step on the bounded Gram sketch. */
object Pca {

  /** (eigenvalue, eigenvector, explained-variance share, n) of the top
    * principal component of the covariance implied by a Gram sketch:
    * C = G/n − μμᵀ. Power iteration from the fixed all-ones start
    * (deterministic — no RNG anywhere), sign-canonicalized so the
    * largest-magnitude component is positive.
    */
  def topComponent(sk: Array[Double], iters: Int = 500): (Double, Array[Double], Double, Long) = {
    val d = Gram.Dim
    val n = sk(0)
    val mu = Array.tabulate(d)(i => sk(1 + i) / n)
    val c = Array.tabulate(d, d)((i, j) => sk(1 + d + i * d + j) / n - mu(i) * mu(j))
    var v = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    var it = 0
    while (it < iters) {
      val w = Array.tabulate(d)(i => {
        var acc = 0.0; var j = 0
        while (j < d) { acc += c(i)(j) * v(j); j += 1 }
        acc
      })
      val nrm = math.sqrt(w.map(x => x * x).sum)
      v = w.map(_ / nrm)
      it += 1
    }
    val cv = Array.tabulate(d)(i => {
      var acc = 0.0; var j = 0
      while (j < d) { acc += c(i)(j) * v(j); j += 1 }
      acc
    })
    val lambda = v.indices.map(i => v(i) * cv(i)).sum
    val trace = (0 until d).map(i => c(i)(i)).sum
    val flip = if (v(v.indices.maxBy(i => math.abs(v(i)))) < 0) -1.0 else 1.0
    (lambda, v.map(_ * flip), lambda / trace, n.toLong)
  }

  /** Residual ‖Cv − λv‖₂ / λ — the convergence certificate KllSpec-style
    * specs assert instead of exact eigen values.
    */
  def residual(sk: Array[Double], lambda: Double, v: Array[Double]): Double = {
    val d = Gram.Dim
    val n = sk(0)
    val mu = Array.tabulate(d)(i => sk(1 + i) / n)
    val c = Array.tabulate(d, d)((i, j) => sk(1 + d + i * d + j) / n - mu(i) * mu(j))
    val r = Array.tabulate(d)(i => {
      var acc = 0.0; var j = 0
      while (j < d) { acc += c(i)(j) * v(j); j += 1 }
      acc - lambda * v(i)
    })
    math.sqrt(r.map(x => x * x).sum) / lambda
  }
}
