package graft.ml

/** Principal component analysis via cyclic Jacobi eigendecomposition
  * (Golub & Van Loan, *Matrix Computations*, §8.5 — the classical
  * symmetric-eigen algorithm; Jacobi 1846): deterministic fixed-order
  * (p, q) sweeps, convergence when the off-diagonal Frobenius norm drops
  * below 1e-14 of the matrix norm.
  *
  * Spark-first shape: PCA over d columns needs only the d×d moment block —
  * the SAME exact-decimal sufficient statistics `agg_cov_matrix` computes
  * in one distributed pass — so the eigen step is driver arithmetic on a
  * d² frame (16 doubles here), the CAIM bounded executor→driver contract.
  * At 100 TB nothing changes: d is the schema width, not the corpus.
  *
  * Determinism: the input matrix is built from exact integer sums (same
  * doubles every run), the sweep order is fixed, rotations are pure
  * IEEE arithmetic, eigen pairs sort by (eigenvalue DESC, original column
  * index ASC), and each eigenvector's sign is canonicalized so its
  * largest-|component| entry (first index on ties) is positive — the
  * standard sign convention, making loadings stable run-to-run.
  */
object Pca {

  /** Eigendecomposition of symmetric `a` (not mutated).
    * @return (eigenvalues, eigenvectors as ROWS, i.e. result._2(k) is the
    *         k-th eigenvector), sorted by eigenvalue descending, signs
    *         canonicalized. */
  def eigenSym(a: Array[Array[Double]]): (Array[Double], Array[Array[Double]]) = {
    val n = a.length
    val m = Array.tabulate(n, n)((i, j) => a(i)(j))
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      for (i <- 0 until n; j <- 0 until n if i != j) s += m(i)(j) * m(i)(j)
      math.sqrt(s)
    }
    val norm = math.max(1e-300, math.sqrt(
      (for (i <- 0 until n; j <- 0 until n) yield m(i)(j) * m(i)(j)).sum))
    var sweep = 0
    while (off() > 1e-14 * norm && sweep < 100) {
      for (p <- 0 until n - 1; q <- p + 1 until n if m(p)(q) != 0.0) {
        // classical Jacobi rotation zeroing m(p)(q)
        val theta = (m(q)(q) - m(p)(p)) / (2.0 * m(p)(q))
        val t = math.signum(theta) /
          (math.abs(theta) + math.sqrt(theta * theta + 1.0)) match {
            case 0.0 => 1.0 // theta == 0 → 45° rotation, tan = 1
            case x => x
          }
        val c = 1.0 / math.sqrt(t * t + 1.0)
        val s = t * c
        for (k <- 0 until n) {
          val (mkp, mkq) = (m(k)(p), m(k)(q))
          m(k)(p) = c * mkp - s * mkq
          m(k)(q) = s * mkp + c * mkq
        }
        for (k <- 0 until n) {
          val (mpk, mqk) = (m(p)(k), m(q)(k))
          m(p)(k) = c * mpk - s * mqk
          m(q)(k) = s * mpk + c * mqk
        }
        for (k <- 0 until n) {
          val (vkp, vkq) = (v(k)(p), v(k)(q))
          v(k)(p) = c * vkp - s * vkq
          v(k)(q) = s * vkp + c * vkq
        }
      }
      sweep += 1
    }
    // sort by (eigenvalue desc, column idx asc), canonicalize signs
    val order = (0 until n).sortBy(k => (-m(k)(k), k))
    val vals = order.map(k => m(k)(k)).toArray
    val vecs = order.map { k =>
      val col = Array.tabulate(n)(i => v(i)(k))
      val pivot = col.indices.maxBy(i => (math.abs(col(i)), -i))
      if (col(pivot) < 0) col.map(-_) else col
    }.toArray
    (vals, vecs)
  }
}
