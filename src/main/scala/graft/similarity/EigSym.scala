package graft.similarity

/** Cyclic Jacobi eigendecomposition for small SYMMETRIC matrices — the
  * driver-side step of the prefix-rotation trainer ([[Cosine
  * .moment2Rotation]]): the distributed pass reduces the corpus to one
  * dim×dim second-moment matrix, and dim is an embedding width — capped
  * at [[Cosine.MaxRotationDim]] (1024), where each O(dim³) sweep is
  * ~1 s — so a dense solver on the driver is the right tool:
  * no linear-algebra dependency, fully deterministic (fixed cyclic pivot
  * order, pure sequential IEEE arithmetic), reproducible anywhere.
  * Standard algorithm: Golub & Van Loan, "Matrix Computations" §8.5
  * (cyclic-by-row Jacobi with the stable one-sided rotation formulas). */
object EigSym {

  /** Eigenvalues (ascending is NOT guaranteed — pair order is whatever
    * the sweeps converge to) and matching eigenvectors as COLUMNS of the
    * returned matrix: `value(j)` belongs to column `(i => vectors(i)(j))`.
    * Input must be symmetric; it is not modified. */
  def eigSym(m: Array[Array[Double]],
             maxSweeps: Int = 64, tol: Double = 1e-12): (Array[Double], Array[Array[Double]]) = {
    val n = m.length
    require(m.forall(_.length == n), "matrix must be square")
    val a = m.map(_.clone())
    val v = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    def off(): Double = {
      var s = 0.0
      var i = 0
      while (i < n) { var j = i + 1; while (j < n) { s += a(i)(j) * a(i)(j); j += 1 }; i += 1 }
      s
    }
    // RELATIVE convergence floor: `tol` scales by the input's squared
    // Frobenius norm, so a matrix of large-magnitude entries (an
    // unnormalized moment sum, a covariance in big units) converges in
    // the usual ~8-12 sweeps instead of burning every sweep against an
    // absolute floor its rounding noise can never reach. A zero matrix
    // (normF2 = 0) exits immediately.
    val normF2 = {
      var s = 0.0; var i = 0
      while (i < n) { var j = 0; while (j < n) { s += m(i)(j) * m(i)(j); j += 1 }; i += 1 }
      s
    }
    val floor = tol * normF2
    var sweep = 0
    while (sweep < maxSweeps && off() > floor) {
      var p = 0
      while (p < n - 1) {
        var q = p + 1
        while (q < n) {
          val apq = a(p)(q)
          if (math.abs(apq) > 1e-300) {
            // stable rotation: t = sign(θ)/(|θ| + sqrt(θ² + 1))
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * apq)
            val t =
              if (theta >= 0) 1.0 / (theta + math.sqrt(theta * theta + 1.0))
              else 1.0 / (theta - math.sqrt(theta * theta + 1.0))
            val c = 1.0 / math.sqrt(t * t + 1.0)
            val s = t * c
            val tau = s / (1.0 + c)
            val app = a(p)(p); val aqq = a(q)(q)
            a(p)(p) = app - t * apq
            a(q)(q) = aqq + t * apq
            a(p)(q) = 0.0; a(q)(p) = 0.0
            var i = 0
            while (i < n) {
              if (i != p && i != q) {
                val aip = a(i)(p); val aiq = a(i)(q)
                a(i)(p) = aip - s * (aiq + tau * aip); a(p)(i) = a(i)(p)
                a(i)(q) = aiq + s * (aip - tau * aiq); a(q)(i) = a(i)(q)
              }
              val vip = v(i)(p); val viq = v(i)(q)
              v(i)(p) = vip - s * (viq + tau * vip)
              v(i)(q) = viq + s * (vip - tau * viq)
              i += 1
            }
          }
          q += 1
        }
        p += 1
      }
      sweep += 1
    }
    // LOUD non-convergence: exhausting the sweep budget with off() still
    // above the floor means the diagonal is NOT eigenvalues —
    // leadingColumns would order columns by unconverged values and
    // moment2Rotation would pin a silently-degraded rotation into a
    // stored artifact (still orthogonal, sims exact, but prefix recall
    // quietly suffers). Cyclic Jacobi converges quadratically (~8-12
    // sweeps at these sizes), so hitting 64 sweeps means a broken input
    // (non-finite entries — NaN also fails this check, since NaN <= floor
    // is false) rather than a hard matrix.
    require(off() <= floor,
      s"Jacobi failed to converge after $sweep of $maxSweeps sweeps " +
        s"(off-diagonal norm² ${off()} > floor $floor) — the diagonal is " +
        "not eigenvalues; a sweep count of 0 means non-finite input " +
        "(NaN fails the loop guard immediately), otherwise raise " +
        "maxSweeps")
    (Array.tabulate(n)(i => a(i)(i)), v)
  }

  /** The `take` leading eigenvector COLUMNS of the symmetric matrix,
    * ordered by eigenvalue DESCENDING with an index tiebreak — the
    * rotation that concentrates the matrix's energy into the leading
    * output coordinates. Each returned row is one length-n column. */
  def leadingColumns(m: Array[Array[Double]], take: Int): Seq[Seq[Double]] = {
    val (values, vectors) = eigSym(m)
    val n = m.length
    values.zipWithIndex.sortBy { case (w, j) => (-w, j) }.take(take)
      .map { case (_, j) => (0 until n).map(i => vectors(i)(j)) }.toSeq
  }
}
