package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** PCA over the embedding corpus, built on the distributed second-moment
  * machinery ([[Similarity.gramMatrix]]'s fold): one pass computes
  * (count, mean, Gram) with per-partition accumulators, the d×d
  * covariance is eigendecomposed ON THE DRIVER (Jacobi rotations — the
  * model is d²-bounded and corpus-size-independent, exactly the k-means
  * centroid shape MLlib uses), and the top-k basis is broadcast back
  * into a narrow projection expression. No SQL oracle exists for an
  * eigendecomposition, so this is a library operator pinned by its
  * algebraic invariants in PcaSpec (orthonormal basis, eigen residual,
  * variance capture, projection reconstruction) rather than a driver
  * CORRECTNESS row.
  */
object Pca {

  /** Eigenvectors (rows) and eigenvalues of the covariance, descending,
    * ties broken by original index for determinism. */
  final case class PcaModel(mean: Array[Double], eigenvalues: Array[Double],
      basis: Array[Array[Double]])

  /** One distributed pass: per-partition (n, Σv, Σv·vᵀ) folds, reduced
    * on the driver into the model. The reduce moves partitions·(d²+d)
    * doubles — the same scale posture as gramMatrix, independent of
    * corpus size. */
  def fit(embs: DataFrame, dim: Int): PcaModel = {
    val s = embs.sparkSession
    import s.implicits._
    val (n, sums, gram) = embs
      .select(col("embedding").cast("array<float>")).as[Array[Float]]
      .mapPartitions { it =>
        var n = 0L
        val sum = new Array[Double](dim)
        val g = new Array[Double](dim * dim)
        while (it.hasNext) {
          Similarity.accumulateMoments(it.next(), dim, sum, g)
          n += 1
        }
        Iterator.single((n, sum, g))
      }
      .reduce { (a, b) =>
        val (na, sa, ga) = a; val (nb, sb, gb) = b
        var i = 0
        while (i < dim) { sa(i) += sb(i); i += 1 }
        i = 0
        while (i < dim * dim) { ga(i) += gb(i); i += 1 }
        (na + nb, sa, ga)
      }
    require(n > 0, "pca.fit on an empty corpus")
    val mean = sums.map(_ / n)
    // covariance C = G/n - mean meanᵀ (symmetrize from the upper fold)
    val c = Array.ofDim[Double](dim, dim)
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        val v = gram(i * dim + j) / n - mean(i) * mean(j)
        c(i)(j) = v; c(j)(i) = v
        j += 1
      }
      i += 1
    }
    val (values, vectors) = jacobiEigen(c)
    // descending eigenvalue, index tie-break; flip each vector to a
    // canonical sign (first nonzero component positive) so the basis is
    // deterministic — eigenvectors are only defined up to sign
    val order = values.zipWithIndex.sortBy { case (v, ix) => (-v, ix) }
    val eigenvalues = order.map(_._1)
    val basis = order.map { case (_, ix) =>
      val v = vectors.map(_(ix))
      val firstNz = v.find(math.abs(_) > 1e-12).getOrElse(1.0)
      if (firstNz < 0) v.map(-_) else v
    }
    PcaModel(mean, eigenvalues, basis)
  }

  /** Cyclic Jacobi for a symmetric matrix: rotate away the largest
    * off-diagonal entries until convergence. O(d³) per sweep on a
    * d×d DRIVER-SIDE matrix — never distributed, never data-sized. */
  private[graft] def jacobiEigen(a0: Array[Array[Double]],
      maxSweeps: Int = 64): (Array[Double], Array[Array[Double]]) = {
    val d = a0.length
    val a = a0.map(_.clone())
    val v = Array.tabulate(d, d)((i, j) => if (i == j) 1.0 else 0.0)
    var sweep = 0
    // converge the off-diagonal mass to machine precision RELATIVE to
    // the matrix scale: Jacobi is quadratically convergent, so the last
    // sweeps are nearly free and the eigen residual ends ~sqrt(eps)·‖A‖
    // tighter than a fixed absolute cutoff would leave it
    val scale = math.max(1e-300, offDiag(a) +
      (0 until d).map(i => a(i)(i) * a(i)(i)).sum)
    var off = offDiag(a)
    while (off > 1e-26 * scale && sweep < maxSweeps) {
      var p = 0
      while (p < d - 1) {
        var q = p + 1
        while (q < d) {
          if (math.abs(a(p)(q)) > 1e-15) {
            val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
            val t = if (theta == 0.0) 1.0
              else math.signum(theta) /
                (math.abs(theta) + math.sqrt(theta * theta + 1.0))
            val cth = 1.0 / math.sqrt(t * t + 1.0)
            val sth = t * cth
            var k = 0
            while (k < d) {
              val akp = a(k)(p); val akq = a(k)(q)
              a(k)(p) = cth * akp - sth * akq
              a(k)(q) = sth * akp + cth * akq
              k += 1
            }
            k = 0
            while (k < d) {
              val apk = a(p)(k); val aqk = a(q)(k)
              a(p)(k) = cth * apk - sth * aqk
              a(q)(k) = sth * apk + cth * aqk
              val vkp = v(k)(p); val vkq = v(k)(q)
              v(k)(p) = cth * vkp - sth * vkq
              v(k)(q) = sth * vkp + cth * vkq
              k += 1
            }
          }
          q += 1
        }
        p += 1
      }
      off = offDiag(a)
      sweep += 1
    }
    (Array.tabulate(d)(i => a(i)(i)), v)
  }

  private def offDiag(a: Array[Array[Double]]): Double = {
    var s = 0.0
    var i = 0
    while (i < a.length) {
      var j = i + 1
      while (j < a.length) { s += a(i)(j) * a(i)(j); j += 1 }
      i += 1
    }
    s
  }

  /** Project embeddings onto the model's top-k components: mean-center,
    * then k dot products per row against the broadcast literal basis —
    * a narrow codegen'd expression, no shuffle, no UDF. */
  def project(embs: DataFrame, model: PcaModel, k: Int): DataFrame = {
    require(k >= 1 && k <= model.basis.length, s"k=$k out of range")
    val dim = model.mean.length
    val meanLit = array(model.mean.map(lit).toIndexedSeq: _*)
    // zip_with pads a shorter array with nulls — a dim mismatch would
    // silently project to [null, …]; fail loudly per row instead (the
    // assert_true stays inside the expression the projection consumes,
    // so column pruning cannot drop it). A NULL embedding is not a
    // mismatch: it passes the guard and projects to NULL, the same
    // pass-through every other narrow operator gives null input.
    val guard = assert_true(
      col("embedding").isNull || size(col("embedding")) === lit(dim),
      lit(s"embedding length != model dim $dim"))
    val centered: Column = when(guard.isNull && col("embedding").isNotNull,
      zip_with(
        col("embedding").cast("array<double>"), meanLit, (x, m) => x - m))
    val comps = (0 until k).map { c =>
      val b = array(model.basis(c).map(lit).toIndexedSeq: _*)
      aggregate(zip_with(col("_centered"), b, (x, w) => x * w),
        lit(0.0), (acc, x) => acc + x)
    }
    embs.withColumn("_centered", centered)
      .withColumn("projection", array(comps: _*))
      .drop("_centered")
  }
}
