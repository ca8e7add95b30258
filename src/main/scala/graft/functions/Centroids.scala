package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Immutable centroid codebook for IVF/k-means assignment: K ids with
  * their vectors and precomputed L2 norms.
  *
  * Why this exists instead of embedding the centroids as plan literals
  * (the previous formulation, `greatest()` over K structs of 64 `lit`
  * doubles each): primitive literals are inlined into the generated
  * Java source, so every Lloyd pass — whose centroids differ — produced
  * a brand-new source that Janino had to compile again, and the plan
  * tree itself grew O(K·dim) nodes. The codebook is instead attached to
  * one expression as a codegen REFERENCE OBJECT: the generated source is
  * byte-identical across passes/runs (one compile, cached forever) and
  * its size is independent of K. Assignment stays a narrow per-row map
  * over a driver-held model — the MLlib k-means shape — with no shuffle,
  * no window, and no join in the training loop.
  *
  * Arithmetic parity with the DuckDB oracle (and the previous literal
  * formulation): dot products accumulate in ascending index order,
  * norms are sqrt of the ascending sum of squares, and ties on cosine
  * break toward the smaller centroid id.
  */
final class CentroidModel(
    val cids: Array[Long], val cvs: Array[Array[Double]]) extends Serializable {

  val cnrms: Array[Double] = cvs.map(cv => math.sqrt(cv.map(x => x * x).sum))

  /** Top-n centroid ids for vector `v` (with norm `nrm`) by
    * (cosine DESC, cid ASC) — the same order as the oracle's
    * `row_number() OVER (ORDER BY cos_c DESC, cid)`. O(K·(dim+n)). */
  def topCids(v: ArrayData, nrm: Double, n: Int): ArrayData = {
    val k = cids.length
    val cos = new Array[Double](k)
    var c = 0
    while (c < k) {
      val cv = cvs(c)
      val d = math.min(cv.length, v.numElements())
      var s = 0.0
      var i = 0
      while (i < d) { s += v.getDouble(i) * cv(i); i += 1 }
      cos(c) = s / (nrm * cnrms(c))
      c += 1
    }
    val out = new Array[Long](math.min(n, k))
    val used = new Array[Boolean](k)
    var r = 0
    while (r < out.length) {
      var best = -1
      var c2 = 0
      while (c2 < k) {
        if (!used(c2) && (best < 0 || cos(c2) > cos(best) ||
            (cos(c2) == cos(best) && cids(c2) < cids(best)))) best = c2
        c2 += 1
      }
      used(best) = true
      out(r) = cids(best)
      r += 1
    }
    new GenericArrayData(out)
  }
}

/** `topCids(vec, nrm)` as a whole-stage-codegen expression: emits a
  * single call into the codebook held in `references` — no per-pass
  * recompilation, no K-proportional plan growth. */
case class CentroidTopCids(left: Expression, right: Expression,
    model: CentroidModel, n: Int) extends BinaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = left.nullable || right.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val ok = left.dataType == ArrayType(DoubleType, containsNull = false) ||
      left.dataType == ArrayType(DoubleType, containsNull = true)
    if (ok && right.dataType == DoubleType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"centroid_top_cids expects (array<double>, double), got " +
          s"${left.dataType.sql}, ${right.dataType.sql}")
  }

  override def nullSafeEval(v: Any, nrm: Any): Any =
    model.topCids(v.asInstanceOf[ArrayData], nrm.asInstanceOf[Double], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidModel", model,
      classOf[CentroidModel].getName)
    nullSafeCodeGen(ctx, ev, (v, nr) =>
      s"${ev.value} = $ref.topCids($v, $nr, $n);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CentroidTopCids {
  def apply(v: Column, nrm: Column, model: CentroidModel, n: Int): Column =
    Bridge.column(CentroidTopCids(
      Bridge.expression(v), Bridge.expression(nrm), model, n))
}
