package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Product-quantization codebooks (Jégou et al., "Product Quantization
  * for Nearest Neighbor Search", TPAMI 2011): the vector space is split
  * into `m` contiguous subspaces of `ds` dims each; every subspace has
  * its own small k-means codebook, and a vector is stored as `m` code
  * ids — the standard 100 TB embedding-memory answer (8 byte-sized
  * codes replace 64 floats; 32× smaller candidate rows).
  *
  * Like [[CentroidModel]], the codebooks are MODEL STATE attached to
  * expressions as codegen reference objects: byte-identical generated
  * source across training passes (one Janino compile), plan size
  * independent of m·k·ds.
  *
  * Empty cells: a Lloyd pass only re-emits codewords that kept members
  * (the DuckDB oracle's GROUP BY does the same), so per-subspace entry
  * lists can shrink below k — `cids(m)` carries the surviving code ids
  * in ascending order and every lookup matches on the stored id, not
  * the array position.
  *
  * Arithmetic parity with the oracle: subspace L2 distances and dot
  * products accumulate in ascending dim order (DuckDB's `list_sum` over
  * `list_transform(range(...))`), distance ties break toward the
  * smaller code id (`ORDER BY d2, cid`), and the ADC score quantizes
  * each subspace's partial dot to integer micro-units BEFORE summing —
  * integer addition commutes, so the cross-subspace sum cannot drift
  * with aggregation order.
  */
final class PqModel(val ds: Int, val cids: Array[Array[Int]],
    val cws: Array[Array[Array[Double]]]) extends Serializable {

  val m: Int = cids.length

  /** PQ codes for unit vector `u` (length m·ds): per subspace, the id
    * of the L2-nearest codeword (tie → smaller id). O(m·k·ds). */
  def encode(u: ArrayData): ArrayData = {
    val out = new Array[Int](m)
    var mm = 0
    while (mm < m) {
      val base = mm * ds
      val k = cids(mm).length
      var best = -1
      var bestD = 0.0
      var c = 0
      while (c < k) {
        val cw = cws(mm)(c)
        var d2 = 0.0
        var i = 0
        while (i < ds) {
          val diff = u.getDouble(base + i) - cw(i)
          d2 += diff * diff
          i += 1
        }
        // strict < keeps the FIRST minimum; cids ascend, so ties break
        // toward the smaller code id — the oracle's ORDER BY d2, cid
        if (best < 0 || d2 < bestD) { best = c; bestD = d2 }
        c += 1
      }
      out(mm) = cids(mm)(best)
      mm += 1
    }
    new GenericArrayData(out)
  }

  /** Asymmetric-distance score of query vector `qu` against a stored
    * code array: Σ_m floor(⟨qu_m, codeword(codes[m])⟩ · 1e6). The
    * candidate side never touches floats — only its m code ids. With a
    * per-query (m × k) lookup table this is O(m) per candidate; at
    * k ≤ 16 the direct form below is the same arithmetic and already
    * memory-bound, so the LUT is left as the kernel-level optimization
    * of a multi-node deployment. */
  def adcScore(qu: ArrayData, codes: ArrayData): Long = {
    var acc = 0L
    var mm = 0
    while (mm < m) {
      val code = codes.getInt(mm)
      val cs = cids(mm)
      var c = 0
      while (c < cs.length && cs(c) != code) c += 1
      require(c < cs.length, s"unknown PQ code $code in subspace $mm")
      val cw = cws(mm)(c)
      val base = mm * ds
      var s = 0.0
      var i = 0
      while (i < ds) { s += qu.getDouble(base + i) * cw(i); i += 1 }
      acc += math.floor(s * 1000000).toLong
      mm += 1
    }
    acc
  }
}

object PqModel {
  /** Initial codebooks from `k` seed vectors (each length m·ds): code
    * id = seed rank (1-based), codeword = the seed's m-th subvector —
    * the standard "init from training points" PQ seeding. */
  def fromSeeds(m: Int, ds: Int, seeds: Array[Array[Double]]): PqModel =
    new PqModel(ds,
      Array.fill(m)(Array.tabulate(seeds.length)(_ + 1)),
      Array.tabulate(m)(mm =>
        seeds.map(s => java.util.Arrays.copyOfRange(s, mm * ds, (mm + 1) * ds))))
}

/** `pq_encode(u)` under a codebook reference object — a narrow
  * whole-stage-codegen map, no shuffle. */
case class PqEncode(child: Expression, model: PqModel)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
      case t => TypeCheckResult.TypeCheckFailure(
        s"pq_encode expects array<double>, got ${t.sql}")
    }

  override def nullSafeEval(u: Any): Any =
    model.encode(u.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, u => s"${ev.value} = $ref.encode($u);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object PqEncode {
  def apply(u: Column, model: PqModel): Column =
    Bridge.column(PqEncode(Bridge.expression(u), model))
}

/** `pq_adc_score(qu, codes)` under a codebook reference object. */
case class PqAdcScore(left: Expression, right: Expression, model: PqModel)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(DoubleType, _), ArrayType(IntegerType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"pq_adc_score expects (array<double>, array<int>), got ${l.sql}, ${r.sql}")
    }

  override def nullSafeEval(qu: Any, codes: Any): Any =
    model.adcScore(qu.asInstanceOf[ArrayData], codes.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqModel", model, classOf[PqModel].getName)
    nullSafeCodeGen(ctx, ev, (qu, codes) =>
      s"${ev.value} = $ref.adcScore($qu, $codes);")
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object PqAdcScore {
  def apply(qu: Column, codes: Column, model: PqModel): Column =
    Bridge.column(PqAdcScore(
      Bridge.expression(qu), Bridge.expression(codes), model))
}
