package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a native
  * Catalyst [[TypedImperativeAggregate]] — the scale-path cardinality
  * operator for the pipeline surface (Spark's own `approx_count_distinct`
  * uses a relative-error knob and a non-portable xxhash, so its output
  * can never be oracle-checked; this one is bit-deterministic across
  * engines).
  *
  * Scale shape: the aggregation buffer is a FIXED 64-byte register array
  * per group regardless of input cardinality. Partial aggregation
  * (map-side combine) reduces each input partition to one 64-byte state
  * per group before the shuffle, and `merge` is an elementwise max — at
  * 100 TB the shuffle carries |groups|·64 bytes, not |rows|. That is the
  * whole point vs `count(distinct)`, whose expand+shuffle carries every
  * distinct value.
  *
  * Portability contract (what makes the estimate oracle-checkable):
  *   h   = [[PortableHash]] h60 of the value's UTF-8 string form (60 bits)
  *   j   = h % 64                      (register index, 6 bits)
  *   w   = h / 64                      (remaining 54 bits)
  *   rho = w == 0 ? 55 : 55 - bitlen(w)   (leading-zero rank in 54 bits,
  *                                         bitlen(w) = length(bin(w)))
  *   M_j = max rho over values landing in register j; 0 when unhit.
  * The estimator is computed downstream from two integers derived from
  * the registers (see [[Hll.estMicroExpr]]):
  *   z_scaled = sum_j 2^(55 - M_j)    — an EXACT int64 (≤ 64·2^55 = 2^61),
  *              avoiding the float-sum-order trap of the textbook
  *              sum(2^-M_j) form entirely;
  *   v_empty  = |{j : M_j = 0}|.
  * raw = alpha_64·m²·2^55 / z_scaled; below the 2.5m threshold with empty
  * registers it switches to linear counting m·ln(m/V), where the 64
  * possible ln values are a precomputed integer micro-unit table embedded
  * as literals in BOTH engines (no libm in any gated path).
  */
case class HllSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0,
    emitRegisters: Boolean = false)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import Hll.{M, MaxRho}

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Prefix60.hash(v.asInstanceOf[UTF8String].getBytes)
      val j = (h % M).toInt
      val w = h >>> 6
      val rho =
        if (w == 0L) MaxRho
        else MaxRho - (64 - java.lang.Long.numberOfLeadingZeros(w))
      if (rho > buf(j)) buf(j) = rho.toByte
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) {
      if (b2(j) > b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any =
    if (emitRegisters)
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        buf.map(_.toInt))
    else Hll.summaryRow(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType =
    if (emitRegisters) ArrayType(IntegerType, containsNull = false)
    else Hll.SummaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"hll_sketch expects string (hash the canonical string form), got " +
        child.dataType.sql)

  override def withNewMutableAggBufferOffset(o: Int): HllSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllSketch =
    copy(child = c)
  override def prettyName: String =
    if (emitRegisters) "hll_registers" else "hll_sketch"
}

/** Union of PRE-COMPUTED register arrays — the sketch-algebra rollup:
  * a stored per-(fine-group) sketch table folds to any coarser grouping
  * WITHOUT touching raw data (register max is associative and
  * commutative, so a rollup of per-group sketches is BIT-IDENTICAL to
  * sketching the coarse group directly — the property the x60 gate
  * verifies). At 100 TB this is the nightly-rollup pattern: the raw
  * stream is sketched once into |fine groups|·64 B, and every further
  * cadence/granularity derives from sketch unions that never rescan. */
case class HllUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Byte]] with UnaryLike[Expression] {

  import Hll.{M, MaxRho}

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == M,
        s"hll_union expects a $M-register array, got ${arr.numElements()}")
      var j = 0
      while (j < M) {
        val r = arr.getInt(j)
        // a register outside [0, MaxRho] can only come from a corrupt or
        // foreign sketch table; silently narrowing it with r.toByte would
        // wrap to a negative register and poison z_scaled (1L << (55-r))
        require(r >= 0 && r <= MaxRho,
          s"hll_union register out of range: $r at index $j (valid 0..$MaxRho)")
        if (r > buf(j)) buf(j) = r.toByte
        j += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Byte], b2: Array[Byte]): Array[Byte] = {
    var j = 0
    while (j < M) {
      if (b2(j) > b1(j)) b1(j) = b2(j)
      j += 1
    }
    b1
  }

  override def eval(buf: Array[Byte]): Any = Hll.summaryRow(buf)

  override def serialize(buf: Array[Byte]): Array[Byte] = buf
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes

  override def dataType: DataType = Hll.SummaryType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(IntegerType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_union expects array<int> registers, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(o: Int): HllUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): HllUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): HllUnion =
    copy(child = c)
  override def prettyName: String = "hll_union"
}

object Hll {
  /** Register count. m=64 keeps the relative error at 1.04/√64 ≈ 13% —
    * demo-sized; the operator is parameter-free on purpose so the oracle
    * constants below stay literal. */
  val M = 64
  /** Max rho: 54 payload bits → rho ∈ [1, 55]; an empty register is 0. */
  val MaxRho = 55
  /** alpha_64 from Flajolet et al. (m = 64 small-m table value). */
  val Alpha = 0.709

  /** alpha·m²·2^55 as the exact double literal embedded in BOTH engines
    * (Double.toString round-trips, so the parsed constant is identical). */
  val AlphaNum: Double = Alpha * (M.toDouble * M.toDouble) * (1L << MaxRho).toDouble

  /** Linear-counting table: floor(m·ln(m/V)·1e6) for V = 1..64, computed
    * once on the JVM and embedded as integer literals in both engines —
    * the only ln() in the operator, and it never runs inside a query. */
  val LcMicro: IndexedSeq[Long] =
    (1 to M).map(v => math.floor(M * math.log(M.toDouble / v) * 1e6).toLong)

  /** The (z_scaled, v_empty) summary struct type and its builder,
    * shared by the direct sketch and the union rollup. */
  val SummaryType: DataType = StructType(Seq(
    StructField("z_scaled", LongType, nullable = false),
    StructField("v_empty", IntegerType, nullable = false)))

  private[functions] def summaryRow(buf: Array[Byte]): Any = {
    var z = 0L
    var v = 0
    var j = 0
    while (j < M) {
      z += 1L << (MaxRho - buf(j))
      if (buf(j) == 0) v += 1
      j += 1
    }
    new GenericInternalRow(Array[Any](z, v))
  }

  /** The sketch as an aggregate Column over a STRING child. */
  def sketch(c: Column): Column =
    Bridge.column(HllSketch(Bridge.expression(c)).toAggregateExpression())

  /** The raw 64-register array as an aggregate Column — the storable
    * sketch-table form consumed by [[union]]. */
  def registers(c: Column): Column =
    Bridge.column(HllSketch(Bridge.expression(c), emitRegisters = true)
      .toAggregateExpression())

  /** Union of stored register arrays, as (z_scaled, v_empty). */
  def union(c: Column): Column =
    Bridge.column(HllUnion(Bridge.expression(c)).toAggregateExpression())

  /** Estimate in micro-units from (z_scaled, v_empty) — IDENTICAL float
    * operation tree on Spark (expr) and DuckDB (oracle SQL): raw HLL
    * estimate, switching to the linear-counting table under the standard
    * 2.5m threshold when empty registers exist. `lcAt` renders the
    * 1-based table lookup in the engine's dialect. */
  private def estMicro(z: String, v: String, lcAt: String => String): String = {
    val raw = s"($AlphaNum / CAST($z AS DOUBLE))"
    s"""CASE WHEN $raw <= ${2.5 * M} AND $v > 0
       |     THEN ${lcAt(v)}
       |     ELSE CAST(floor($raw * 1000000.0) AS BIGINT) END""".stripMargin
  }

  private val lcList = LcMicro.mkString(", ")

  /** Spark dialect: element_at(array(...), v) is 1-based like DuckDB. */
  def estMicroSpark(z: String, v: String): String =
    estMicro(z, v, i => s"element_at(array($lcList), $i)")

  /** DuckDB dialect: plain 1-based list-literal indexing. */
  def estMicroDuck(z: String, v: String): String =
    estMicro(z, v, i => s"[$lcList][$i]")
}
