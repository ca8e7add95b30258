package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Bottom-k sample by a deterministic hash key, as a native Catalyst
  * [[TypedImperativeAggregate]] — the merge-ORDER-INDEPENDENT quantile
  * sketch this engine gates (GK/KLL compact lazily, so their state
  * depends on arrival and merge order and can never hash-match an
  * oracle; a bottom-k set under a total order is a pure function of the
  * input multiset).
  *
  * State: the k (hk, v) pairs smallest under the total order (hk, v),
  * kept in a bounded max-heap — 16·k bytes per group regardless of
  * group size. update is O(log k) per row, merge is heap-union with
  * eviction (commutative, associative, idempotent-per-multiset), so
  * partial aggregation reduces each partition to one bounded state
  * before the exchange — the identical scale shape as [[HllSketch]].
  * With hk a uniform portable hash of a row identifier, the kept rows
  * are a uniform random sample of the group, and exact quantiles OF THE
  * SAMPLE estimate group quantiles with the standard sampling error
  * O(sqrt(log(1/δ)/k)) — the trade that buys determinism.
  *
  * eval returns the sampled VALUES ordered by (hk, v); the oracle
  * reproduces the identical list with ORDER BY hk, v LIMIT k.
  */
case class BottomKSample(
    hkey: Expression,
    value: Expression,
    k: Int,
    emitPairs: Boolean = false,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"bottom-k size must be in [1, 2^20], got $k")

  override def left: Expression = hkey
  override def right: Expression = value

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
    BottomK.newHeap(k)

  override def update(buf: java.util.PriorityQueue[Array[Long]],
      input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
    val h = hkey.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      BottomK.offer(buf, k, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.PriorityQueue[Array[Long]],
      b2: java.util.PriorityQueue[Array[Long]])
      : java.util.PriorityQueue[Array[Long]] = BottomK.mergeHeaps(b1, b2, k)

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any =
    if (emitPairs) BottomK.evalPairs(buf)
    else new GenericArrayData(BottomK.sortedPairs(buf).map(_(1)))

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] =
    BottomK.serializeHeap(buf)

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] =
    BottomK.deserializeHeap(bytes, k)

  override def dataType: DataType =
    if (emitPairs) BottomK.PairsType
    else ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (hkey.dataType == LongType && value.dataType == LongType)
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bottomk_sample expects (bigint, bigint), got " +
        s"(${hkey.dataType.sql}, ${value.dataType.sql})")

  override def withNewMutableAggBufferOffset(o: Int): BottomKSample =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKSample =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): BottomKSample = copy(hkey = l, value = r)
  override def prettyName: String =
    if (emitPairs) "bottomk_pairs" else "bottomk_sample"
}

/** Union of PRE-COMPUTED bottom-k pair arrays — the sample-sketch
  * rollup (the [[HllUnion]]/x60 pattern for the quantile sketch): a
  * stored per-(fine-group) sample table folds to any coarser grouping
  * WITHOUT touching raw data. Sound because bottom-k is a SELECTION
  * under the (hk, v) total order: every member of the coarse group's
  * bottom-k is necessarily in its fine group's bottom-k, so
  * bottomk(∪ fine bottomk) = bottomk(coarse) exactly — the x62 gate
  * verifies bit-identity against the direct computation. */
case class BottomKUnion(
    child: Expression,
    k: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]]
  with org.apache.spark.sql.catalyst.trees.UnaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"bottom-k size must be in [1, 2^20], got $k")

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
    BottomK.newHeap(k)

  override def update(buf: java.util.PriorityQueue[Array[Long]],
      input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
    val arr = child.eval(input)
    if (arr != null) {
      val a = arr.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      var i = 0
      while (i < a.numElements()) {
        val p = a.getStruct(i, 2)
        BottomK.offer(buf, k, p.getLong(0), p.getLong(1))
        i += 1
      }
    }
    buf
  }

  override def merge(b1: java.util.PriorityQueue[Array[Long]],
      b2: java.util.PriorityQueue[Array[Long]])
      : java.util.PriorityQueue[Array[Long]] = BottomK.mergeHeaps(b1, b2, k)

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any =
    BottomK.evalPairs(buf)

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] =
    BottomK.serializeHeap(buf)

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] =
    BottomK.deserializeHeap(bytes, k)

  override def dataType: DataType = BottomK.PairsType
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(st: StructType, _)
      if st.size == 2 && st.forall(_.dataType == LongType) =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bottomk_union expects array<struct<bigint,bigint>> pairs, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(o: Int): BottomKUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BottomKUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BottomKUnion =
    copy(child = c)
  override def prettyName: String = "bottomk_union"
}

object BottomK {

  /** The storable pair form shared by `bottomk_pairs` and
    * `bottomk_union`: (hk, v) ascending under the total order. */
  val PairsType: ArrayType = ArrayType(StructType(Seq(
    StructField("hk", LongType, nullable = false),
    StructField("v", LongType, nullable = false))), containsNull = false)

  /** Max-heap under (hk, v): head is the LARGEST kept pair — the one a
    * smaller incoming pair evicts. */
  private[functions] def heapOrder: java.util.Comparator[Array[Long]] =
    (a: Array[Long], b: Array[Long]) => {
      val c = java.lang.Long.compare(b(0), a(0))
      if (c != 0) c else java.lang.Long.compare(b(1), a(1))
    }

  private[functions] def newHeap(k: Int): java.util.PriorityQueue[Array[Long]] =
    new java.util.PriorityQueue[Array[Long]](math.min(k, 64) + 1, heapOrder)

  private[functions] def offer(buf: java.util.PriorityQueue[Array[Long]],
      k: Int, hk: Long, v: Long): Unit =
    if (buf.size < k) buf.add(Array(hk, v))
    else {
      val top = buf.peek()
      if (hk < top(0) || (hk == top(0) && v < top(1))) {
        buf.poll()
        buf.add(Array(hk, v))
      }
    }

  private[functions] def mergeHeaps(b1: java.util.PriorityQueue[Array[Long]],
      b2: java.util.PriorityQueue[Array[Long]], k: Int)
      : java.util.PriorityQueue[Array[Long]] = {
    val it = b2.iterator()
    while (it.hasNext) { val p = it.next(); offer(b1, k, p(0), p(1)) }
    b1
  }

  private[functions] def sortedPairs(
      buf: java.util.PriorityQueue[Array[Long]]): Array[Array[Long]] = {
    val pairs = new Array[Array[Long]](buf.size)
    buf.toArray(pairs)
    java.util.Arrays.sort(pairs, heapOrder.reversed())
    pairs
  }

  private[functions] def evalPairs(
      buf: java.util.PriorityQueue[Array[Long]]): GenericArrayData =
    new GenericArrayData(sortedPairs(buf).map(p =>
      new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](p(0), p(1)))).asInstanceOf[Array[AnyRef]])

  private[functions] def serializeHeap(
      buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  private[functions] def deserializeHeap(bytes: Array[Byte],
      k: Int): java.util.PriorityQueue[Array[Long]] = {
    val buf = newHeap(k)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.add(Array(bb.getLong(), bb.getLong()))
    buf
  }

  /** The sample as an aggregate Column: values of the k rows with the
    * smallest (hk, v), ordered by (hk, v). */
  def sample(hk: Column, v: Column, k: Int): Column =
    Bridge.column(BottomKSample(Bridge.expression(hk),
      Bridge.expression(v), k).toAggregateExpression())

  /** The storable (hk, v) pair form — the sample-table entry
    * [[union]] folds. */
  def pairs(hk: Column, v: Column, k: Int): Column =
    Bridge.column(BottomKSample(Bridge.expression(hk),
      Bridge.expression(v), k, emitPairs = true).toAggregateExpression())

  /** Fold stored pair arrays to a coarser grouping (see
    * [[BottomKUnion]]). */
  def union(pairsCol: Column, k: Int): Column =
    Bridge.column(BottomKUnion(Bridge.expression(pairsCol), k)
      .toAggregateExpression())
}
