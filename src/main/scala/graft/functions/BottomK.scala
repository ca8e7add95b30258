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
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[java.util.PriorityQueue[Array[Long]]]
  with BinaryLike[Expression] {

  require(k > 0 && k <= (1 << 20), s"bottom-k size must be in [1, 2^20], got $k")

  override def left: Expression = hkey
  override def right: Expression = value

  /** Max-heap under (hk, v): head is the LARGEST kept pair — the one a
    * smaller incoming pair evicts. */
  private def heapOrder: java.util.Comparator[Array[Long]] =
    (a: Array[Long], b: Array[Long]) => {
      val c = java.lang.Long.compare(b(0), a(0))
      if (c != 0) c else java.lang.Long.compare(b(1), a(1))
    }

  override def createAggregationBuffer(): java.util.PriorityQueue[Array[Long]] =
    new java.util.PriorityQueue[Array[Long]](math.min(k, 64) + 1, heapOrder)

  private def offer(buf: java.util.PriorityQueue[Array[Long]],
      hk: Long, v: Long): Unit =
    if (buf.size < k) buf.add(Array(hk, v))
    else {
      val top = buf.peek()
      if (hk < top(0) || (hk == top(0) && v < top(1))) {
        buf.poll()
        buf.add(Array(hk, v))
      }
    }

  override def update(buf: java.util.PriorityQueue[Array[Long]],
      input: InternalRow): java.util.PriorityQueue[Array[Long]] = {
    val h = hkey.eval(input)
    val v = value.eval(input)
    if (h != null && v != null)
      offer(buf, h.asInstanceOf[Long], v.asInstanceOf[Long])
    buf
  }

  override def merge(b1: java.util.PriorityQueue[Array[Long]],
      b2: java.util.PriorityQueue[Array[Long]])
      : java.util.PriorityQueue[Array[Long]] = {
    val it = b2.iterator()
    while (it.hasNext) { val p = it.next(); offer(b1, p(0), p(1)) }
    b1
  }

  override def eval(buf: java.util.PriorityQueue[Array[Long]]): Any = {
    val pairs = new Array[Array[Long]](buf.size)
    buf.toArray(pairs)
    java.util.Arrays.sort(pairs, heapOrder.reversed())
    new GenericArrayData(pairs.map(_(1)))
  }

  override def serialize(buf: java.util.PriorityQueue[Array[Long]]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.size * 16)
    val it = buf.iterator()
    while (it.hasNext) { val p = it.next(); bb.putLong(p(0)); bb.putLong(p(1)) }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.PriorityQueue[Array[Long]] = {
    val buf = createAggregationBuffer()
    val bb = java.nio.ByteBuffer.wrap(bytes)
    while (bb.remaining() >= 16) buf.add(Array(bb.getLong(), bb.getLong()))
    buf
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
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
  override def prettyName: String = "bottomk_sample"
}

object BottomK {
  /** The sample as an aggregate Column: values of the k rows with the
    * smallest (hk, v), ordered by (hk, v). */
  def sample(hk: Column, v: Column, k: Int): Column =
    Bridge.column(BottomKSample(Bridge.expression(hk),
      Bridge.expression(v), k).toAggregateExpression())
}
