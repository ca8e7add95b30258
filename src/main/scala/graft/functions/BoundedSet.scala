package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._

/** Exact distinct-set collection with a hard size bound: the group's
  * distinct values as a sorted array when there are at most `cap` of
  * them, NULL once the (cap+1)-th distinct value is seen. The overflow
  * answer is exact too — "this group has more than cap distinct values"
  * — which is precisely the document-frequency-cap shape in
  * decontamination/dedup pipelines: groups past the cap are DROPPED, so
  * their contents need never exist anywhere.
  *
  * The scale contract vs `collect_set` + a separate count: state is
  * ≤ cap+1 longs per group NO MATTER the group size (an overflowed
  * buffer frees its contents and keeps one flag), merge stays bounded
  * (commutative/associative; overflow is absorbing), and the frequency
  * filter needs no second pass — `collect_set` under a windowed
  * pre-count walks the data twice and its unbounded partial sets are
  * exactly the OOM this type forbids by construction.
  *
  * eval sorts ascending, making the output a pure function of the
  * group's value SET (HashSet iteration order never leaks).
  */
case class BoundedLongSet(
    child: Expression,
    cap: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[BoundedSet.Buf] with UnaryLike[Expression] {

  require(cap > 0 && cap <= (1 << 20),
    s"bounded_set cap must be in [1, 2^20], got $cap")

  override def createAggregationBuffer(): BoundedSet.Buf = new BoundedSet.Buf

  override def update(buf: BoundedSet.Buf, input: InternalRow): BoundedSet.Buf = {
    val v = child.eval(input)
    if (v != null) buf.add(v.asInstanceOf[Long], cap)
    buf
  }

  override def merge(b1: BoundedSet.Buf, b2: BoundedSet.Buf): BoundedSet.Buf =
    b1.absorb(b2, cap)

  override def eval(buf: BoundedSet.Buf): Any =
    if (buf.overflowed) null
    else {
      val arr = buf.toArray
      java.util.Arrays.sort(arr)
      new GenericArrayData(arr)
    }

  override def serialize(buf: BoundedSet.Buf): Array[Byte] = buf.serialize()

  override def deserialize(bytes: Array[Byte]): BoundedSet.Buf =
    BoundedSet.deserialize(bytes)

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bounded_set expects bigint, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(o: Int): BoundedLongSet =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): BoundedLongSet =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): BoundedLongSet =
    copy(child = c)
  override def prettyName: String = "bounded_set"
}

object BoundedSet {

  /** ≤ cap distinct longs, or an absorbing overflow flag with the
    * contents released. Most groups in the target workloads hold 1-2
    * values, so the set starts tiny and only grows on demand. */
  final class Buf {
    private var set: java.util.HashSet[java.lang.Long] =
      new java.util.HashSet[java.lang.Long](4)
    var overflowed: Boolean = false

    def add(v: Long, cap: Int): Unit =
      if (!overflowed) {
        set.add(v)
        if (set.size > cap) { overflowed = true; set = null }
      }

    def absorb(other: Buf, cap: Int): Buf = {
      if (other.overflowed) { overflowed = true; set = null }
      else if (!overflowed) {
        val it = other.set.iterator()
        while (it.hasNext && !overflowed) add(it.next(), cap)
      }
      this
    }

    def toArray: Array[Long] = {
      val out = new Array[Long](set.size)
      val it = set.iterator()
      var i = 0
      while (it.hasNext) { out(i) = it.next(); i += 1 }
      out
    }

    def serialize(): Array[Byte] =
      if (overflowed) Array[Byte](1)
      else {
        val bb = java.nio.ByteBuffer.allocate(1 + set.size * 8)
        bb.put(0: Byte)
        val it = set.iterator()
        while (it.hasNext) bb.putLong(it.next())
        bb.array()
      }
  }

  private[functions] def deserialize(bytes: Array[Byte]): Buf = {
    val buf = new Buf
    if (bytes(0) == 1) { buf.overflowed = true }
    else {
      val bb = java.nio.ByteBuffer.wrap(bytes, 1, bytes.length - 1)
      // cap Int.MaxValue: a serialized buffer is already ≤ its cap
      while (bb.remaining() >= 8) buf.add(bb.getLong(), Int.MaxValue)
    }
    buf
  }

  /** The bounded distinct set as an aggregate Column: sorted
    * array<bigint> of the group's distinct values, or NULL when the
    * group holds more than `cap` distinct values. */
  def collect(v: Column, cap: Int): Column =
    Bridge.column(BoundedLongSet(Bridge.expression(v), cap)
      .toAggregateExpression())
}
