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
import org.apache.spark.unsafe.types.UTF8String

/** Count-min sketch (Cormode & Muthukrishnan 2005) as a native Catalyst
  * [[TypedImperativeAggregate]] — fixed-size frequency estimation, the
  * heavy-hitters companion to [[HllSketch]]: "how often does token t
  * appear in the corpus" with an 8 KiB state instead of a
  * |vocabulary|-sized exact aggregation.
  *
  * Scale shape: the buffer is DEPTH×WIDTH = 4×256 int64 counters per
  * group, merge is elementwise ADD (counter arrays are a commutative
  * monoid), so partial aggregation reduces each partition to one 8 KiB
  * state before the shuffle — at 100 TB the exchange carries
  * |groups|·8 KiB while the token stream itself never shuffles.
  *
  * Portability contract: ONE portable h60 per value supplies all four
  * rows — row i uses bits [15i, 15i+15) of the 60-bit hash:
  *   cell_i = (h >> 15·i) % 256.
  * (Four md5 calls per token would also work but triple the hot-path
  * cost; 15 independent uniform bits per row is plenty at width 256.)
  * A point estimate is min_i counters[i·256 + cell_i] — an upper bound
  * on the true count with the usual CMS guarantee
  * (ε = e/256, δ = e^-4). DuckDB replays cell membership relationally
  * with the same literal arithmetic, so estimates are bit-identical.
  */
case class CmsSketch(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import Cms.{Depth, Width}

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val h = Md5Prefix60.hash(v.asInstanceOf[UTF8String].getBytes)
      var i = 0
      while (i < Depth) {
        buf(i * Width + Cms.cell(h, i)) += 1L
        i += 1
      }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < b1.length) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cms_sketch expects string, got ${child.dataType.sql}")

  override def withNewMutableAggBufferOffset(o: Int): CmsSketch =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsSketch =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsSketch =
    copy(child = c)
  override def prettyName: String = "cms_sketch"
}

/** Union of PRE-COMPUTED count-min counter arrays — frequency-sketch
  * algebra, the [[HllUnion]] companion: counters form a commutative
  * monoid under elementwise ADD, so a stored per-(fine-group) CMS table
  * folds to any coarser grouping without rescanning the token stream,
  * and the rollup is BIT-IDENTICAL to sketching the coarse group
  * directly (the x61 gate's property). */
case class CmsUnion(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] with UnaryLike[Expression] {

  import Cms.{Depth, Width}

  override def createAggregationBuffer(): Array[Long] = new Array[Long](Depth * Width)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      require(arr.numElements() == buf.length,
        s"cms_union expects a ${buf.length}-cell array, got ${arr.numElements()}")
      var j = 0
      while (j < buf.length) { buf(j) += arr.getLong(j); j += 1 }
    }
    buf
  }

  override def merge(b1: Array[Long], b2: Array[Long]): Array[Long] = {
    var j = 0
    while (j < b1.length) { b1(j) += b2(j); j += 1 }
    b1
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"cms_union expects array<bigint> counters, got ${other.sql}")
  }

  override def withNewMutableAggBufferOffset(o: Int): CmsUnion =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CmsUnion =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildInternal(c: Expression): CmsUnion =
    copy(child = c)
  override def prettyName: String = "cms_union"
}

object Cms {
  val Depth = 4
  val Width = 256

  /** Row-i cell of hash h — the shared JVM/SQL contract. */
  def cell(h: Long, i: Int): Int = ((h >>> (15 * i)) % Width).toInt

  /** JVM-side cells for a literal probe value (embedded into both the
    * Spark probe expression and the DuckDB oracle). */
  def cells(value: String): IndexedSeq[Int] = {
    val h = PortableHash.h60(value)
    (0 until Depth).map(cell(h, _))
  }

  /** The sketch as an aggregate Column over a STRING child. */
  def sketch(c: Column): Column =
    Bridge.column(CmsSketch(Bridge.expression(c)).toAggregateExpression())

  /** Union of stored counter arrays (elementwise add). */
  def union(c: Column): Column =
    Bridge.column(CmsUnion(Bridge.expression(c)).toAggregateExpression())

  /** Spark expression: point estimate of `value` from sketch column
    * `cms` (1-based element_at into the flattened DEPTH×WIDTH array). */
  def estimateSpark(cms: String, value: String): String =
    cells(value).zipWithIndex
      .map { case (c, i) => s"element_at($cms, ${i * Width + c + 1})" }
      .mkString("least(", ", ", ")")

  /** DuckDB fragment: row-i cell of hash expression `hv`. */
  def cellDuck(hv: String, i: Int): String = s"((($hv >> ${15 * i}) % $Width))"
}
