package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document term frequencies.
  *
  * `term_counts(text)` → `array<struct<term: string, tf: bigint,
  * th: bigint>>`: the document's distinct whitespace tokens (of
  * `lower(text)`, split on a single space with Spark's `split`
  * semantics — limit −1, so empty trailing tokens survive), each with
  * its occurrence count and its 60-bit portable md5-prefix hash
  * ([[PortableHash.h60]]). Output is in first-occurrence order
  * (deterministic, though consumers treat it as a set).
  *
  * Why an expression and not `explode → groupBy(doc, term)`: the
  * composed form ships every token OCCURRENCE into a corpus-sized
  * hash-aggregate exchange — at 100 TB that is a 100-TB-scale shuffle
  * for what is conceptually a per-row map (the [[ShingleSig]]
  * argument, and the same reference-object codegen pattern: generated
  * source is constant, one Janino compile per session). A sorted-runs
  * formulation with `array_sort`/`filter`/`zip_with` higher-order
  * functions is also narrow but runs interpreted lambdas per token —
  * measured ~2.1 s of the 10× x22 rehearsal against ~0.4 s for this
  * compiled kernel.
  *
  * Value parity with the SQL form (`unnest(string_split(lower(text),
  * ' '))` → `GROUP BY doc_id, term` → md5-prefix hash) is exact: same
  * tokens, same counts, same hashes — TermCountsSpec pins equality
  * against the composed Spark pipeline.
  */
final class TermCountsComputer extends Serializable {

  // MessageDigest is stateful and this reference object is shared by
  // every task in the executor JVM — one instance per thread.
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a positive long (== h60). */
  private def h60(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v >>> 4
  }

  def compute(u: UTF8String): GenericArrayData = {
    // the same kernels Spark's lower() and split() use, so the result
    // is bit-identical to the composed column pipeline
    val words = u.toLowerCase.toString.split(" ", -1)
    val counts = new java.util.LinkedHashMap[String, Long](
      math.max(16, words.length * 2))
    var i = 0
    while (i < words.length) {
      val w = words(i)
      counts.put(w, counts.getOrDefault(w, 0L) + 1L)
      i += 1
    }
    val out = new Array[Any](counts.size)
    val it = counts.entrySet().iterator()
    var j = 0
    while (it.hasNext) {
      val e = it.next()
      val term = UTF8String.fromString(e.getKey)
      out(j) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
        Array[Any](term, e.getValue, h60(term.getBytes)))
      j += 1
    }
    new GenericArrayData(out)
  }
}

case class TermCounts(child: Expression) extends UnaryExpression {

  @transient private lazy val computer = new TermCountsComputer

  override def dataType: DataType = TermCounts.outType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"term_counts expects string, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    computer.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("termCountsComputer", computer,
      classOf[TermCountsComputer].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TermCounts {
  val outType: ArrayType = ArrayType(StructType(Seq(
    StructField("term", StringType, nullable = false),
    StructField("tf", LongType, nullable = false),
    StructField("th", LongType, nullable = false))), containsNull = false)

  def apply(text: Column): Column =
    Bridge.column(TermCounts(Bridge.expression(text)))
}
