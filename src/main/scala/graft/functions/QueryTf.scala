package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass BM25 term-frequency projection.
  *
  * `query_tf(text, terms)` → `struct(dl: int, tf1: int, …, tfn: int)`:
  * the document length (token count of `lower(text)` under Spark's
  * `split(_, " ")` semantics, limit −1) and the occurrence count of
  * each query term, computed in ONE compiled pass over the document.
  * The composed form (`split(lower(text), ' ')` + one
  * `size(filter(w, x -> x = t))` per term) allocates the full token
  * array and walks it once per term with interpreted lambdas — this
  * kernel is the fused projection a corpus-scale retrieval scan wants
  * (the [[TermCounts]]/[[ShingleSig]] reference-object codegen
  * pattern: constant generated source, one Janino compile).
  *
  * Value parity with the composed pipeline is exact and pinned by
  * QueryTfSpec. Terms are matched verbatim (callers lowercase them,
  * as [[graft.operators.Retrieval.bm25TopK]] does).
  */
final class QueryTfComputer(terms: Array[String]) extends Serializable {

  def compute(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val words = u.toLowerCase.toString.split(" ", -1)
    val out = new Array[Any](terms.length + 1)
    out(0) = words.length
    var t = 0
    while (t < terms.length) {
      val term = terms(t)
      var c = 0
      var i = 0
      while (i < words.length) {
        if (words(i) == term) c += 1
        i += 1
      }
      out(t + 1) = c
      t += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }
}

case class QueryTf(child: Expression, terms: Seq[String])
    extends UnaryExpression {

  @transient private lazy val computer = new QueryTfComputer(terms.toArray)

  override def dataType: DataType = StructType(
    StructField("dl", IntegerType, nullable = false) +:
      terms.indices.map(i =>
        StructField(s"tf${i + 1}", IntegerType, nullable = false)))
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType && terms.nonEmpty)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"query_tf expects (string, non-empty terms), got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    computer.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("queryTfComputer", computer,
      classOf[QueryTfComputer].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object QueryTf {
  def apply(text: Column, terms: Seq[String]): Column =
    Bridge.column(QueryTf(Bridge.expression(text), terms))
}
