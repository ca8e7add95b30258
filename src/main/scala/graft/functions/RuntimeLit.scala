package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.LeafExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}

/** A long constant that does NOT inline into generated source text.
  *
  * `lit(x)` embeds the value into the generated Java source text, so
  * a foreachBatch body tagging rows with `lit(batchId)` produces a
  * DIFFERENT whole-stage-codegen source every micro-batch — and every
  * batch pays a fresh ~1 s Janino compile with the stage's other
  * tasks parked behind the codegen cache's loading lock (probe: 32
  * tasks, run≈31 s total, cpu≈1.1 s — one compiler, 31 waiters).
  * This expression routes the value through the codegen `references`
  * array instead: the generated source is byte-identical for every
  * batch, so the second and later batches hit the compiled-class
  * cache.
  *
  * Deliberately non-foldable — constant folding would collapse it
  * back into a literal. The only cost is that the optimizer cannot
  * fold arithmetic over it; the replay sites use it purely as an
  * output tag column, where nothing folds anyway.
  */
case class RuntimeLongLit(value: Long) extends LeafExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = false
  override def eval(input: InternalRow): Any = value

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("runtimeLongLit",
      java.lang.Long.valueOf(value), "java.lang.Long")
    ev.copy(
      code = code"final long ${ev.value} = $ref.longValue();",
      isNull = FalseLiteral)
  }
}

object RuntimeLongLit {
  /** The expression as a [[Column]] (named `col` — an `apply(Long)`
    * overload would clash with the case-class constructor). */
  def col(value: Long): Column = Bridge.column(new RuntimeLongLit(value))
}
