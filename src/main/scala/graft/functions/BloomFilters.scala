package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** `filter.mightContainLong(x)` as a whole-stage-codegen expression.
  *
  * The filter travels as a codegen REFERENCE OBJECT (the
  * [[CentroidTopCids]] pattern): the generated source is independent of
  * the filter's size and contents — one Janino compile no matter how
  * many bits the filter holds — and each executor deserializes the
  * sketch once per task set, not once per row. This is the probe side
  * of the broadcast-bloom prefilter (the same shape Spark's own runtime
  * row-level filtering injects for shuffle joins): conservative —
  * false positives pass and must be discarded by an exact verify
  * downstream; false negatives cannot occur, so dropping a row here is
  * always safe.
  */
case class BloomMightContainLong(child: Expression, filter: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"bloom_might_contain_long expects BIGINT, got ${child.dataType.sql}")

  override def nullSafeEval(v: Any): Any =
    filter.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomFilter", filter,
      classOf[BloomFilter].getName)
    nullSafeCodeGen(ctx, ev, v => s"${ev.value} = $ref.mightContainLong($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BloomMightContainLong {
  def apply(x: Column, filter: BloomFilter): Column =
    Bridge.column(BloomMightContainLong(Bridge.expression(x), filter))
}
