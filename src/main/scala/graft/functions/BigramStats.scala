package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document word-bigram statistics (x21's kernel).
  *
  * `bigram_stats(text)` → `struct<n_bigrams: bigint, n_distinct:
  * bigint, top_cnt: bigint>` over the word 2-grams of `lower(text)`
  * split on a single space (Spark `split` semantics, limit −1):
  * total bigram count (= words−1), distinct bigram count, and the
  * count of the single most frequent bigram. NULL for documents with
  * fewer than two words (no 2-grams — the composed form drops them by
  * exploding an empty array; callers filter the NULLs to match).
  *
  * Why an expression and not `explode(bigrams) → groupBy(doc, b) →
  * groupBy(doc)`: the composed form ships every bigram OCCURRENCE as
  * a string into a corpus-sized hash-aggregate exchange, then pays a
  * second doc-keyed exchange — at 100 TB that is a 100-TB-scale
  * shuffle (of data LARGER than the corpus: each ~11-byte word is
  * repeated into two ~22-byte bigrams) for what is conceptually a
  * per-row statistic. This kernel folds tokenize → count → reduce
  * into one compiled pass per document, so x21 becomes a pure narrow
  * map with ZERO shuffles — the same corpus-shuffle elimination
  * [[TermCounts]] bought x22 (and the same reference-object codegen
  * pattern: generated source is constant, one Janino compile per
  * session).
  *
  * Value parity with the composed pipeline is exact — same tokens,
  * same bigram strings, same counts (BigramStatsSpec pins equality
  * against the explode/groupBy form on the fixture corpus).
  */
final class BigramStatsComputer extends Serializable {

  def compute(u: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val words = u.toLowerCase.toString.split(" ", -1)
    if (words.length < 2) return null
    // Adjacent pairs keyed by the joined bigram string: tokens cannot
    // contain the ' ' separator (they came from splitting on it), so
    // `w(i) + ' ' + w(i+1)` is collision-free as a pair key.
    val counts = new java.util.HashMap[String, Long](
      math.max(16, words.length * 2))
    var i = 0
    while (i < words.length - 1) {
      val b = words(i) + " " + words(i + 1)
      counts.put(b, counts.getOrDefault(b, 0L) + 1L)
      i += 1
    }
    var top = 0L
    val it = counts.values().iterator()
    while (it.hasNext) { val c = it.next(); if (c > top) top = c }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any]((words.length - 1).toLong, counts.size.toLong, top))
  }
}

case class BigramStats(child: Expression) extends UnaryExpression {

  @transient private lazy val computer = new BigramStatsComputer

  override def dataType: DataType = BigramStats.outType
  // NULL for <2-word documents even when the input column is non-null.
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"bigram_stats expects string, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    computer.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bigramStatsComputer", computer,
      classOf[BigramStatsComputer].getName)
    // compute() returns null for <2-word docs: propagate it as SQL NULL
    // (nullSafeCodeGen alone would hand a null struct downstream).
    nullSafeCodeGen(ctx, ev, t =>
      s"""${ev.value} = $ref.compute($t);
         |if (${ev.value} == null) { ${ev.isNull} = true; }""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BigramStats {
  val outType: StructType = StructType(Seq(
    StructField("n_bigrams", LongType, nullable = false),
    StructField("n_distinct", LongType, nullable = false),
    StructField("top_cnt", LongType, nullable = false)))

  def apply(text: Column): Column =
    Bridge.column(BigramStats(Bridge.expression(text)))
}
