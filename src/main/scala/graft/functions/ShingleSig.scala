package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** One-pass per-document shingle signatures.
  *
  * The composed formulation (explode one row per gram position → md5 →
  * groupBy doc) is correct but its COST MODEL is wrong at corpus scale:
  * char 8-grams mean ~1 exploded row + 1 md5 per input BYTE (word
  * 3-grams: per word), all of which transits a shuffle before the
  * signature aggregation — at 100 TB that is a 100-TB-scale shuffle for
  * what is conceptually a per-row map. These expressions compute the
  * whole signature — the sorted distinct 60-bit gram-hash set plus the
  * nSlots MinHash permutation minima — in one narrow pass over each
  * document: zero extra rows, zero exchanges, the md5 work identical.
  *
  * Value parity is exact and asserted in ExactnessSpec:
  *  - char grams are `substr(t, i, gramLen)` for
  *    i ∈ [1, max(len−gramLen+1, 1)] via `UTF8String.substringSQL`
  *    (the same kernel the SQL path used);
  *  - word grams are `concat_ws(' ', slice(split(t, ' '), i, 3))` for
  *    i ∈ [1, max(nWords−2, 1)] — regex-split with limit −1, exactly
  *    like Spark's `split`;
  *  - hashes use the same md5-prefix-60 scheme as [[PortableHash.h60]],
  * so the DuckDB oracle — and every previously recorded result — is
  * bit-identical.
  */
sealed abstract class ShingleSigComputer(seed: Int, nSlots: Int)
    extends Serializable {

  private val as = Array.tabulate(nSlots)(j => PortableHash.permA(seed + j))
  private val bs = Array.tabulate(nSlots)(j => PortableHash.permB(seed + j))

  // MessageDigest is stateful and the reference object is shared by
  // every task in the executor JVM — one instance per thread.
  @transient private lazy val md =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 60 bits of md5(bytes) as a positive long — identical to
    * parsing the first 15 hex chars (dropping the 16th hex char of the
    * first 8 bytes == >>> 4). */
  protected final def h60(bytes: Array[Byte]): Long = {
    val d = md.get().digest(bytes)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (d(k) & 0xffL); k += 1 }
    v >>> 4
  }

  /** h60 over a byte slice, digesting into a caller-owned 16-byte
    * scratch buffer — the allocation-free form the per-gram loops use
    * (md5 of the slice is identical to md5 of a copied sub-array). */
  protected final def h60(bytes: Array[Byte], off: Int, len: Int,
      out: Array[Byte]): Long = {
    val m = md.get()
    m.update(bytes, off, len)
    m.digest(out, 0, 16)
    var v = 0L
    var k = 0
    while (k < 8) { v = (v << 8) | (out(k) & 0xffL); k += 1 }
    v >>> 4
  }

  /** One 60-bit hash per gram OCCURRENCE, in document order. */
  protected def gramHashes(u: UTF8String): Array[Long]

  def compute(u: UTF8String): InternalRow = {
    val hashes = gramHashes(u)
    java.util.Arrays.sort(hashes)
    var distinct = 0
    var i = 0
    while (i < hashes.length) {
      if (i == 0 || hashes(i) != hashes(i - 1)) {
        hashes(distinct) = hashes(i)
        distinct += 1
      }
      i += 1
    }
    val hs = java.util.Arrays.copyOf(hashes, distinct)
    val p = PortableHash.P
    val sig = new Array[Long](nSlots)
    var j = 0
    while (j < nSlots) {
      val a = as(j); val b = bs(j)
      var m = Long.MaxValue
      var x = 0
      while (x < distinct) {
        val t = (hs(x) % p * a + b) % p
        if (t < m) m = t
        x += 1
      }
      sig(j) = m
      j += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](new GenericArrayData(hs), new GenericArrayData(sig)))
  }
}

final class CharShingleSigComputer(seed: Int, nSlots: Int, gramLen: Int)
    extends ShingleSigComputer(seed, nSlots) {
  override protected def gramHashes(u: UTF8String): Array[Long] = {
    // One rolling pass over the document's UTF-8 bytes: two byte
    // offsets (window start, window end) each advance one codepoint per
    // gram, and each gram is hashed as a SLICE of the shared byte array
    // through the reusable digest buffer. Value-identical to the
    // substringSQL formulation (md5 of the same bytes) but O(n) instead
    // of O(n²) — substringSQL re-walks the string from byte 0 on every
    // call, which turned long documents into per-task stragglers (a
    // 100k-char doc cost ~5G byte steps; the whole 100× corpus ran at 4
    // of 32 cores behind them) — and allocation-free per gram where the
    // old loop minted a UTF8String + byte[] + digest array each.
    val bytes = u.getBytes
    val n = u.numChars()
    val count = math.max(n - gramLen + 1, 1)
    val hashes = new Array[Long](count)
    val out = new Array[Byte](16)
    var sb = 0 // byte offset of char i
    var eb = 0 // byte offset of char i + gramLen (capped at end)
    var ec = 0 // chars consumed by eb
    while (ec < gramLen && eb < bytes.length) {
      eb += UTF8String.numBytesForFirstByte(bytes(eb))
      ec += 1
    }
    var i = 0
    while (i < count) {
      hashes(i) = h60(bytes, sb, eb - sb, out)
      if (sb < bytes.length)
        sb += UTF8String.numBytesForFirstByte(bytes(sb))
      if (eb < bytes.length)
        eb += UTF8String.numBytesForFirstByte(bytes(eb))
      i += 1
    }
    hashes
  }
}

final class WordShingleSigComputer(seed: Int, nSlots: Int, gramWords: Int)
    extends ShingleSigComputer(seed, nSlots) {
  override protected def gramHashes(u: UTF8String): Array[Long] = {
    // regex split on " " with limit -1 — Spark's split() kernel
    val words = u.toString.split(" ", -1)
    val count = math.max(words.length - gramWords + 1, 1)
    val hashes = new Array[Long](count)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < count) {
      sb.setLength(0)
      val end = math.min(i + gramWords, words.length)
      var k = i
      while (k < end) {
        if (k > i) sb.append(' ')
        sb.append(words(k))
        k += 1
      }
      hashes(i) = h60(
        sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      i += 1
    }
    hashes
  }
}

/** Shingle tokenization mode — a sealed enum so [[ShingleSig]] stays a
  * case class of PRIMITIVES: expression equality (and therefore plan
  * canonicalization, cache lookup, and exchange reuse) must be
  * structural. Embedding the computer object directly made every
  * invocation a distinct plan — each bench run registered a NEW cache
  * entry and recomputed the signatures. */
sealed trait ShingleMode
case object CharGrams extends ShingleMode
case object WordGrams extends ShingleMode

/** `shingle_sig(text)` → struct(hs: array<bigint>, sig: array<bigint>):
  * the document's sorted distinct gram-hash set and its MinHash
  * signature, computed in one codegen'd call into the reference-object
  * computer (generated source is constant — one Janino compile per
  * session regardless of seed/slot configuration). */
case class ShingleSig(child: Expression, mode: ShingleMode, seed: Int,
    nSlots: Int, gramLen: Int) extends UnaryExpression {

  @transient private lazy val computer: ShingleSigComputer = mode match {
    case CharGrams => new CharShingleSigComputer(seed, nSlots, gramLen)
    case WordGrams => new WordShingleSigComputer(seed, nSlots, gramLen)
  }

  override def dataType: DataType = ShingleSig.outType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_sig expects string, got ${child.dataType.sql}")

  override def nullSafeEval(t: Any): Any =
    computer.compute(t.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("shingleSigComputer", computer,
      classOf[ShingleSigComputer].getName)
    nullSafeCodeGen(ctx, ev, t => s"${ev.value} = $ref.compute($t);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleSig {
  val outType: StructType = StructType(Seq(
    StructField("hs", ArrayType(LongType, containsNull = false),
      nullable = false),
    StructField("sig", ArrayType(LongType, containsNull = false),
      nullable = false)))
}

object CharShingleSig {
  def apply(text: Column, seed: Int, nSlots: Int, gramLen: Int = 8): Column =
    Bridge.column(ShingleSig(Bridge.expression(text), CharGrams, seed,
      nSlots, gramLen))
}

object WordShingleSig {
  def apply(text: Column, seed: Int, nSlots: Int, gramWords: Int = 3): Column =
    Bridge.column(ShingleSig(Bridge.expression(text), WordGrams, seed,
      nSlots, gramWords))
}
