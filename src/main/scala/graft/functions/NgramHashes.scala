package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word-n-gram shingle HASHES in one pass: 64-bit identity per
  * shingle, sorted ascending — the allocation-free fast path of
  * [[TextFunctions.shingles]] + per-shingle hashing.
  *
  * Identity is a mixed FNV-1a over the shingle's joined bytes
  * (tokens separated by '_', exactly the string [[TextFunctions.shingles]]
  * builds), so hash equality ≡ shingle-string equality modulo 64-bit
  * collisions (~2⁻⁶⁴ per colliding pair — below FP noise). Tokenization
  * matches `split(text, " ")` byte-for-byte: every 0x20 is a delimiter,
  * consecutive/leading/trailing spaces produce empty tokens (0x20 never
  * occurs inside a UTF-8 multibyte sequence, so byte scanning is safe).
  *
  * Why: the string pipeline (split → transform window → concat_ws →
  * array_distinct) materializes every shingle as a UTF8String through
  * interpreted HOFs, and the inverted-index join evaluates it once per
  * JOIN LEG. This pass reads the document bytes once and emits longs —
  * q17's postings build dropped from ~4.4 s to sub-second at sf0.1. */
case class NgramHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_hashes needs STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramHashes.hashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramHashes.hashes($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramHashes =
    copy(child = newChild)
}

object NgramHashes {

  private final val FnvOffset = 0xcbf29ce484222325L
  private final val FnvPrime = 0x100000001b3L

  @inline private def fmix64(k0: Long): Long = {
    var k = k0
    k ^= k >>> 33
    k *= 0xff51afd7ed558ccdL
    k ^= k >>> 33
    k *= 0xc4ceb9fe1a85ec53L
    k ^= k >>> 33
    k
  }

  /** Static entry shared by interpreted eval and generated code. */
  def hashes(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    // token boundaries: tokens are the maximal runs between 0x20 bytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTokens += 1; i += 1 }
    if (nTokens < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTokens + 1) // starts(k) .. starts(k+1)-2 = token k
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1
    val out = new Array[Long](nTokens - n + 1)
    var w = 0
    while (w <= nTokens - n) {
      var h = FnvOffset
      var t = 0
      while (t < n) {
        if (t > 0) h = (h ^ '_'.toByte) * FnvPrime // the concat_ws separator
        var p = starts(w + t)
        val end = starts(w + t + 1) - 1
        while (p < end) { h = (h ^ (bytes(p) & 0xff)) * FnvPrime; p += 1 }
        t += 1
      }
      out(w) = fmix64(h)
      w += 1
    }
    java.util.Arrays.sort(out)
    // distinct on the sorted array
    var uniq = 0
    i = 0
    while (i < out.length) {
      if (i == 0 || out(i) != out(i - 1)) { out(uniq) = out(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, uniq))
  }

  def ngram_hashes(text: Column, n: Int): Column =
    Bridge.column(NgramHashes(Bridge.expression(text), n))
}
