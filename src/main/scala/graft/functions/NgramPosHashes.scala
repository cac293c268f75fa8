package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** POSITIONAL word-n-gram fingerprints in one pass: element `w` is the
  * (64-bit hash, byte length) of the n-gram starting at token position
  * `w` — [[NgramHashes]]'s sibling for the substring-dedup operators,
  * which need the position stream, not the distinct identity set.
  *
  * The string pipeline it replaces ([[graft.operators.Dedup.repeatedSpans]]
  * round-9 form) materialized every gram as a UTF8String
  * (`transform(sequence(...), i -> array_join(slice(arr, i+1, n)))`)
  * through interpreted HOFs and then hashed it — O(tokens · n · wordLen)
  * allocations per document. This kernel reads the document bytes once,
  * hashes each gram's bytes directly (same mixed-FNV family as
  * [[NgramHashes]]; ' ' as the inter-token separator — tokens come
  * from splitting on space so they can never CONTAIN one, making the
  * hashed byte stream the exact original-text substring and the
  * (hash, byteLen) fingerprint injective up to hash collisions; a '_'
  * separator would deterministically merge ["a_b","c"] with
  * ["a","b_c"]), and emits fixed 12-byte structs. Hash+length equality
  * ≡ gram-string equality modulo ~2⁻⁶⁴ collisions — the exact-dedup
  * fingerprint precedent, and the q81 oracle groups on RAW gram
  * strings, so a collision would surface as a hash mismatch there.
  *
  * Tokenization matches `split(text, " ")` byte-for-byte (every 0x20
  * delimits; empty tokens survive). Documents with fewer than n tokens
  * return an empty array. */
case class NgramPosHashes(child: Expression, n: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("h", LongType, nullable = false),
      StructField("l", IntegerType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "ngram_pos_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_pos_hashes needs STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NgramPosHashes.posHashes(input.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NgramPosHashes.posHashes($s, $n);")

  override protected def withNewChildInternal(newChild: Expression): NgramPosHashes =
    copy(child = newChild)
}

object NgramPosHashes {

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
  def posHashes(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTokens += 1; i += 1 }
    if (nTokens < n) return new GenericArrayData(Array.empty[Any])
    val starts = new Array[Int](nTokens + 1)
    var k = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(k) = i + 1; k += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1
    val out = new Array[Any](nTokens - n + 1)
    var w = 0
    while (w <= nTokens - n) {
      var h = FnvOffset
      var len = n - 1 // the n-1 separators
      var t = 0
      while (t < n) {
        if (t > 0) h = (h ^ ' '.toByte) * FnvPrime
        var p = starts(w + t)
        val end = starts(w + t + 1) - 1
        len += end - p
        while (p < end) { h = (h ^ (bytes(p) & 0xff)) * FnvPrime; p += 1 }
        t += 1
      }
      out(w) = new GenericInternalRow(Array[Any](fmix64(h), len))
      w += 1
    }
    new GenericArrayData(out)
  }

  def ngram_pos_hashes(text: Column, n: Int): Column =
    Bridge.column(NgramPosHashes(Bridge.expression(text), n))
}
