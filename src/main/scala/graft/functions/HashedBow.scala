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

/** SPARSE HASHED BAG-OF-WORDS in one pass: the per-document feature
  * vector of the learned quality classifier
  * ([[graft.operators.Classifier]]) as ascending-j (j, x) pairs, where
  * j = portable_hash(token) mod dim and x = count_j / n_tokens.
  *
  * Semantics are EXACTLY the composed pipeline it replaces
  * (`split(text, " ")` → [[PortableHash]] → pmod → count/n): tokens
  * are the maximal byte runs between 0x20 bytes INCLUDING empty runs
  * (split keeps them; "" hashes to 0), n counts all of them, and the
  * per-token hash is the same mod-1e9+7 byte fold — so the q147
  * oracle and the dense-path parity spec see identical features.
  *
  * Why a kernel: the explode → groupBy(id, j) → collect_list build
  * shuffles one row per TOKEN and holds rows-sized aggregate maps
  * (measured 17.9 GB of fallback spill at 1M docs × 120 tokens,
  * dim 2^18, even repartition-first — collect_list's object agg falls
  * back to sort at 128 keys). Per-row the work is trivial: hash ≤ a
  * few hundred tokens, sort the j's, run-length encode. This pass
  * makes the feature build a pure scan-side projection — ZERO
  * exchanges, nothing to spill, and the 100 TB shape is "one read of
  * the corpus". */
case class HashedBow(child: Expression, dim: Int) extends UnaryExpression {

  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("j", IntegerType, nullable = false),
      StructField("x", DoubleType, nullable = false))),
    containsNull = false)
  override def prettyName: String = "hashed_bow"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType if dim >= 2 => TypeCheckResult.TypeCheckSuccess
    case StringType => TypeCheckResult.TypeCheckFailure(
      s"hashed_bow needs dim >= 2, got $dim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"hashed_bow needs STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    HashedBow.bow(input.asInstanceOf[UTF8String], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashedBow.bow($s, $dim);")

  override protected def withNewChildInternal(newChild: Expression): HashedBow =
    copy(child = newChild)
}

object HashedBow {

  /** Static entry shared by interpreted eval and generated code. */
  def bow(text: UTF8String, dim: Int): GenericArrayData = {
    val bytes = text.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) nTokens += 1
      i += 1
    }
    val js = new Array[Int](nTokens)
    var k = 0
    var h = 0L
    i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' '.toByte) {
        js(k) = (h % dim).toInt // h in [0, 1e9+7) — already non-negative
        k += 1
        h = 0L
      } else h = (h * 31L + (b & 0xffL)) % 1000000007L
      i += 1
    }
    js(k) = (h % dim).toInt
    java.util.Arrays.sort(js)
    var uniq = 0
    i = 0
    while (i < js.length) {
      if (i == 0 || js(i) != js(i - 1)) uniq += 1
      i += 1
    }
    val n = nTokens.toDouble
    val out = new Array[Any](uniq)
    var w = -1
    var runStart = 0
    i = 0
    while (i < js.length) {
      if (i == 0 || js(i) != js(i - 1)) {
        if (w >= 0) out(w) = new GenericInternalRow(
          Array[Any](js(runStart), (i - runStart) / n))
        w += 1
        runStart = i
      }
      i += 1
    }
    out(w) = new GenericInternalRow(
      Array[Any](js(runStart), (js.length - runStart) / n))
    new GenericArrayData(out)
  }

  def hashed_bow(text: Column, dim: Int): Column =
    Bridge.column(HashedBow(Bridge.expression(text), dim))
}
