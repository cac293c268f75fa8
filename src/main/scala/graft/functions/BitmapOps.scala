package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** Dense-bitmap set operations for SMALL-vocabulary similarity: when a
  * blocking key's shingle vocabulary is driver-collectable (synthetic
  * corpora, char-class features, tag sets), each document's shingle
  * set becomes a V-bit bitmap and |A∩B| is a popcount over ~V/64
  * longs — turning the candidate-pair cost from a postings join +
  * corpus-sized hash aggregation into a pure per-pair kernel. The
  * vocabulary rides into the plan as a codegen REFERENCE object
  * (sorted long[], binary-searched per hash), the same
  * bounded-plan-parameter pattern as IVF centroids. */
object BitmapOps {

  /** Static helpers called from generated code (static-helper codegen
    * pattern — complex kernels stay inside whole-stage codegen without
    * giant generated methods). */
  def build(hs: ArrayData, vocab: Array[Long]): ArrayData = {
    val bits = new Array[Long]((vocab.length + 63) >> 6)
    var i = 0
    val n = hs.numElements()
    while (i < n) {
      val idx = java.util.Arrays.binarySearch(vocab, hs.getLong(i))
      if (idx >= 0) bits(idx >> 6) |= 1L << (idx & 63)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(bits)
  }

  def andCount(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var i = 0
    var c = 0L
    while (i < n) {
      c += java.lang.Long.bitCount(a.getLong(i) & b.getLong(i))
      i += 1
    }
    c
  }

  def bitmap_from_hashes(hashes: Column, vocab: Array[Long]): Column =
    Bridge.column(BitmapFromHashes(Bridge.expression(hashes), vocab))

  def bitmap_and_count(a: Column, b: Column): Column =
    Bridge.column(BitmapAndCount(Bridge.expression(a), Bridge.expression(b)))
}

/** hashes (array<bigint>) → V-bit bitmap (array<bigint>, fixed width)
  * under the sorted `vocab`; hashes outside the vocabulary are
  * ignored (a df-filtered vocabulary stays exact for intersections —
  * a term missing from the vocab exists in at most one set). */
case class BitmapFromHashes(child: Expression, vocab: Array[Long])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "bitmap_from_hashes"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"bitmap_from_hashes needs ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    BitmapOps.build(input.asInstanceOf[ArrayData], vocab)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val v = ctx.addReferenceObj("bitmapVocab", vocab, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.BitmapOps.build($c, $v);")
  }

  override protected def withNewChildInternal(newChild: Expression): BitmapFromHashes =
    copy(child = newChild)
}

/** popcount(A AND B) of two equal-width long-array bitmaps. */
case class BitmapAndCount(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "bitmap_and_count"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"bitmap_and_count needs two ARRAY<BIGINT>, got " +
          s"${l.catalogString}, ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any =
    BitmapOps.andCount(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.BitmapOps.andCount($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BitmapAndCount =
    copy(left = newLeft, right = newRight)
}
