package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.graftbridge.Bridge

/** Left-to-right dot product of two float/double vectors, accumulated in
  * double — as a native codegen'd Catalyst expression.
  *
  * Why an Expression and not `aggregate(zip_with(...))`: higher-order
  * functions evaluate interpreted (no whole-stage codegen), which makes
  * an all-pairs similarity join CPU-bound on lambda dispatch. This
  * expression produces the SAME value bit-for-bit (identical operation
  * order: Σ over i, ascending, double accumulate — what the DuckDB
  * oracle's `list_reduce` computes) but runs inside the generated loop.
  */
case class FoldDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "fold_dot"

  private def elemType(e: Expression): Option[DataType] = e.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left), elemType(right)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"fold_dot needs ARRAY<FLOAT|DOUBLE> inputs, got " +
          s"${left.dataType.catalogString}, ${right.dataType.catalogString}")
    }

  @inline private def get(a: ArrayData, i: Int, t: DataType): Double = t match {
    case FloatType => a.getFloat(i).toDouble
    case _ => a.getDouble(i)
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val (a, b) = (l.asInstanceOf[ArrayData], r.asInstanceOf[ArrayData])
    val (ta, tb) = (elemType(left).get, elemType(right).get)
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += get(a, i, ta) * get(b, i, tb); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (l, r) => {
      def getter(t: DataType, v: String, i: String) = t match {
        case FloatType => s"(double) $v.getFloat($i)"
        case _ => s"$v.getDouble($i)"
      }
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($l.numElements(), $r.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ${getter(elemType(left).get, l, i)} * ${getter(elemType(right).get, r, i)};
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): FoldDot =
    copy(left = newLeft, right = newRight)
}

object VecFunctions {
  /** Σ aᵢ·bᵢ, ascending i, double accumulator (oracle: list_reduce fold). */
  def foldDot(a: Column, b: Column): Column =
    Bridge.column(FoldDot(Bridge.expression(a), Bridge.expression(b)))

  /** ‖v‖₂ with the same fold order. */
  def norm2(v: Column): Column =
    org.apache.spark.sql.functions.sqrt(foldDot(v, v))
}
