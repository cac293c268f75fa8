package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** The d(d+1)/2 upper-triangle products v_i·v_j of a vector, each
  * rounded to 6dp ([[TextFunctions.round6]]'s floor formula — the
  * engine's oracle-mirrorable rounding), emitted in (i-major, j ≥ i)
  * order as one array<double>.
  *
  * Exists because `EmbedStats.gramCov`'s first implementation built
  * the products with nested `transform` lambdas: higher-order
  * functions evaluate their lambda INTERPRETED per element, so a
  * 64-dim corpus paid ~2080 interpreted expression-tree walks per row
  * (the dominant cost of the whole Gram computation, measured). Here
  * the products are a tight generated loop over the array — the same
  * preference order the build contract states: native codegen
  * `Expression` over lambda/UDF forms.
  *
  * Precondition: callers filter to vectors of length ≥ `dim` (the
  * kernel reads the first `dim` elements; shorter vectors yield a
  * zero-padded tail rather than an error — gramCov's size filter
  * makes that unreachable). */
case class UpperTriProducts(child: Expression, dim: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "upper_tri_products"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) if dim >= 1 => TypeCheckResult.TypeCheckSuccess
    case Some(_) => TypeCheckResult.TypeCheckFailure("dim must be >= 1")
    case None => TypeCheckResult.TypeCheckFailure(
      s"upper_tri_products needs ARRAY<FLOAT|DOUBLE>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val va = input.asInstanceOf[ArrayData]
    val isFloat = elemType.contains(FloatType)
    val n = math.min(va.numElements(), dim)
    val v = new Array[Double](dim)
    var i = 0
    while (i < n) {
      // getFloat/getDouble on a null slot silently yield 0.0 — the
      // zero-pad this kernel's contract forbids; fail loudly instead.
      require(!va.isNullAt(i),
        s"upper_tri_products: NULL element at index $i — a null would " +
          "silently enter the products as 0.0; clean the input")
      v(i) = if (isFloat) va.getFloat(i).toDouble else va.getDouble(i)
      i += 1
    }
    val out = new Array[Double](dim * (dim + 1) / 2)
    var k = 0
    i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(k) = math.floor(v(i) * v(j) * 1000000.0 + 0.5) / 1000000.0
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getter = if (elemType.contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, va => {
      val v = ctx.freshName("v")
      val out = ctx.freshName("out")
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val k = ctx.freshName("k")
      s"""
         |int $n = java.lang.Math.min($va.numElements(), $dim);
         |double[] $v = new double[$dim];
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($va.isNullAt($i)) {
         |    throw new IllegalArgumentException(
         |      "upper_tri_products: NULL element at index " + $i +
         |      " — a null would silently enter the products as 0.0; clean the input");
         |  }
         |  $v[$i] = (double) $va.$getter($i);
         |}
         |double[] $out = new double[${dim * (dim + 1) / 2}];
         |int $k = 0;
         |for (int $i = 0; $i < $dim; $i++) {
         |  for (int $j = $i; $j < $dim; $j++) {
         |    $out[$k++] = java.lang.Math.floor(
         |      $v[$i] * $v[$j] * 1000000.0 + 0.5) / 1000000.0;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.util.ArrayData.toArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UpperTriProducts =
    copy(child = newChild)
}

object UpperTriProducts {
  def upper_tri_products(v: Column, dim: Int): Column =
    Bridge.column(UpperTriProducts(Bridge.expression(v), dim))
}
