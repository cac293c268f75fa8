package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Partial squared distances from a vector to a fixed centroid set:
  * array<struct<d2: double, cid: bigint>>, one entry per centroid in
  * ascending-cid order, d2 = −2·v·c + ‖c‖² (the ‖v‖² term is common to
  * every candidate and dropped — in the oracle too, so FP tie behavior
  * matches).
  *
  * The centroid matrix rides in the expression as a REFERENCE object,
  * not as literals: the generated source is identical across Lloyd
  * iterations (values live in `references[]`), so Janino compiles the
  * kernel ONCE per query instead of re-compiling an nLists·dim literal
  * plan every iteration — that recompile was the whole cost of the
  * first literal-inlined implementation. This is the MLlib-KMeans
  * execution shape: centroids in memory on every node, assignment a
  * pure map.
  *
  * `array_min` over the result implements nearest-centroid assignment
  * with the (d2 asc, cid asc) tie rule — struct ordering is
  * lexicographic, mirroring the oracle's ORDER BY d2, cid.
  *
  * d2 arithmetic per centroid: left-fold dot (ascending i, double
  * accumulator — [[FoldDot]]'s order), then `dot * -2.0 + cc` with cc
  * pre-folded at the driver over the same values the oracle folds in
  * SQL. Bit-identical to the DuckDB mirror.
  */
case class CentroidDistances(
    child: Expression,
    cids: Array[Long],
    cents: Array[Array[Double]],
    ccs: Array[Double])
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("d2", DoubleType, nullable = false),
    StructField("cid", LongType, nullable = false))), containsNull = false)
  override def prettyName: String = "centroid_distances"

  private def elemType: Option[DataType] = child.dataType match {
    case ArrayType(t @ (FloatType | DoubleType), _) => Some(t)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult = elemType match {
    case Some(_) => TypeCheckResult.TypeCheckSuccess
    case None => TypeCheckResult.TypeCheckFailure(
      s"centroid_distances needs ARRAY<FLOAT|DOUBLE>, got ${child.dataType.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val v = input.asInstanceOf[ArrayData]
    val isFloat = elemType.contains(FloatType)
    val out = new Array[Any](cents.length)
    var ci = 0
    while (ci < cents.length) {
      val c = cents(ci)
      val n = math.min(v.numElements(), c.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)) * c(i)
        i += 1
      }
      out(ci) = InternalRow(acc * -2.0 + ccs(ci), cids(ci))
      ci += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val centsRef = ctx.addReferenceObj("cents", cents, "double[][]")
    val cidsRef = ctx.addReferenceObj("cids", cids, "long[]")
    val ccsRef = ctx.addReferenceObj("ccs", ccs, "double[]")
    val getter = if (elemType.contains(FloatType)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, v => {
      val out = ctx.freshName("out")
      val ci = ctx.freshName("ci")
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val c = ctx.freshName("c")
      val row = ctx.freshName("row")
      s"""
         |Object[] $out = new Object[$centsRef.length];
         |for (int $ci = 0; $ci < $centsRef.length; $ci++) {
         |  double[] $c = $centsRef[$ci];
         |  int $n = java.lang.Math.min($v.numElements(), $c.length);
         |  double $acc = 0.0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ((double) $v.$getter($i)) * $c[$i];
         |  }
         |  Object[] $row = new Object[] {
         |    java.lang.Double.valueOf($acc * -2.0 + $ccsRef[$ci]),
         |    java.lang.Long.valueOf($cidsRef[$ci]) };
         |  $out[$ci] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow($row);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): CentroidDistances =
    copy(child = newChild)
}

object CentroidDistances {
  /** Column wrapper; `cents` as (cid, centroid) sorted ascending by cid. */
  def centroidDistances(v: Column, cents: Seq[(Long, Array[Double])]): Column = {
    val sorted = cents.sortBy(_._1).toArray
    Bridge.column(CentroidDistances(
      Bridge.expression(v),
      sorted.map(_._1),
      sorted.map(_._2),
      sorted.map(_._2.foldLeft(0.0)((a, x) => a + x * x))))
  }
}
