package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** k-function minhash signature over an array of shingle hashes, as a
  * codegen'd expression:
  *
  *   sig[kk] = min over h of ((2·kk+3)·(h+1) + kk·1000003) mod 1e9+7
  *
  * Bit-identical to the HOF formulation in
  * [[TextFunctions.minhashSignature]] (same integer arithmetic, same
  * traversal order) — that form evaluates k·|shingles| interpreted
  * lambda frames per document, which dominated the MinHash+LSH query;
  * this runs the double loop inside generated code. */
case class MinhashSignature(child: Expression, k: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"minhash_signature needs ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    val out = new Array[Long](k)
    var kk = 0
    while (kk < k) {
      var m = Long.MaxValue
      val a = 2L * kk + 3L
      val b = kk * 1000003L
      var i = 0
      while (i < n) {
        val v = (a * (hs.getLong(i) + 1L) + b) % 1000000007L
        if (v < m) m = v
        i += 1
      }
      out(kk) = m
      kk += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val out = ctx.freshName("out")
      val kk = ctx.freshName("kk")
      val i = ctx.freshName("i")
      val m = ctx.freshName("m")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |long[] $out = new long[$k];
         |for (int $kk = 0; $kk < $k; $kk++) {
         |  long $m = Long.MAX_VALUE;
         |  for (int $i = 0; $i < $n; $i++) {
         |    long $v = ((2L * $kk + 3L) * ($c.getLong($i) + 1L) + $kk * 1000003L) % 1000000007L;
         |    if ($v < $m) $m = $v;
         |  }
         |  $out[$kk] = $m;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
}

object MinhashSignature {
  def minhash_signature(hashes: Column, k: Int): Column =
    Bridge.column(MinhashSignature(Bridge.expression(hashes), k))
}
