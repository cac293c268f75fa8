package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** 30-bit simhash over an array of token hashes, codegen'd.
  *
  * Bit j of each token hash votes ±1; bit j of the result is set iff
  * the vote sum is positive. Identical values to the HOF form in
  * [[TextFunctions.simhash]] — `(h >> j) & 1` ≡ `floor(h / 2^j) % 2`
  * for the non-negative sub-2³⁰ hashes [[PortableHash]] emits — but the
  * 30·|tokens| vote loop runs in generated code instead of interpreted
  * lambda frames (it dominated the simhash pair queries). */
case class SimhashBits(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"simhash_bits needs ARRAY<BIGINT>, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any = {
    val hs = input.asInstanceOf[ArrayData]
    val n = hs.numElements()
    var sig = 0L
    var j = 0
    while (j < 30) {
      var votes = 0L
      var i = 0
      while (i < n) {
        votes += ((hs.getLong(i) >> j) & 1L) * 2L - 1L
        i += 1
      }
      if (votes > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val n = ctx.freshName("n")
      val sig = ctx.freshName("sig")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val votes = ctx.freshName("votes")
      s"""
         |int $n = $c.numElements();
         |long $sig = 0L;
         |for (int $j = 0; $j < 30; $j++) {
         |  long $votes = 0L;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $votes += (($c.getLong($i) >> $j) & 1L) * 2L - 1L;
         |  }
         |  if ($votes > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SimhashBits =
    copy(child = newChild)
}

object SimhashBits {
  def simhash_bits(hashes: Column): Column =
    Bridge.column(SimhashBits(Bridge.expression(hashes)))
}
