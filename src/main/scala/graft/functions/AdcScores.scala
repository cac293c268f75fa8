package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Asymmetric-distance (ADC) scoring of PQ codes against a bounded
  * query set (the Faiss IVFPQ search shape, `/root/reference` has no
  * analog — this is extension surface): for each query q whose probe
  * set contains this vector's coarse list (or every query when probes
  * is null, the flat-PQ case), emit struct(q_id, d2) with
  * d2 = Σ_j tables(q)(j)(code_j) folded in ascending subspace order
  * from 0.0 — the exact IEEE add sequence of the oracle's per-subspace
  * fold, so values stay bit-identical.
  *
  * RESIDUAL mode (`listTables` non-null, Faiss IVFPQ proper): codes
  * encode r = v − centroid(list), so the ADC table depends on the
  * (query, probed list) pair — listTables(qi)(pi) is the table for
  * query qi against its pi-th probed list (aligned with probes(qi)),
  * computed from the query's residual against that list's centroid.
  * A vector belongs to exactly one list, so each (query, vector) pair
  * still scores at most once.
  *
  * The query ids / ADC tables / probe lists ride as REFERENCE objects,
  * not literals: the generated source is a fixed ~20 lines regardless
  * of |Q|·m·ksub, so Janino compiles once and the PLAN stays constant-
  * size as the query batch grows (the literal-table form it replaces
  * generated |Q|·m `element_at(typedLit(...))` nodes — several seconds
  * of analysis+compile per run and a plan that grew with the batch). */
case class AdcScores(
    left: Expression, right: Expression,
    qids: Array[Long],
    tables: Array[Array[Array[Double]]],
    probes: Array[Array[Long]],
    listTables: Array[Array[Array[Array[Double]]]] = null) extends BinaryExpression {

  // Residual mode indexes per-(query, probed list) tables by the
  // probe position, so listTables without probes would read index -1
  // at EVALUATION time; fail at plan construction instead. (The
  // adc_scores wrapper enforces this too, but the expression is
  // constructible directly.)
  require(listTables == null || probes != null,
    "adc_scores: listTables (residual mode) requires probes — " +
      "per-list tables are aligned with each query's probe order")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("q_id", LongType, nullable = false),
    StructField("d2", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "adc_scores"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"adc_scores needs (ARRAY<BIGINT> codes, BIGINT cid), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def nullSafeEval(codes: Any, cid: Any): Any =
    AdcScores.score(codes.asInstanceOf[ArrayData], cid.asInstanceOf[Long],
      qids, tables, probes, listTables)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val qidsRef = ctx.addReferenceObj("qids", qids, "long[]")
    val tablesRef =
      if (tables == null) "(double[][][]) null"
      else ctx.addReferenceObj("tables", tables, "double[][][]")
    val probesRef =
      if (probes == null) "(long[][]) null"
      else ctx.addReferenceObj("probes", probes, "long[][]")
    val listTablesRef =
      if (listTables == null) "(double[][][][]) null"
      else ctx.addReferenceObj("listTables", listTables, "double[][][][]")
    nullSafeCodeGen(ctx, ev, (codes, cid) =>
      s"""${ev.value} = graft.functions.AdcScores.score(
         |  $codes, $cid, $qidsRef, $tablesRef, $probesRef, $listTablesRef);""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdcScores =
    copy(left = newLeft, right = newRight)
}

object AdcScores {

  /** Static kernel (codegen calls this directly — the TextKernels
    * pattern): per probing query, fold its ADC table over the codes —
    * the shared table (flat/non-residual) or the probed list's table
    * (residual mode). */
  def score(
      codes: ArrayData, cid: Long,
      qids: Array[Long],
      tables: Array[Array[Array[Double]]],
      probes: Array[Array[Long]],
      listTables: Array[Array[Array[Array[Double]]]]): GenericArrayData = {
    val out = new Array[Any](qids.length)
    var n = 0
    var qi = 0
    while (qi < qids.length) {
      var probeIdx = -1
      var probed = probes == null
      if (!probed) {
        val p = probes(qi)
        var i = 0
        while (i < p.length && !probed) {
          if (p(i) == cid) { probed = true; probeIdx = i }
          i += 1
        }
      }
      if (probed) {
        val tbl =
          if (listTables != null) listTables(qi)(probeIdx) else tables(qi)
        var acc = 0.0
        var j = 0
        while (j < tbl.length) { acc += tbl(j)(codes.getLong(j).toInt); j += 1 }
        out(n) = InternalRow(qids(qi), acc)
        n += 1
      }
      qi += 1
    }
    if (n == qids.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], n))
  }

  /** Column wrapper. `probes` null ⇒ every query scores every vector
    * (flat PQ); otherwise only queries probing `cid`'s list emit.
    * `listTables` non-null ⇒ residual mode: per-(query, probed list)
    * tables aligned with `probes` (which must then be non-null). */
  def adc_scores(
      codes: Column, cid: Column,
      qids: Array[Long],
      tables: Array[Array[Array[Double]]],
      probes: Array[Array[Long]],
      listTables: Array[Array[Array[Array[Double]]]] = null): Column = {
    require(listTables == null || probes != null,
      "adc_scores: listTables (residual mode) requires probes")
    Bridge.column(AdcScores(
      Bridge.expression(codes), Bridge.expression(cid), qids, tables, probes,
      listTables))
  }
}
