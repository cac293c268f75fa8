package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of one word under a unigram-LM piece table
  * (the SentencePiece-unigram E-step / serving kernel): best[i] =
  * max over j ∈ [max(0, i−maxLen), i) of best[j] + score(word[j..i)),
  * with the DETERMINISTIC tie rule pinned for the oracle — j iterates
  * ASCENDING and only a STRICTLY greater score replaces, so the
  * smallest j (longest final piece) wins ties. A piece absent from
  * the table scores the exact constant −10⁹ (a penalty, not a skip:
  * identical comparison semantics are easier to replay in SQL than a
  * conditional candidate set, and since every single character of a
  * training word is in the vocabulary a penalized path can never beat
  * a real one). Scores live on the 6dp grid, best[] sums are exact
  * doubles — bit-identical on any engine.
  *
  * The score table rides the expression as a reference object
  * (bounded vocab artifact, the AdcScores pattern); interpreted eval
  * and generated code share the one static implementation. */
case class UnigramSegment(
    child: Expression, scores: java.util.HashMap[String, java.lang.Double],
    maxLen: Int) extends UnaryExpression {

  require(maxLen >= 1, "maxLen must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "unigram_segment"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"unigram_segment needs STRING, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    UnigramSegment.segment(input.asInstanceOf[UTF8String], scores, maxLen)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("unigramScores", scores,
      "java.util.HashMap<String, Double>")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UnigramSegment.segment($s, $ref, $maxLen);")
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramSegment =
    copy(child = newChild)
}

object UnigramSegment {

  /** The exact missing-piece penalty (a grid-exact double). */
  final val MissingPenalty: Double = -1e9

  def unigram_segment(
      word: Column, scores: Map[String, Double], maxLen: Int): Column = {
    val m = new java.util.HashMap[String, java.lang.Double](scores.size * 2)
    scores.foreach { case (k, v) => m.put(k, java.lang.Double.valueOf(v)) }
    Bridge.column(UnigramSegment(Bridge.expression(word), m, maxLen))
  }

  /** Static entry shared by interpreted eval and generated code. */
  def segment(
      wordU: UTF8String, scores: java.util.HashMap[String, java.lang.Double],
      maxLen: Int): GenericArrayData = {
    val word = wordU.toString
    val L = word.length
    if (L == 0) return new GenericArrayData(Array.empty[Any])
    val best = new Array[Double](L + 1)
    val choice = new Array[Int](L + 1)
    var i = 1
    while (i <= L) {
      var bs = Double.NegativeInfinity
      var bj = -1
      var j = math.max(0, i - maxLen)
      while (j < i) {
        val sv = scores.get(word.substring(j, i))
        val s = if (sv == null) MissingPenalty else sv.doubleValue()
        val cand = best(j) + s
        if (cand > bs) { bs = cand; bj = j }
        j += 1
      }
      best(i) = bs
      choice(i) = bj
      i += 1
    }
    var nPieces = 0
    var pos = L
    while (pos > 0) { nPieces += 1; pos = choice(pos) }
    val out = new Array[Any](nPieces)
    pos = L
    var k = nPieces - 1
    while (pos > 0) {
      val j = choice(pos)
      out(k) = UTF8String.fromString(word.substring(j, pos))
      k -= 1
      pos = j
    }
    new GenericArrayData(out)
  }
}
