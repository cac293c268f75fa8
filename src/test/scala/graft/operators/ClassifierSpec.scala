package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSpec {
  import spark.implicits._

  // two disjoint vocabularies -> linearly separable in hash space
  // (with dim=16 the two 3-token sets land in distinct buckets)
  private def corpus(n: Int) = (0 until n).map { i =>
    if (i % 2 == 0) (i.toLong, "alpha beta gamma alpha beta", true)
    else (i.toLong, "omega psi chi omega psi", false)
  }.toDF("doc_id", "text", "label")

  test("separable classes are learned: every prediction matches") {
    val got = Classifier.qualityClassifierScores(
        corpus(40), "doc_id", "text", col("label"))
      .collect().map(r => (r.getDouble(1) >= 0.5, r.getBoolean(3)))
    assert(got.nonEmpty)
    got.foreach { case (y, pred) => assert(pred === y) }
  }

  test("scores separate the classes, not just cross 0.5") {
    val rows = Classifier.qualityClassifierScores(
        corpus(40), "doc_id", "text", col("label"))
      .collect().map(r => (r.getDouble(1), r.getDouble(2)))
    val pos = rows.filter(_._1 == 1.0).map(_._2)
    val neg = rows.filter(_._1 == 0.0).map(_._2)
    assert(pos.min > neg.max)
  }

  test("training is deterministic: identical weights on re-run") {
    val feats = Classifier.hashedFeatures(
      corpus(20), "doc_id", "text", col("label"), dim = 16)
      .localCheckpoint()
    val w1 = Classifier.trainLogistic(feats, dim = 16, iters = 8, lr = 0.5)
    val w2 = Classifier.trainLogistic(feats, dim = 16, iters = 8, lr = 0.5)
    assert(w1.toSeq === w2.toSeq)
    // and every weight sits on the 6dp grid
    w1.foreach(v => assert(v === math.floor(v * 1e6 + 0.5) / 1e6))
  }

  test("hashedFeatures: term frequencies sum to 1 per doc") {
    val f = Classifier.hashedFeatures(
        corpus(10), "doc_id", "text", col("label"), dim = 16)
      .select(aggregate(col("x"), lit(0.0), (a, v) => a + v).as("s"))
      .collect().map(_.getDouble(0))
    f.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("null-text docs are excluded from features and scores") {
    val d = Seq((1L, Some("alpha beta"), true), (2L, None, false))
      .toDF("doc_id", "text", "label")
    val f = Classifier.hashedFeatures(d, "doc_id", "text",
      col("label"), dim = 16)
    assert(f.collect().map(_.getLong(0)).toSeq === Seq(1L))
  }

  test("sparse path: weights bit-identical to dense at dim 16") {
    // the fastText-dim scale path must be a pure REPRESENTATION
    // change: same partial-sum sequence in z (zero terms are IEEE
    // no-ops), same decimal gradient coordinates — so the trained
    // weight vectors match to the last bit, across several dims
    // including one where many buckets stay empty.
    val d = corpus(30)
    for (dim <- Seq(4, 16, 64)) {
      val dense = Classifier.hashedFeatures(
        d, "doc_id", "text", col("label"), dim).localCheckpoint()
      val sparse = Classifier.hashedFeaturesSparse(
        d, "doc_id", "text", col("label"), dim).localCheckpoint()
      val wd = Classifier.trainLogistic(dense, dim, iters = 8, lr = 0.5)
      val ws = Classifier.trainLogisticSparse(sparse, dim, iters = 8,
        lr = 0.5)
      assert(wd.toSeq === ws.toSeq, s"dim=$dim")
      // serving parity too: identical scores doc-by-doc
      val sd = Classifier.scoreDocs(d, "doc_id", "text", wd)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      val ss = Classifier.scoreDocsSparse(d, "doc_id", "text", ws)
        .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
      assert(sd === ss, s"dim=$dim")
    }
  }

  test("sparse end-to-end engages above the dim threshold and learns") {
    val got = Classifier.qualityClassifierScores(
        corpus(40), "doc_id", "text", col("label"), dim = 2048, iters = 8)
      .collect().map(r => (r.getDouble(1) >= 0.5, r.getBoolean(3)))
    assert(got.nonEmpty)
    got.foreach { case (y, pred) => assert(pred === y) }
  }

  test("bradleyTerry: two-item fixed point = empirical win rate; zero-win decay; deterministic") {
    // A beats B 3×, B beats A 1× — the MM fixed point is s = (1.5,
    // 0.5) (reached in ONE round from uniform: s_A + s_B stays 2, so
    // den = 4/2 = 2 and raw = wins/2 is already normalized), giving
    // P(A beats B) = 1.5/2 = 0.75 = the empirical 3/4
    val g = (Seq.fill(3)((0L, 1L)) :+ ((1L, 0L))).toDF("w", "l")
    val out = Classifier.bradleyTerry(g, col("w"), col("l"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    assert(out(0L) === ((3L, 4L, 1.5)))
    assert(out(1L) === ((1L, 4L, 0.5)))
    // zero-win item: kept, strength decays toward the 0 fixed point;
    // strengths order by dominance
    val g2 = (Seq.fill(3)((0L, 1L)) ++ Seq((1L, 0L)) ++
      Seq.fill(2)((0L, 2L)) ++ Seq.fill(2)((1L, 2L))).toDF("w", "l")
    val s2 = Classifier.bradleyTerry(g2, col("w"), col("l"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(3))).toMap
    assert(s2(2L)._1 === 0L, "C never wins")
    assert(s2(0L)._2 > s2(1L)._2 && s2(1L)._2 > s2(2L)._2)
    assert(s2(2L)._2 < 0.2, s"zero-win strength should decay: ${s2(2L)}")
    // deterministic under repartitioning (decimal-exact tiny sums)
    assert(rows(Classifier.bradleyTerry(g2.repartition(5), col("w"),
        col("l"))) ===
      rows(Classifier.bradleyTerry(g2, col("w"), col("l"))))
    intercept[IllegalArgumentException](
      Classifier.bradleyTerry(Seq((0L, 0L)).toDF("w", "l")
        .filter(col("w") =!= col("l")), col("w"), col("l")))
  }

  test("calibrationBins: hand-checked deciles, clamping, decimal-exact means") {
    val d = Seq((0.05, 0), (0.15, 0), (0.18, 1), (0.95, 1), (1.0, 1),
      (-0.2, 0), (1.3, 1)).toDF("score", "y")
    val out = Classifier.calibrationBins(d, col("score"), col("y"))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3), r.getDouble(4)))
      .toMap
    assert(out.keySet === Set(0L, 1L, 9L))
    // bin 0 holds 0.05 and the clamped -0.2
    assert(out(0L) === ((2L, -0.075, 0.0, 0.075)))
    assert(out(1L) === ((2L, 0.165, 0.5, 0.335)))
    // bin 9 holds 0.95, the exact 1.0, and the clamped 1.3
    assert(out(9L)._1 === 3L && out(9L)._3 === 1.0)
    assert(out(9L)._2 === math.floor(3.25 / 3 * 1e6 + 0.5) / 1e6)
    // deterministic under repartitioning
    assert(rows(Classifier.calibrationBins(d.repartition(4),
        col("score"), col("y"))) ===
      rows(Classifier.calibrationBins(d, col("score"), col("y"))))
    // NULL score/label rows drop instead of inflating the top bin
    // (floor(null) is null; least/greatest skip nulls → bin nBins-1)
    val withNulls = Seq((Some(0.05), Some(0)), (None, Some(1)),
      (Some(0.95), None)).toDF("score", "y")
    val nOut = Classifier.calibrationBins(withNulls, col("score"), col("y"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(nOut === Map(0L -> 1L))
  }

  test("btCalibration: two-item fixed point calibrates exactly; directed pairs covered") {
    // at the (1.5, 0.5) fixed point, predicted P(A beats B) = 0.75 =
    // the empirical 3/4 — abs_err 0 on both directions
    val g = (Seq.fill(3)((0L, 1L)) :+ ((1L, 0L))).toDF("w", "l")
    val out = Classifier.btCalibration(g, col("w"), col("l"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5),
          r.getDouble(6))).toMap
    assert(out.keySet === Set((0L, 1L), (1L, 0L)))
    assert(out((0L, 1L)) === ((3L, 4L, 0.75, 0.75, 0.0)))
    assert(out((1L, 0L)) === ((1L, 4L, 0.25, 0.25, 0.0)))
  }
}
