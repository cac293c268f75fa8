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
}
