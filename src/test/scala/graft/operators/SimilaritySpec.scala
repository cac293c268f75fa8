package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cosine similarity + brute-force and LSH top-k. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f)),
    (1L, Seq(0.0f, 1.0f, 0.0f)),   // orthogonal to 0
    (2L, Seq(2.0f, 0.0f, 0.0f)),   // parallel to 0
    (3L, Seq(1.0f, 1.0f, 0.0f))    // 45° to 0
  ).toDF("vec_id", "embedding")

  test("cosine: parallel=1, orthogonal=0, 45°=√2/2") {
    val sims = vecs.filter($"vec_id" =!= 0)
      .crossJoin(vecs.filter($"vec_id" === 0).select($"embedding".as("q")))
      .select($"vec_id", round(Similarity.cosine($"q", $"embedding"), 6).as("s"))
      .as[(Long, Double)].collect().toMap
    assert(sims(2L) == 1.0)
    assert(sims(1L) == 0.0)
    assert(approx(sims(3L), math.sqrt(2) / 2, 1e-5))
  }

  test("brute-force top-k ranks by similarity desc, id asc") {
    val out = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2).toSeq == Seq(2L, 3L)) // parallel first, then 45°
    assert(out.map(_._4).toSeq == Seq(1, 2))
  }

  test("LSH top-k returns only same-bucket candidates with correct sims") {
    val out = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0), k = 3, nPlanes = 2)
      .as[(Long, Long, Double, Int)].collect()
    // recall may be < 1, but anything returned must carry the true cosine
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 3)
      .select($"n_id", $"sim").as[(Long, Double)].collect().toMap
    out.foreach { case (_, n, s, _) => assert(brute(n) == s) }
  }
}
