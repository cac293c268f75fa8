package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IvfAssignSpec extends SparkSpec {
  import spark.implicits._

  private def corpus(n: Int, dim: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map(i =>
      (i.toLong, Seq.fill(dim)((rnd.nextInt(2001) - 1000) / 1000.0f)))
      .toDF("vec_id", "embedding")
  }

  test("increment assignment agrees with an in-memory argmin at the frozen centroids") {
    val base = corpus(120, 8, seed = 3)
    val index = Similarity.ivfIndex(base, nLists = 4, iters = 2)
    val fresh = corpus(30, 8, seed = 99)
      .withColumn("vec_id", col("vec_id") + 1000L)
    val got = Similarity.ivfAssign(fresh, index)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      .sortBy(_._1)
    val freshLocal = fresh.collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).map(_.toDouble).toArray))
      .sortBy(_._1)
    assert(got.length === freshLocal.length)
    got.zip(freshLocal).foreach { case ((id, cid, dist2), (lid, v)) =>
      assert(id === lid)
      // reference: same partial-d2 + tie rule, then + ||v||^2, round6
      val scored = index.cents.map { case (c, cent) =>
        var dot = 0.0; var cc = 0.0; var vv = 0.0
        for (i <- v.indices) { dot += v(i) * cent(i); cc += cent(i) * cent(i); vv += v(i) * v(i) }
        ((dot * -2.0 + cc, c), vv)
      }
      val best = scored.minBy(_._1)
      assert(cid === best._1._2, s"cid for $id")
      val want = math.floor((best._1._1 + best._2) * 1e6 + 0.5) / 1e6
      assert(dist2 === want, s"dist2 for $id")
    }
  }

  test("assignment of the increment equals a full rebuild's assignment at the same centroids") {
    val base = corpus(100, 6, seed = 11)
    val index = Similarity.ivfIndex(base, nLists = 3, iters = 2)
    // the increment IS part of a bigger corpus; assigning it alone vs
    // assigning everything must agree row-for-row on the shared ids
    val inc = base.filter(col("vec_id") % 7 === 2)
    val alone = Similarity.ivfAssign(inc, index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val full = Similarity.ivfAssign(base, index)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    alone.foreach { case (id, cid) => assert(full(id) === cid) }
  }

  test("plan: the assignment is a zero-shuffle projection over the increment") {
    val base = corpus(40, 4, seed = 5)
    val index = Similarity.ivfIndex(base, nLists = 2, iters = 1)
    val plan = Similarity.ivfAssign(base, index)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
