package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DsirSpec extends SparkSpec {
  import spark.implicits._

  // target docs speak vocabulary A; half the raw pool speaks A, the
  // other half speaks a disjoint vocabulary B — DSIR should pull the
  // A-speaking raw docs toward the target and push B away
  private def corpus(n: Int) = (0 until n).map { i =>
    val tgt = i % 4 == 0
    val text =
      if (tgt || i % 2 == 1) "alpha beta gamma alpha delta beta"
      else "omega psi chi tau omega nu psi"
    (i.toLong, text, tgt)
  }.toDF("doc_id", "text", "tgt")

  test("target-like docs get strictly higher log-weights") {
    val w = Dsir.importanceWeights(corpus(40), "doc_id", "text",
        col("tgt"), dim = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val aIds = (0 until 40).filter(i => i % 4 == 0 || i % 2 == 1)
    val bIds = (0 until 40).filterNot(i => i % 4 == 0 || i % 2 == 1)
    val aMin = aIds.map(i => w(i.toLong)).min
    val bMax = bIds.map(i => w(i.toLong)).max
    assert(aMin > bMax)
    assert(w.size === 40)
  }

  test("weights are partitioning-invariant (DECIMAL sums, grid lambda)") {
    val base = corpus(60)
    val a = Dsir.importanceWeights(base.repartition(1), "doc_id", "text",
        col("tgt"), dim = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val b = Dsir.importanceWeights(base.repartition(17), "doc_id", "text",
        col("tgt"), dim = 32)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(a === b)
  }

  test("resample draws k distinct winners ranked by key desc") {
    val r = Dsir.resample(corpus(40), "doc_id", "text", col("tgt"),
        dim = 32, k = 10)
      .collect()
    assert(r.length === 40)
    val winners = r.filter(!_.isNullAt(3))
      .map(x => (x.getInt(3), x.getLong(0), x.getDouble(2)))
      .sortBy(_._1)
    assert(winners.length === 10)
    assert(winners.map(_._1).toSeq === (1 to 10))
    // keys are non-increasing in rank, ties broken by id asc
    winners.sliding(2).foreach { case Array((_, id1, k1), (_, id2, k2)) =>
      assert(k1 > k2 || (k1 == k2 && id1 < id2))
    }
    // losers carry the weight but no key/rank
    assert(r.filter(_.isNullAt(3)).forall(_.isNullAt(2)))
  }

  test("resample key = logw + seeded gumbel, recomputed by hand") {
    import graft.functions.PortableHash
    val r = Dsir.resample(corpus(40), "doc_id", "text", col("tgt"),
        dim = 32, k = 40).collect()
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    r.filter(!_.isNullAt(2)).foreach { row =>
      val id = row.getLong(0)
      val h = id.toString.foldLeft(0L)((a, c) =>
        (a * 31 + c.toInt) % PortableHash.Mod)
      val u = (h + 1).toDouble / (PortableHash.Mod + 2).toDouble
      val g = r6(-math.log(math.max(r6(-math.log(u)), 1e-6)))
      assert(row.getDouble(2) === row.getDouble(1) + g)
    }
  }

  test("token-bearing docs only: empty-text rows vanish from weights") {
    val d = Seq((1L, "alpha beta", true), (2L, "omega", false))
      .toDF("doc_id", "text", "tgt")
      .union(Seq((3L, null.asInstanceOf[String], false))
        .toDF("doc_id", "text", "tgt"))
    val ids = Dsir.importanceWeights(d, "doc_id", "text", col("tgt"),
        dim = 8)
      .collect().map(_.getLong(0)).toSet
    assert(ids === Set(1L, 2L))
  }
}
