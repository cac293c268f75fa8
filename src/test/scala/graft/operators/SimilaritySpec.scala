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

  test("IVF top-k: clustered corpus, exact sims, high recall on planted clusters") {
    val rnd = new scala.util.Random(7)
    // two tight clusters far apart + noise dims
    def near(base: Array[Float]) = base.map(x => x + rnd.nextFloat() * 0.05f)
    val c1 = Array(10f, 0f, 0f, 0f)
    val c2 = Array(0f, 10f, 0f, 0f)
    val data = (0 until 20).map(i => (i.toLong, near(c1).toSeq)) ++
      (20 until 40).map(i => (i.toLong, near(c2).toSeq))
    val corpus = data.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id".isin(0L, 20L))
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3, nLists = 4, nProbe = 2)
      .as[(Long, Long, Double, Int)].collect()
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select($"q_id", $"n_id", $"sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // every returned sim is the exact cosine
    ivf.foreach { case (q, n, s, _) => assert(brute((q, n)) == s) }
    // neighbors of query 0 come from cluster 1, of query 20 from cluster 2
    ivf.foreach { case (q, n, _, _) =>
      if (q == 0L) assert(n < 20) else assert(n >= 20)
    }
    assert(ivf.count(_._1 == 0L) == 3 && ivf.count(_._1 == 20L) == 3)
  }

  test("IVF with sampled quantizer training: exact sims, clusters still found") {
    val rnd = new scala.util.Random(7)
    def near(base: Array[Float]) = base.map(x => x + rnd.nextFloat() * 0.05f)
    val c1 = Array(10f, 0f, 0f, 0f)
    val c2 = Array(0f, 10f, 0f, 0f)
    val data = (0 until 40).map(i =>
      (i.toLong, (if (i % 2 == 0) near(c1) else near(c2)).toSeq))
    val corpus = data.toDF("vec_id", "embedding")
    val queries = corpus.filter($"vec_id".isin(0L, 1L))
    // train on 1/4 of the corpus; assign + search over all of it
    val ivf = Similarity.ivfTopK(corpus, queries, k = 3, nLists = 4,
      nProbe = 2, trainSampleMod = 4).as[(Long, Long, Double, Int)].collect()
    val brute = Similarity.bruteForceTopK(corpus, queries, k = 3)
      .select($"q_id", $"n_id", $"sim").as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    ivf.foreach { case (q, n, s, _) => assert(brute((q, n)) == s) }
    // even-id query stays in the even (c1) cluster, odd in c2
    ivf.foreach { case (q, n, _, _) => assert(n % 2 == q % 2) }
    assert(ivf.count(_._1 == 0L) == 3 && ivf.count(_._1 == 1L) == 3)
  }

  test("LSH near-dup pairs ⊆ exact pairs with identical sims; bucket-complete") {
    val rnd = new scala.util.Random(11)
    val base = (0 until 60).map(_ => Seq.fill(16)(rnd.nextFloat() - 0.5f))
    val data = base.zipWithIndex.map { case (v, i) => (i.toLong, v) } ++
      (60 until 70).map { i => // planted near-dups of vector 0
        (i.toLong, base.head.map(x => x + rnd.nextFloat() * 0.01f))
      }
    val corpus = data.toDF("vec_id", "embedding")
    val exact = Similarity.nearDupPairs(corpus, threshold = 0.3)
      .as[(Long, Long, Double)].collect().toSet
    val lsh = Similarity.nearDupPairsLsh(corpus, threshold = 0.3, nPlanes = 4)
      .as[(Long, Long, Double)].collect().toSet
    assert(lsh.subsetOf(exact)) // same sim values, candidates only pruned
    assert(lsh.nonEmpty)
    // planted near-dups are nearly parallel → same sign bits → found
    assert(lsh.exists { case (a, b, _) => a == 0L && b >= 60L })
  }

  test("LSH top-k returns only same-bucket candidates with correct sims") {
    val out = Similarity.lshTopK(vecs, vecs.filter($"vec_id" === 0), k = 3, nPlanes = 2)
      .as[(Long, Long, Double, Int)].collect()
    // recall may be < 1, but anything returned must carry the true cosine
    val brute = Similarity.bruteForceTopK(vecs, vecs.filter($"vec_id" === 0), k = 3)
      .select($"n_id", $"sim").as[(Long, Double)].collect().toMap
    out.foreach { case (_, n, s, _) => assert(brute(n) == s) }
  }

  test("PQ: codebook shape, deterministic output, clusters separated") {
    val rnd = new scala.util.Random(13)
    def near(base: Array[Float]) = base.map(x => x + rnd.nextFloat() * 0.1f)
    val c1 = Array.fill(16)(5f);  c1(0) = 20f
    val c2 = Array.fill(16)(-5f); c2(8) = -20f
    val data = (0 until 30).map(i => (i.toLong, near(c1).toSeq)) ++
      (30 until 60).map(i => (i.toLong, near(c2).toSeq))
    val corpus = data.toDF("vec_id", "embedding")
    val books = Similarity.pqCodebooks(corpus, m = 4, ksub = 8, iters = 2)
    assert(books.length == 4)
    assert(books.forall(b => b.length == 8 && b.forall(_.length == 4)))
    val qs = corpus.filter($"vec_id".isin(0L, 30L))
    val a = Similarity.pqTopK(corpus, qs, k = 5, m = 4, ksub = 8, iters = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val b = Similarity.pqTopK(corpus, qs, k = 5, m = 4, ksub = 8, iters = 2)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(a.toSeq == b.toSeq) // reproducible end-to-end
    // ADC distances are coarse, but cluster separation must survive
    a.foreach { case (q, n, _, _) =>
      if (q == 0L) assert(n < 30) else assert(n >= 30)
    }
    assert(a.count(_._1 == 0L) == 5 && a.count(_._1 == 30L) == 5)
  }

  test("IVF+PQ with every list probed degenerates to plain PQ") {
    val rnd = new scala.util.Random(7)
    val data = (0 until 80).map(i =>
      (i.toLong, Array.fill(16)(rnd.nextFloat() * 4 - 2).toSeq))
    val corpus = data.toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" < 3)
    val full = Similarity.ivfPqTopK(corpus, qs, k = 5,
        nLists = 4, nProbe = 4, m = 4, ksub = 8)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val pq = Similarity.pqTopK(corpus, qs, k = 5, m = 4, ksub = 8)
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(full.toSeq == pq.toSeq)
    // a real probe restriction returns a subset of each query's PQ view
    val pruned = Similarity.ivfPqTopK(corpus, qs, k = 5,
        nLists = 4, nProbe = 1, m = 4, ksub = 8)
      .as[(Long, Long, Double, Int)].collect()
    assert(pruned.nonEmpty)
    val pqPairs = Similarity.pqTopK(corpus, qs, k = 80, m = 4, ksub = 8)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    pruned.foreach { case (q, n, d, _) => assert(pqPairs((q, n)) == d) }
  }

  test("recallAtK: self-comparison is 1.0, zero-overlap queries report 0") {
    val rnd = new scala.util.Random(11)
    val corpus = (0 until 60).map(i =>
        (i.toLong, Array.fill(8)(rnd.nextFloat() * 2 - 1).toSeq))
      .toDF("vec_id", "embedding")
    val qs = corpus.filter($"vec_id" < 4)
    val exact = Similarity.bruteForceTopK(corpus, qs, k = 5)
    // identical inputs → recall 1.0 for every query
    val self = Similarity.recallAtK(exact, exact, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(self.length === 4 && self.forall(r => r._2 == 5L && r._3 == 1.0))
    // an approx table missing one query entirely → that query still
    // appears, with hits 0
    val partial = Similarity.recallAtK(exact,
      exact.filter($"q_id" =!= 0L), k = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(partial(0L) === 0L && partial(1L) === 5L)
    // probe-pruned IVF recall is in (0, 1] and k-bounded
    val approx = Similarity.ivfTopK(corpus, qs, k = 5,
      nLists = 4, nProbe = 1)
    val r = Similarity.recallAtK(exact, approx, k = 5).collect()
      .map(x => x.getLong(1)).toSeq
    assert(r.forall(h => h >= 0L && h <= 5L))
  }

  test("residual IVF+PQ beats non-residual recall at the same bytes") {
    // clustered corpus with large inter-cluster offsets and small local
    // structure: plain PQ spends its codewords re-encoding the offsets
    // the coarse quantizer already removed (whole clusters collapse to
    // one code → within-cluster ranking degenerates to id order), while
    // residual books quantize the local structure — the Faiss IVFPQ
    // rationale, measured as recall@10 against exact L2 neighbors
    val dim = 8
    val rnd = new scala.util.Random(7)
    val data = (0 until 200).map { i =>
      val c = i % 4
      (i.toLong, Array.tabulate(dim)(d =>
        (if (d == c * 2) 100.0 else 0.0) + rnd.nextDouble() * 2 - 1))
    }
    val df = data.map { case (id, v) => (id, v.toSeq) }.toDF("vec_id", "embedding")
    val cents = Similarity.ivfCentroids(df, nLists = 4, iters = 3)
    val plainBooks = Similarity.pqCodebooks(df, m = 4, ksub = 8)
    val resBooks = Similarity.pqCodebooksResidual(df, cents, m = 4, ksub = 8)
    val queries = df.filter(col("vec_id") < 8)
    def d2(a: Array[Double], b: Array[Double]): Double =
      a.zip(b).map { case (x, y) => (x - y) * (x - y) }.sum
    def recall(out: Array[(Long, Long)]): Double = {
      val byQ = out.groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
      val qs = data.filter(_._1 < 8)
      qs.map { case (qid, qv) =>
        val exact = data.filter(_._1 != qid)
          .map { case (nid, nv) => (d2(qv, nv), nid) }
          .sorted.take(10).map(_._2).toSet
        byQ.getOrElse(qid, Set.empty[Long]).intersect(exact).size / 10.0
      }.sum / qs.size
    }
    val plain = Similarity.ivfPqTopK(df, queries, k = 10, cents, plainBooks,
      nProbe = 2, "vec_id", "embedding")
      .select("q_id", "n_id").as[(Long, Long)].collect()
    val res = Similarity.ivfPqResidualTopK(df, queries, k = 10, cents,
      resBooks, nProbe = 2, "vec_id", "embedding")
      .select("q_id", "n_id").as[(Long, Long)].collect()
    val (rPlain, rRes) = (recall(plain), recall(res))
    info(f"recall@10: plain=$rPlain%.2f residual=$rRes%.2f")
    assert(rRes > rPlain, s"residual $rRes should beat plain $rPlain")
    assert(rRes >= 0.5)
  }

  test("semDedup: keep-min-id inside clusters, cross-cluster dups survive") {
    // two tight clusters on orthogonal axes; ids interleave so keep-
    // min-id is visible. 0/2/4 ~ x-axis (near-identical), 1/3 ~ y-axis.
    val corpus = Seq(
      (0L, Seq(1.0f, 0.01f)), (2L, Seq(1.0f, 0.02f)), (4L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f)), (3L, Seq(0.01f, 1.0f))
    ).toDF("vec_id", "embedding")
    val cents = IndexedSeq(
      (0L, Array(1.0, 0.0)), (1L, Array(0.0, 1.0)))
    val out = Similarity.semDedup(corpus, cents, threshold = 0.95)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
    assert(out(0L) === ((0L, true)))  // min id of x-cluster: kept
    assert(out(2L) === ((0L, false))) // near-dup of 0 → dropped
    assert(out(4L) === ((0L, false)))
    assert(out(1L) === ((1L, true)))  // min id of y-cluster: kept
    assert(out(3L) === ((1L, false)))
    // below-threshold cluster-mates all survive
    val loose = Similarity.semDedup(corpus, cents, threshold = 0.9999999)
      .filter(col("kept")).count()
    assert(loose === 5L)
  }

  test("semDedup: adversarial all-identical corpus completes — zero pairs") {
    // 20,000 identical embeddings in one cluster: the old intra-cluster
    // quadratic would build ~2e8 pairs; the exact-duplicate collapse
    // reduces the pairwise stage to ONE representative (zero pairs) and
    // the keep-min-id answer is unchanged
    val n = 20000
    val df = spark.range(n).select(col("id").as("vec_id"),
      array(lit(1.0f), lit(2.0f), lit(3.0f)).as("embedding"))
    val cents = Seq((0L, Array(1.0, 2.0, 3.0)), (1L, Array(-1.0, -2.0, -3.0)))
    val out = Similarity.semDedup(df, cents, threshold = 0.9)
    assert(out.filter(col("kept")).select("id").as[Long].collect().toSeq
      === Seq(0L))
    assert(out.count() === n.toLong)
  }

  test("IVF list-share guard trips on a degenerate one-list corpus") {
    // every vector lands in centroid 0's list: nProbe pruning is
    // worthless and each probing query would scan the whole corpus —
    // the plan must fail fast with the raise-nLists message. 20k rows
    // so the 1/16 hash-sample clears the 256-row floor.
    val df = spark.range(20000).select(col("id").as("vec_id"),
      array(lit(5.0f), lit(5.0f)).as("embedding"))
    val cents = IndexedSeq((0L, Array(5.0, 5.0)), (1L, Array(-5.0, -5.0)))
    val qs = Seq((999999L, Seq(5.0f, 4.9f))).toDF("vec_id", "embedding")
    val e = intercept[Exception] {
      Similarity.ivfTopK(df, qs, k = 3, cents, nProbe = 1,
        "vec_id", "embedding").collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("Raise nLists"))
    // explicitly accepting the scan cost completes
    assert(Similarity.ivfTopK(df, qs, k = 3, cents, nProbe = 1,
      "vec_id", "embedding", maxListShare = 1.0).count() === 3L)
  }

  test("IvfIndex: build-time stats trip the guard at plan CONSTRUCTION, no in-plan aggregate") {
    // same degenerate corpus as above, but through the validated-index
    // path: the stats were measured at build time, so the search
    // overload must throw from the driver-side require BEFORE any
    // action — and a healthy index's search plan must carry no
    // assert_true guard scaffolding at all
    val df = spark.range(20000).select(col("id").as("vec_id"),
      array(lit(5.0f), lit(5.0f)).as("embedding"))
    val idx = Similarity.ivfIndex(df, nLists = 2, iters = 1)
    assert(idx.sampledMaxList > 256L &&
      idx.sampledMaxList === idx.sampledTotal) // all mass in one list
    val qs = Seq((999999L, Seq(5.0f, 4.9f))).toDF("vec_id", "embedding")
    val e = intercept[IllegalArgumentException] {
      Similarity.ivfTopK(df, qs, k = 3, idx, nProbe = 1,
        "vec_id", "embedding") // no .collect(): construction-time trip
    }
    assert(e.getMessage.contains("Raise nLists"))
    // accepting the share completes, and the plan is guard-free
    val ok = Similarity.ivfTopK(df, qs, k = 3, idx, nProbe = 1,
      "vec_id", "embedding", maxListShare = 1.0)
    assert(!ok.queryExecution.executedPlan.toString.contains("assert_true"))
    assert(ok.count() === 3L)
  }

  test("semDedup: duplicate zero-norm vectors are all kept (cosine undefined)") {
    // Cosine of a zero vector is 0/0 — NaN here, NULL in the SQL
    // oracle — so zero-norm rows must never be dropped: neither by the
    // exact-duplicate collapse (which infers cosine 1.0 without
    // computing it) nor by the pairwise stage (where Spark's
    // NaN-is-greatest ordering would satisfy >= threshold).
    val corpus = Seq(
      (0L, Seq(0.0f, 0.0f)), (1L, Seq(0.0f, 0.0f)), (2L, Seq(0.0f, 0.0f)),
      (3L, Seq(1.0f, 0.0f)), (4L, Seq(1.0f, 0.0f))
    ).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(1.0, 0.0)), (1L, Array(-1.0, 0.0)))
    val out = Similarity.semDedup(corpus, cents, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(out(0L) && out(1L) && out(2L),
      "zero-norm duplicates must all be kept")
    assert(out(3L) && !out(4L), "normal duplicates still collapse")
  }

  test("semDedup: skew guard trips on a distinct-vector mega-cluster") {
    // 300 DISTINCT vectors nearest one centroid: share 300/302 > 0.5
    // and above the 256-rep floor → the plan must fail fast with the
    // raise-nLists message instead of running an effective all-pairs
    val big = (0 until 300).map(i => (i.toLong, Seq(10.0 + i * 1e-4, 0.0)))
    val small = Seq((1000L, Seq(-10.0, 0.0)), (1001L, Seq(-10.0, 1.0)))
    val df = (big ++ small).toDF("vec_id", "embedding")
    val cents = Seq((0L, Array(10.0, 0.0)), (1L, Array(-10.0, 0.0)))
    val e = intercept[Exception] {
      Similarity.semDedup(df, cents, threshold = 0.99).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("Raise nLists"))
    // explicitly accepting the cost completes
    assert(Similarity.semDedup(df, cents, threshold = 0.99,
      maxClusterShare = 1.0).count() === 302L)
  }

  test("hardNegatives: no positives, sim capped, dense ranks; IVF form matches exact at full probe") {
    // 3 labels × near-duplicate pairs: each query's nearest neighbor
    // is its same-label twin (must be excluded) and its second-nearest
    // an above-cap near-dup of a DIFFERENT label (must be capped away)
    val vecs = (0L until 60L).map { i =>
      val lab = (i % 3).toInt
      val base = Array.tabulate(8)(d =>
        math.cos((i / 3 + 1).toDouble * (d + 1)).toFloat)
      (i, base.toSeq, lab)
    }.toDF("vec_id", "embedding", "label")
    val queries = vecs.filter($"vec_id" < 6)
    val got = Similarity.hardNegatives(vecs, queries, k = 4,
      posCol = "label", maxSim = 0.999).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(got.nonEmpty)
    val labOf = (0L until 60L).map(i => i -> (i % 3).toInt).toMap
    got.foreach { case (q, n, sim, _) =>
      assert(labOf(q) !== labOf(n), s"positive leaked: $q -> $n")
      assert(sim <= 0.999, s"cap violated: $q -> $n sim=$sim")
      assert(q !== n)
    }
    got.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._4).sorted === (1 to rs.length).toSeq,
        s"query $q ranks not dense")
      assert(rs.length <= 4)
    }
    // the same-label twin (i±3 with identical base) must never appear
    // even though it is the global nearest
    // IVF path with every list probed and generous over-fetch = exact
    val idx = Similarity.ivfIndex(vecs, nLists = 4, iters = 2)
    val ivf = Similarity.hardNegativesIvf(vecs, queries, k = 4,
      idx, nProbe = 4, overFetch = 56, posCol = "label", maxSim = 0.999)
    assert(rows(ivf) === rows(Similarity.hardNegatives(vecs, queries,
      k = 4, posCol = "label", maxSim = 0.999)))
  }

  test("embeddingDecontaminate: benchmark members and scaled copies die, orthogonal survives") {
    val bench = Seq(
      (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Seq(0.0f, 1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val corpus = (bench.collect().map(r =>
        (r.getLong(0), r.getSeq[Float](1))).toSeq ++ Seq(
        (10L, Seq(2.0f, 0.0f, 0.0f, 0.0f)),   // scaled copy: cos = 1
        (11L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),   // near bench 0
        (12L, Seq(0.0f, 0.0f, 1.0f, 0.0f))))  // orthogonal to both
      .toDF("vec_id", "embedding")
    val got = Similarity.embeddingDecontaminate(corpus, bench, 0.9)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(1), r.getBoolean(2)))).toMap
    assert(got.keySet === Set(0L, 1L, 10L, 11L, 12L))
    assert(got(0L) === ((1.0, true)) && got(1L) === ((1.0, true)))
    assert(got(10L) === ((1.0, true)), "scale-invariant copy must die")
    assert(got(11L)._2 && got(11L)._1 > 0.9 && got(11L)._1 < 1.0)
    assert(got(12L) === ((0.0, false)), "orthogonal vector survives")
    // EMPTY benchmark = nothing to be contaminated by: every corpus
    // vector verdicts false at the −1 sentinel (the inner-join form
    // returned zero rows and a !contaminated filter dropped everything)
    val none = Similarity.embeddingDecontaminate(
        corpus, bench.limit(0), 0.9)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2)))
    assert(none.length === 5)
    none.foreach { case (_, ms, c) => assert(ms === -1.0 && !c) }
  }

  test("matryoshkaRecall: prefix-loaded signal keeps recall 1, tail-loaded loses it") {
    def clusterVec(i: Int, lead: Boolean): Seq[Float] = {
      val th = (i % 4) * 0.7
      val (a, b) = (math.cos(th).toFloat, math.sin(th).toFloat)
      if (lead) Seq(a, b) ++ Seq.fill(6)(0f)
      else Seq(1f, 0f) ++ Seq.fill(4)(0f) ++ Seq(a, b)
    }
    def run(lead: Boolean) = {
      val e = (0 until 20).map(i => (i.toLong, clusterVec(i, lead)))
        .toDF("vec_id", "embedding")
      Similarity.matryoshkaRecall(e, e.filter(col("vec_id") < 8),
          k = 5, dims = Seq(2))
        .collect().map(r => r.getDouble(3))
    }
    // signal entirely in the first two dims: truncation changes no
    // cosine (zeros contribute nothing), ranking identical, recall 1
    run(lead = true).foreach(r => assert(r === 1.0))
    // signal entirely in the tail: every 2-prefix is the same vector,
    // ranking degenerates to id order — recall must drop
    val tail = run(lead = false)
    assert(tail.sum / tail.length < 0.9)
  }

  test("semDedupAdmit: corpus near-dups and higher-id batch twins die, novel vectors admit") {
    val corpus = (0 until 10).flatMap { m =>
      Seq((m.toLong * 2, Seq(10f + m * 0.01f, 0f, 0f, 0f)),
        (m.toLong * 2 + 1, Seq(0f, 10f + m * 0.01f, 0f, 0f)))
    }.toDF("vec_id", "embedding")
    val batch = Seq(
      (100L, Seq(10.5f, 0f, 0f, 0f)),   // ~parallel to cluster A -> dies vs corpus
      (101L, Seq(0f, 0f, 10f, 0.1f)),   // novel direction, LOWER id -> admitted
      (102L, Seq(0f, 0f, 10f, 0.1f)),   // identical twin, higher id -> election kills
      (103L, Seq(0f, 10.2f, 0f, 0f)),   // ~parallel to cluster B -> dies vs corpus
      (104L, Seq(0f, 0f, 0f, 10f)))     // orthogonal to everything -> admitted
      .toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(corpus, nLists = 2, iters = 2)
    val got = Similarity.semDedupAdmit(corpus, batch, idx, threshold = 0.9)
      .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
    assert(got === Map(100L -> false, 101L -> true, 102L -> false,
      103L -> false, 104L -> true))
  }

  test("prototypePrune: keeps the hardest tail of each cluster at the quantile cut") {
    // two tight clusters with a planted QUADRATIC offset ladder —
    // asymmetric around the cluster mean, so every member's distance
    // to the learned prototype is distinct (a linear ladder pairs up
    // symmetrically around the mean and ties the cut)
    val data = (0 until 10).flatMap { m =>
      Seq((m.toLong * 2, Seq(10f + m * m * 0.01f, 0f, 0f, 0f)),
        (m.toLong * 2 + 1, Seq(0f, 10f + m * m * 0.01f, 0f, 0f)))
    }.toDF("vec_id", "embedding")
    val idx = Similarity.ivfIndex(data, nLists = 2, iters = 2)
    val got = Similarity.prototypePrune(data, idx, keepFrac = 0.4)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getBoolean(4)))
    assert(got.length === 20)
    got.groupBy(_._2).foreach { case (_, members) =>
      assert(members.length === 10)
      val kept = members.filter(_._5).map(_._3)
      val dropped = members.filterNot(_._5).map(_._3)
      // the kept set is exactly the dist2-largest tail
      assert(kept.nonEmpty && dropped.nonEmpty)
      assert(kept.min >= dropped.max)
      // thr = the interpolated 0.6 quantile, and the cut honors it
      val thr = members.head._4
      assert(members.forall(m => m._5 === (m._3 >= thr)))
      // keepFrac 0.4 over 10 members -> 4 survivors at the quantile cut
      assert(kept.length === 4)
    }
  }
}
