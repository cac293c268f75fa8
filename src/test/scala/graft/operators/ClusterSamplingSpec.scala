package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ClusterSamplingSpec extends SparkSpec {
  import spark.implicits._

  // ---- duplicateClusters ----

  private lazy val docs10 = (1L to 10L).toDF("doc_id")

  test("clusters: chain merges to one component labeled by its min id") {
    // 2-3-4 is a chain (diameter 2 — needs >1 propagation round)
    val pairs = Seq((2L, 3L), (3L, 4L), (7L, 9L)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(docs10, "doc_id", pairs)
    val byDoc = out.collect().map(r =>
      r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    assert(byDoc(2L) === ((2L, 3L, true)))
    assert(byDoc(3L) === ((2L, 3L, false)))
    assert(byDoc(4L) === ((2L, 3L, false)))
    assert(byDoc(7L) === ((7L, 2L, true)))
    assert(byDoc(9L) === ((7L, 2L, false)))
    // untouched docs are singleton canonicals
    assert(byDoc(1L) === ((1L, 1L, true)))
    assert(out.count() === 10L)
  }

  test("clusters: two chains joined through a bridge converge (diameter 4)") {
    val pairs = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L)).toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(docs10, "doc_id", pairs)
    val canon = out.filter($"doc_id" <= 5L).select($"canon_id")
      .as[Long].collect().toSet
    assert(canon === Set(1L))
    assert(out.filter($"cluster_size" === 5L).count() === 5L)
  }

  test("star contraction equals hash-min on chains, cliques and random graphs") {
    val docs = (1L to 60L).toDF("doc_id")
    // a 20-node chain (diameter 19 — the case hash-min is slow on),
    // a clique, plus random edges
    val rnd = new scala.util.Random(31)
    val chain = (1L until 20L).map(i => (i, i + 1))
    val clique = for (a <- 21L to 26L; b <- (a + 1) to 26L) yield (a, b)
    val random = (1 to 25).map(_ =>
      (30L + rnd.nextInt(25), 30L + rnd.nextInt(25))).filter(p => p._1 != p._2)
    val pairs = (chain ++ clique ++ random).toDF("a_id", "b_id")
    val a = Dedup.duplicateClusters(docs, "doc_id", pairs, maxIters = 40)
    val b = Dedup.duplicateClustersStar(docs, "doc_id", pairs)
    assert(rows(a) === rows(b))
  }

  test("clusters: empty pair set yields all singletons") {
    val pairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val out = Dedup.duplicateClusters(docs10, "doc_id", pairs)
    assert(out.filter($"is_canonical" && $"cluster_size" === 1L).count() === 10L)
  }

  // ---- sampling ----

  private lazy val ids = (0L until 2000L).toDF("id")
    .withColumn("stratum",
      element_at(array(lit("a"), lit("b"), lit("c")), (col("id") % 3 + 1).cast("int")))

  test("hashSample is deterministic, a filter, and near the asked rate") {
    val s1 = Sampling.hashSample(ids, col("id"), 20)
    val s2 = Sampling.hashSample(ids, col("id"), 20)
    assert(rows(s1) === rows(s2))
    val n = s1.count().toDouble
    assert(n > 2000 * 0.12 && n < 2000 * 0.28, s"rate off: $n/2000")
    // smaller rate selects a SUBSET of the larger (nested samples)
    val s3 = Sampling.hashSample(ids, col("id"), 10)
    assert(rows(s3).subsetOf(rows(s1)))
  }

  test("stratifiedHashSample applies per-stratum rates") {
    val out = Sampling.stratifiedHashSample(ids, col("id"), col("stratum"),
      rates = Map("a" -> 100, "b" -> 0), defaultPct = 30)
    val byStratum = out.groupBy($"stratum").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(byStratum("a") === ids.filter($"stratum" === "a").count())
    assert(!byStratum.contains("b"))
    val c = byStratum("c").toDouble
    val cAll = ids.filter($"stratum" === "c").count().toDouble
    assert(c > cAll * 0.2 && c < cAll * 0.4, s"default rate off: $c/$cAll")
  }

  test("sampling plan: pure predicate, no exchange") {
    val plan = Sampling.hashSample(ids, col("id"), 20)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("mixSample hits the target mix, keeps the binding group, drops others") {
    // 600 a / 300 b / 100 c; target 50/25/25 → c binds (100/0.25=400),
    // expected output ≈ 200 a / 100 b / 100 c; d is not in the target
    val df = ((0L until 600L).map(i => (i, "a")) ++
        (600L until 900L).map(i => (i, "b")) ++
        (900L until 1000L).map(i => (i, "c")) ++
        (1000L until 1050L).map(i => (i, "d")))
      .toDF("id", "g")
    val out = Sampling.mixSample(df, col("id"), col("g"),
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))
    val byG = out.groupBy($"g").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byG.contains("d"), "group outside targetShares must be dropped")
    // binding group kept (floor may shed ≤1-in-resolution)
    assert(byG("c") >= 99L && byG("c") <= 100L, s"binding group: $byG")
    // thinned groups within hash-binomial noise of their quota
    assert(math.abs(byG("a") - 200L) < 40, s"a off target: $byG")
    assert(math.abs(byG("b") - 100L) < 30, s"b off target: $byG")
    // deterministic: same inputs → identical row set
    assert(rows(Sampling.mixSample(df, col("id"), col("g"),
      Map("a" -> 0.5, "b" -> 0.25, "c" -> 0.25))) === rows(out))
    // invalid shares fail loudly
    intercept[IllegalArgumentException] {
      Sampling.mixSample(df, col("id"), col("g"), Map("a" -> 0.5))
    }
  }

  test("weightedSamplePerGroup: per-group k, same priorities as global") {
    val df = (0L until 300L).map(i => (i, if (i % 3 == 0) "a" else "b",
        (i % 7 + 1).toDouble)).toDF("id", "g", "w")
    val out = Sampling.weightedSamplePerGroup(df, Seq("g"), col("id"),
      col("w"), k = 10).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(out.count(_._1 == "a") === 10 && out.count(_._1 == "b") === 10)
    // within each group the selection equals the GLOBAL sampler run on
    // that group alone (same priorities, same ordering)
    for (g <- Seq("a", "b")) {
      val solo = Sampling.weightedSample(df.filter($"g" === g), col("id"),
        col("w"), k = 10).collect()
        .map(r => (r.getLong(0), r.getDouble(1), r.getInt(2))).toSet
      assert(out.filter(_._1 == g).map(r => (r._2, r._3, r._4)).toSet === solo)
    }
    // no window in the plan — bounded-heap aggregate only
    val plan = Sampling.weightedSamplePerGroup(df, Seq("g"), col("id"),
      col("w"), 10).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
  }

  test("mixSample output scan is a broadcast join + narrow filter") {
    val df = (0L until 100L).map(i => (i, if (i % 2 == 0) "a" else "b"))
      .toDF("id", "g")
    val plan = Sampling.mixSample(df, col("id"), col("g"),
        Map("a" -> 0.5, "b" -> 0.5))
      .queryExecution.executedPlan.toString
    // the data-side join must be broadcast — the only exchanges allowed
    // belong to the tiny counts/threshold derivation
    assert(plan.contains("BroadcastHashJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("perGroupCap keeps at most k deterministic rows per group") {
    val df = (0L until 1000L).toDF("id")
      .withColumn("g", (col("id") % 7).cast("long"))
    val a = Sampling.perGroupCap(df, Seq("g"), col("id"), 3)
    val b = Sampling.perGroupCap(df, Seq("g"), col("id"), 3)
    assert(rows(a) === rows(b)) // deterministic
    val per = a.groupBy($"g").count().select($"count").as[Long].collect()
    assert(per.forall(_ === 3L))
    // survivors are the k smallest hashes — growing k nests the sample
    val wide = Sampling.perGroupCap(df, Seq("g"), col("id"), 5)
    assert(rows(a.select($"g", $"id")).subsetOf(rows(wide.select($"g", $"id"))))
  }

  test("perGroupCap fails loudly on an id that can't carry as long") {
    val df = Seq(("g1", "not-a-number"), ("g1", "17")).toDF("g", "sid")
    val ex = intercept[Exception] {
      Sampling.perGroupCap(df, Seq("g"), col("sid"), 1).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(ex).exists(m => m != null && m.contains("perGroupCap")))
  }

  // ---- temperature (power-law) source sampling ----

  test("temperatureSample: exact sqrt quotas, flattening toward small sources, deterministic") {
    // skewed populations: 800 / 200 / 50
    val docs = (0 until 1050).map { k =>
      val src = if (k < 800) "big" else if (k < 1000) "mid" else "small"
      (k.toLong, src)
    }.toDF("doc_id", "src")
    def run(seed: Long, alpha: Double) = Sampling.temperatureSample(
      docs, "doc_id", "src", alpha, unitBudget = 2.0, seed = seed)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val out = run(11L, alpha = 0.5)
    // quotas = floor(2·sqrt(C)): big 56, mid 28, small 14
    assert(out.count(_._2 == "big") === 56)
    assert(out.count(_._2 == "mid") === 28)
    assert(out.count(_._2 == "small") === 14)
    // flattening: selected SHARE of the small source (14/98 ≈ 14%) far
    // exceeds its corpus share (50/1050 ≈ 4.8%); big's shrinks
    // (56/98 ≈ 57% < 800/1050 ≈ 76%)
    val n = out.length.toDouble
    assert(out.count(_._2 == "small") / n > 50.0 / 1050)
    assert(out.count(_._2 == "big") / n < 800.0 / 1050)
    // positions dense per source, ids unique
    out.groupBy(_._2).foreach { case (s, rows0) =>
      assert(rows0.map(_._3).sorted.toSeq ===
        (0L until rows0.length.toLong).toSeq, s)
    }
    assert(out.map(_._1).distinct.length === out.length)
    // same seed bit-reproduces; another seed picks a different set
    assert(run(11L, 0.5).sortBy(_._1).toSeq === out.sortBy(_._1).toSeq)
    assert(run(12L, 0.5).map(_._1).toSet !== out.map(_._1).toSet)
    // α = 1 is proportional: quotas 2·C
    val prop = run(11L, alpha = 1.0)
    assert(prop.count(_._2 == "big") === 1600.min(800)) // capped by population
  }

  // ---- bloom semi join ----

  test("bloomSemiJoin equals plain left-semi and prunes before the join") {
    // spark.range, not a local Seq: ConvertToLocalRelation would fold
    // the bloom predicate into the LocalTableScan and hide it from the
    // plan assertion below
    val big = spark.range(5000).select(col("id").as("k"),
      (col("id") * 2).as("payload"))
    val small = (0L until 5000L).filter(_ % 50 == 0).toDF("k2")
    val out = BloomJoin.bloomSemiJoin(big, small, col("k"), col("k2"),
      expectedItems = 1000L)
    val want = big.join(small, col("k") === col("k2"), "left_semi")
    assert(rows(out) === rows(want))
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("might_contain")) // bloom predicate reached the scan side
  }

  test("leakageSafeSplit: whole clusters move together; singletons match hashSplit") {
    val docs = (1L to 200L).toDF("doc_id")
    // clusters: {1..5}, {10,11}, everything else singleton
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L), (10L, 11L))
      .toDF("a_id", "b_id")
    val clusters = Dedup.duplicateClusters(docs, "doc_id", pairs)
    val out = Sampling.leakageSafeSplit(docs, col("doc_id"), clusters,
      Seq(("train", 80), ("val", 10), ("test", 10)))
    val byDoc = out.select($"doc_id", $"canon_id", $"split")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2))))
      .toMap
    assert(byDoc.size === 200, "exhaustive, one split per doc")
    // the leakage property: every cluster lands entirely in ONE split
    assert(byDoc.values.groupBy(_._1).forall(_._2.map(_._2).toSet.size == 1),
      "a cluster straddles splits")
    assert((1L to 5L).map(byDoc(_)).distinct.size === 1)
    assert(byDoc(10L) === byDoc(11L))
    // singletons (not in any pair) split exactly as plain hashSplit
    val plain = Sampling.hashSplit(docs, col("doc_id"),
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val clustered = Set(1L, 2L, 3L, 4L, 5L, 10L, 11L)
    (1L to 200L).filterNot(clustered).foreach { id =>
      assert(byDoc(id)._2 === plain(id), s"singleton $id diverges")
    }
    // deterministic across invocations
    val again = Sampling.leakageSafeSplit(docs, col("doc_id"), clusters,
      Seq(("train", 80), ("val", 10), ("test", 10)))
    assert(rows(out) === rows(again))
  }

  test("selectByTokenBudget equals the brute-force prefix; boundary doc excluded") {
    // deterministic pseudo-random scores/lengths with heavy ties (the
    // case the block quantization + within-block window must order)
    val rows0 = (1L to 300L).map { i =>
      (i, math.floor((i * 37 % 11) / 10.0 * 1e6) / 1e6, (i * 13 % 40) + 1)
    }
    val df = rows0.toDF("id", "score", "n")
    val budget = 3000L
    val got = Sampling.selectByTokenBudget(df, col("id"), col("score"),
        col("n"), budget)
      .collect().map(r => (r.getLong(0), r.getLong(3))).toMap
    // brute force: sort by (score desc, id), inclusive prefix <= budget
    var cum = 0L
    val want = scala.collection.mutable.Map.empty[Long, Long]
    rows0.sortBy { case (i, s, _) => (-s, i) }.foreach { case (i, _, n) =>
      cum += n
      if (cum <= budget) want(i) = cum
    }
    assert(got === want.toMap)
    // the first doc past the budget is excluded even if a later
    // (smaller) doc would still fit: the selection is a strict prefix
    val ids = rows0.sortBy { case (i, s, _) => (-s, i) }.map(_._1)
    val firstOut = ids.find(!got.contains(_)).get
    assert(ids.dropWhile(got.contains).forall(!got.contains(_)),
      "selection is not a prefix")
    assert(firstOut > 0)
    // scale shape: no window over the whole corpus without a partition
    // key — every corpus-sized Window node must carry partitionBy
    val plan = Sampling.selectByTokenBudget(df, col("id"), col("score"),
      col("n"), budget).queryExecution.optimizedPlan
    val windows = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(windows.exists(_.partitionSpec.nonEmpty),
      "within-block window must be partitioned")
    // the only unpartitioned window runs over the block AGGREGATE
    // (bounded rows), never over the raw corpus: its child must
    // contain an Aggregate
    windows.filter(_.partitionSpec.isEmpty).foreach { w =>
      val agg = w.collect {
        case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
      }
      assert(agg.nonEmpty, "unpartitioned window not over the block aggregate")
    }
  }
}
