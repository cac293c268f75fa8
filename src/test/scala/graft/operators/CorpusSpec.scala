package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusSpec extends SparkSpec {
  import spark.implicits._

  // trigrams of "a b c d" = {a_b_c, b_c_d}
  private lazy val corpus = Seq(
    (1L, "a b c d"),     // shares a_b_c, b_c_d with bench doc 0
    (2L, "x y z w"),     // shares nothing
    (3L, "a b c q"),     // shares a_b_c only
    (4L, "a b")          // too short for a trigram — excluded
  ).toDF("doc_id", "text")
  private lazy val bench = Seq((0L, "a b c d e")).toDF("doc_id", "text")

  test("decontaminate counts distinct shared n-grams, skips clean docs") {
    val out = Corpus.decontaminate(corpus, bench, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 2L, 3L -> 1L))
  }

  test("boilerplate ratio counts corpus-frequent shingles per doc") {
    // a_b_c appears in docs 1, 3, 5 → df 3 ≥ 3; everything else df < 3
    val d = corpus.union(Seq((5L, "a b c z")).toDF("doc_id", "text"))
    val out = Corpus.boilerplateRatio(d, "doc_id", "text", n = 3, minDf = 3)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(out(1L) === ((2L, 1L)))  // {a_b_c, b_c_d}, frequent: a_b_c
    assert(out(2L) === ((2L, 0L)))
    assert(out(3L) === ((2L, 1L)))
    assert(!out.contains(4L))       // no shingles → no row
  }

  test("repetition stats: dup-ngram ratio and top-token share") {
    val d = Seq(
      (1L, "a a a a a"),     // trigrams all "a_a_a": dup ratio 1-1/3; top tok 5/5
      (2L, "a b c d e"),     // all distinct: dup ratio 0; top 1/5
      (3L, "x y")            // no trigrams: ratio 0 by convention
    ).toDF("doc_id", "text")
    val out = Corpus.repetitionStats(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getDouble(2), r.getDouble(3)))).toMap
    assert(out(1L)._1 === 5)
    assert(approx(out(1L)._2, math.floor((1.0 - 1.0 / 3.0) * 1e6 + 0.5) / 1e6))
    assert(approx(out(1L)._3, 1.0))
    assert(out(2L) === ((5, 0.0, 0.2)))
    assert(out(3L) === ((2, 0.0, 0.5)))
  }

  test("repetition kernel ≡ replaced HOF formulation on long + edge documents") {
    import graft.functions.TextFunctions
    // long documents are exactly what the O(distinct·tokens) HOF choked
    // on; include empties, multi-space runs, '_' inside tokens (gram
    // equality is on the JOINED string — by contract) and a trailing
    // space (split keeps the trailing empty token)
    val long1 = (1 to 5000).map(i => s"tok${i % 97}").mkString(" ")
    val long2 = ("lorem ipsum dolor sit amet " * 800).trim
    val d = (Seq(long1, long2) ++ Seq("", "solo", "a_b c", "x  y", "trail "))
      .zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = Corpus.repetitionStats(d, "doc_id", "text", n = 3)
    val toks = split(col("text"), " ")
    val grams = when(size(toks) < 3, array().cast("array<string>")).otherwise(
      transform(sequence(lit(1), size(toks) - 2), i => concat_ws("_",
        element_at(toks, i), element_at(toks, i + 1), element_at(toks, i + 2))))
    val topTok = array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t))))
    val ref = d.select(col("doc_id"),
      size(toks).as("n_tokens"),
      TextFunctions.round6(when(size(grams) > 0,
        lit(1.0) - size(array_distinct(grams)).cast("double") /
          size(grams).cast("double")).otherwise(lit(0.0))).as("dup_ngram_ratio"),
      TextFunctions.round6(topTok.cast("double") / size(toks).cast("double"))
        .as("top_token_ratio"))
    assert(rows(kernel) === rows(ref))
  }

  test("lm score: typical text scores lower nll than anomalous text") {
    // corpus dominated by the "p q" pattern; one doc of singleton junk
    val d = ((1L to 20L).map(i => (i, "p q p q p q")) :+
      (99L, "zk1 zk2 zk3 zk4 zk5 zk6")).toDF("doc_id", "text")
    val out = Corpus.lmScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out(1L)._1 === 5) // 6 tokens → 5 bigrams
    assert(out(99L)._1 === 5)
    assert(out(1L)._2 < out(99L)._2) // frequent pattern ≪ singleton junk
    // identical docs score identically (deterministic, order-free sum)
    assert(out(1L) === out(20L))
  }

  test("qualitySignals: column-identical to the standalone queries, zero-exchange plan") {
    val d = Seq(
      (1L, "the quick brown fox jumps over the lazy dog and the fox"),
      (2L, "der der der der der der der der"),
      (3L, "- bullet line\n- another bullet\nplain text here..."))
      .toDF("doc_id", "text")
    val got = Corpus.qualitySignals(d, "doc_id", "text")
    // identity against the standalone operators/kernels
    val st = graft.functions.TextKernels.text_stats(col("text"),
      graft.functions.TextFunctions.LangProfiles("en"))
    val q20 = d.select(col("doc_id"), st.getField("ws_tokens").as("ws_tokens"),
        st.getField("re_tokens").as("re_tokens"),
        st.getField("quality").as("quality"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(1), r.getInt(2), r.getDouble(3)))).toMap
    val q56 = Corpus.repetitionStats(d, "doc_id", "text", n = 3)
      .collect().map(r => r.getLong(0) ->
        ((r.getDouble(2), r.getDouble(3)))).toMap
    val q131 = Corpus.gopherQualityGate(d, col("doc_id"), col("text"))
      .collect().map(r => r.getLong(0) ->
        ((r.getInt(8), r.getBoolean(9)))).toMap
    got.collect().foreach { r =>
      val id = r.getLong(0)
      assert((r.getInt(2), r.getInt(3), r.getDouble(4)) === q20(id))
      assert((r.getDouble(7), r.getDouble(8)) === q56(id))
      assert((r.getInt(16), r.getBoolean(17)) === q131(id))
    }
    // plan: one scan-side pass — no Exchange anywhere
    val plan = got.queryExecution.executedPlan
    assert(plan.collect {
      case e: org.apache.spark.sql.execution.exchange.Exchange => e
    }.isEmpty, plan.toString)
  }

  test("distinctNgramRatios: hand-checked distinct-1/2/3 per source, short docs excluded per n") {
    val d = Seq((1L, "x x y", "a"), (2L, "x", "a"), (3L, "z z z z", "b"))
      .toDF("doc_id", "text", "source")
    val out = Corpus.distinctNgramRatios(d, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(("a", 1L)) === ((4L, 2L, 0.5)))
    assert(out(("a", 2L)) === ((2L, 2L, 1.0)))   // doc 2 too short for n=2
    assert(out(("a", 3L)) === ((1L, 1L, 1.0)))
    assert(out(("b", 1L)) === ((4L, 1L, 0.25)))
    assert(out(("b", 2L)) === ((3L, 1L, 0.333333)))
    assert(out(("b", 3L)) === ((2L, 1L, 0.5)))
    assert(out.size === 6)
  }

  test("distinctNgramRatios: bucket-split passes are bit-identical to the single pass") {
    // enough docs that every pass sees grams; force the self-sizing
    // rule past its ceiling (1 byte/partition, ceiling 2) so the
    // exchange splits into multiple disjoint gram-hash bucket passes
    val d = (1L to 40L).map(i =>
        (i, s"t${i % 7} t${(i * 3) % 11} t${(i * 5) % 13} t${i % 4}",
          s"s${i % 3}"))
      .toDF("doc_id", "text", "source")
    val single = Corpus.distinctNgramRatios(d, "doc_id", "text", "source")
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val conf = spark.conf
    conf.set("spark.graft.distinctN.bytesPerPartition", "512")
    conf.set("spark.graft.distinctN.widthCeiling", "2")
    try {
      // the forced sizing must actually engage the split path
      val (w, p) = Corpus.distinctNWidthPlan(d)
      assert(w === 2 && p > 1, s"width=$w passes=$p")
      val split = Corpus.distinctNgramRatios(d, "doc_id", "text", "source")
        .collect().map(r => (r.getString(0), r.getLong(1)) ->
          (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
      // distinct counts ADD exactly across disjoint hash buckets —
      // the multi-pass result is the single-pass result, bit for bit
      assert(split === single)
    } finally {
      conf.unset("spark.graft.distinctN.bytesPerPartition")
      conf.unset("spark.graft.distinctN.widthCeiling")
    }
  }

  test("distinctNgramRatios: space joiner keeps boundary-ambiguous grams distinct") {
    // ["ab","c"] vs ["a","bc"]: a separator-free (or in-token-byte)
    // join would alias the two 2-grams into one hash
    val d = Seq((1L, "ab c", "s"), (2L, "a bc", "s")).toDF("doc_id", "text", "source")
    val out = Corpus.distinctNgramRatios(d, "doc_id", "text", "source",
        ns = Seq(2))
      .collect().map(r => (r.getLong(2), r.getLong(3))).head
    assert(out === ((2L, 2L)))
  }

  test("distinctNgramRatiosSketch: exact below k, estimate near truth and partition-invariant") {
    val d = Seq((1L, "x x y", "a"), (2L, "x", "a"), (3L, "z z z z", "b"))
      .toDF("doc_id", "text", "source")
    // k far above the gram cardinality → the sketch IS the exact count
    val small = Corpus.distinctNgramRatiosSketch(d, "doc_id", "text",
        "source", k = 64)
      .collect().map(r => (r.getString(0), r.getLong(1)) ->
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(small(("a", 1L)) === ((4L, 2.0, 0.5)))
    assert(small(("a", 2L)) === ((2L, 2.0, 1.0)))
    assert(small(("b", 3L)) === ((2L, 1.0, 0.5)))
    assert(small.size === 6)
    // above k: 1000 distinct unigrams through a k=128 sketch — the
    // order-statistic estimate lands within ~5·(1/√(k−2)) of truth,
    // and the k smallest distinct hashes are partitioning-invariant
    val big = spark.range(2000)
      .selectExpr("id AS doc_id", "concat('w', id % 1000) AS text",
        "'s' AS source")
    def run(df: org.apache.spark.sql.DataFrame) =
      Corpus.distinctNgramRatiosSketch(df, "doc_id", "text", "source",
        ns = Seq(1), k = 128).collect().map(r =>
        (r.getLong(2), r.getDouble(3), r.getDouble(4))).head
    val (tot, est, ratio) = run(big)
    assert(tot === 2000L)
    assert(math.abs(est - 1000.0) / 1000.0 < 0.45) // 5σ at k=128
    assert(est != 1000.0) // genuinely the estimator branch, not exact
    assert(run(big.repartition(13)) === ((tot, est, ratio)))
  }

  test("vocabCoverageSweep: hand-checked coverage curve, deterministic tie-break") {
    // counts: a×5, b×3, c×1, d×1 (ties c/d break by word asc)
    val d = Seq((1L, "a a a b b"), (2L, "a a b c"), (3L, "d"))
      .toDF("doc_id", "text")
    val out = Corpus.vocabCoverageSweep(d, "doc_id", "text",
        sizes = Seq(1, 2, 3))
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(out(1L) === ((4L, 10L, 5L, 0.5)))
    assert(out(2L) === ((4L, 10L, 8L, 0.2)))
    assert(out(3L) === ((4L, 10L, 9L, 0.1))) // c (word asc) wins rank 3
    // a V beyond the vocab covers everything
    val full = Corpus.vocabCoverageSweep(d, "doc_id", "text",
        sizes = Seq(100)).collect().head
    assert(full.getLong(3) === 10L && full.getDouble(4) === 0.0)
  }

  test("entropySignals: hand-checked entropy/ttr, fold ≡ textbook explode form, edge docs") {
    val d = Seq(
      (1L, "a b a c"),       // counts a:2,b:1,c:1 → H = ln4 − r6(2ln2)/4
      (2L, "a a a a"),       // uniform single type → H = 0
      (3L, "z"),             // one token → H = 0, ttr = 1
      (4L, ""),              // empty → no row
      (5L, "  "),            // whitespace-only → no row
      (6L, "q w e r t y"))   // all distinct → H = ln 6
      .toDF("doc_id", "text")
    val out = Corpus.entropySignals(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).toMap
    assert(out.keySet === Set(1L, 2L, 3L, 6L))
    assert(out(1L)._1 === 4L && out(1L)._2 === 3L && out(1L)._3 === 0.75)
    assert(math.abs(out(1L)._4 -
      (math.log(4) - math.floor(2 * math.log(2) * 1e6 + 0.5) / 1e6 / 4))
      < 2e-6)
    assert(out(2L) === ((4L, 1L, 0.25, 0.0)))
    assert(out(3L) === ((1L, 1L, 1.0, 0.0)))
    assert(math.abs(out(6L)._4 - math.log(6)) < 2e-6)
    // bit parity with the textbook explode + GROUP BY derivation
    val textbook = d
      .select(col("doc_id"), explode(filter(split(col("text"), " "),
        w => w =!= "")).as("w"))
      .groupBy("doc_id", "w").agg(count(lit(1)).as("c"))
      .groupBy("doc_id")
      .agg(sum("c").cast("long").as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(graft.functions.TextFunctions.round6(
          col("c").cast("double") * log(col("c").cast("double")))
          .cast("decimal(28,6)")).as("s"))
      .select(col("doc_id"), col("n_tokens"), col("n_types"),
        graft.functions.TextFunctions.round6(
          col("n_types").cast("double") / col("n_tokens").cast("double"))
          .as("ttr"),
        graft.functions.TextFunctions.round6(
          log(col("n_tokens").cast("double")) -
            col("s").cast("double") / col("n_tokens").cast("double"))
          .as("entropy"))
    assert(rows(Corpus.entropySignals(d, "doc_id", "text")) ===
      rows(textbook))
  }

  test("kneser-ney: hand-checked probabilities, discounted + backoff mass") {
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    // bi: (a,b)=2 (b,a)=1 (a,c)=1 → D=3; ctx a: c=3 n1=2; b: c=1 n1=1
    // rights: a=1 b=1 c=1
    val d = Seq((1L, "a b a b"), (2L, "a c"), (3L, "x"))
      .toDF("doc_id", "text")
    val out = Corpus.knScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(out.keySet === Set(1L, 2L)) // 1-token doc has no pairs
    val pBA = (math.max(2.0 - 0.75, 0.0) + 0.75 * 2.0 * (1.0 / 3.0)) / 3.0
    val pAB = (math.max(1.0 - 0.75, 0.0) + 0.75 * 1.0 * (1.0 / 3.0)) / 1.0
    val pCA = (math.max(1.0 - 0.75, 0.0) + 0.75 * 2.0 * (1.0 / 3.0)) / 3.0
    val exp1 = r6((BigDecimal(r6(-math.log(pBA))) * 2 +
      BigDecimal(r6(-math.log(pAB)))).toDouble / 3.0)
    assert(out(1L) === ((3L, exp1)))
    assert(out(2L) === ((1L, r6(-math.log(pCA)))))
  }

  test("kneser-ney: continuation backoff rewards many-context tokens") {
    // 'rare' has appeared after 10 DIFFERENT contexts; 'only1' after
    // exactly one. Docs 30/31 pair each ONCE with 'san' (equal c_ab,
    // same context), so the ordering isolates the continuation term:
    // the many-context token must be the likelier continuation — the
    // "San Francisco" correction add-one smoothing cannot make.
    val d = ((1L to 10L).map(i => (i, s"ctx$i rare")) ++
      (11L to 20L).map(i => (i, "san francisco")) ++
      Seq((30L, "san rare"), (31L, "san only1"))).toDF("doc_id", "text")
    val out = Corpus.knScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(30L) < out(31L))
  }

  test("trigram interpolated KN: hand-checked two-level backoff") {
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    // T: (a,b,a)=2 (b,a,b)=1 (a,b,c)=1; g1: (a,b) c2=3 n3fw=2,
    // (b,a) c2=1 n3fw=1; g2: cont(b,a)=1 cont(b,c)=1 cont(a,b)=1;
    // g3: b nmid=2 nfw2=2, a nmid=1 nfw2=1; bigram types
    // {ab, ba, bc, xy} → NB=4, N1c = 1 each.
    val d = Seq((1L, "a b a b a"), (2L, "a b c"), (3L, "x y"))
      .toDF("doc_id", "text")
    val got = Corpus.knTrigramScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(got.keySet === Set(1L, 2L)) // 2-token doc has no trigrams
    val dct = 0.75
    def p2(cont: Double, nfw2: Double, n1: Double, nmid: Double) =
      (math.max(cont - dct, 0.0) + dct * nfw2 * (n1 / 4.0)) / nmid
    def p3(c3: Double, n3fw: Double, p2v: Double, c2: Double) =
      (math.max(c3 - dct, 0.0) + dct * n3fw * p2v) / c2
    val xAba = r6(-math.log(p3(2, 2, p2(1, 2, 1, 2), 3)))
    val xBab = r6(-math.log(p3(1, 1, p2(1, 1, 1, 1), 1)))
    val xAbc = r6(-math.log(p3(1, 2, p2(1, 2, 1, 2), 3)))
    val exp1 = r6((BigDecimal(xAba) * 2 + BigDecimal(xBab))
      .toDouble / 3.0)
    assert(got(1L) === ((3L, exp1)))
    assert(got(2L) === ((1L, xAbc)))
  }

  test("trigram KN pruning: hand-checked backoff, minCount=1 identity, no-singleton identity") {
    def r6(v: Double) = math.floor(v * 1e6 + 0.5) / 1e6
    // counts: (a,b,c)=2 hit; (b,c,a)=1, (c,a,b)=1, (x,y,z)=1 pruned.
    // doc2's (x,y,z): p2(z|y) = (1−.75 + .75·1·(1/5))/1 = 0.4;
    // backoff P = .75·n3fw(x,y)/c2(x,y)·p2 = .75·1/1·0.4 = 0.3.
    val d = Seq((1L, "a b c a b c"), (2L, "x y z")).toDF("doc_id", "text")
    val pruned = Corpus.knTrigramScore(d, "doc_id", "text", minCount = 2)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2))))
      .toMap
    assert(pruned(2L) === ((1L, r6(-math.log(0.3)))))
    assert(pruned(1L)._1 === 4L) // every occurrence still scored
    // minCount=1 is bit-identical to the unpruned plan
    assert(rows(Corpus.knTrigramScore(d, "doc_id", "text", minCount = 1))
      === rows(Corpus.knTrigramScore(d, "doc_id", "text")))
    // a corpus with no singleton trigrams is untouched by pruning
    // doc1: pqr×3 qrp×2 rpq×2; doc2: pqr×3 qrs×3 rsp×2 spq×2
    val rep = Seq((1L, "p q r p q r p q r"),
      (2L, "p q r s p q r s p q r s")).toDF("doc_id", "text")
    assert(rows(Corpus.knTrigramScore(rep, "doc_id", "text", minCount = 2))
      === rows(Corpus.knTrigramScore(rep, "doc_id", "text")))
    // the bounded build (never materialize the unpruned aggregate) is
    // a PLAN choice only — bit-identical rows to the materialized form
    val prevConf = spark.conf.getOption("spark.graft.kn.boundedBuild")
    try {
      spark.conf.set("spark.graft.kn.boundedBuild", "true")
      val boundedRows =
        rows(Corpus.knTrigramScore(d, "doc_id", "text", minCount = 2))
      spark.conf.set("spark.graft.kn.boundedBuild", "false")
      assert(boundedRows ===
        rows(Corpus.knTrigramScore(d, "doc_id", "text", minCount = 2)))
    } finally prevConf match {
      case Some(v) => spark.conf.set("spark.graft.kn.boundedBuild", v)
      case None => spark.conf.unset("spark.graft.kn.boundedBuild")
    }
  }

  test("trigram KN bounded build: bucketed multi-pass model is bit-identical to the single pass") {
    // enough docs that g2's (b,c) types genuinely span hash(a,b)
    // buckets (the cross-bucket SUM combine is what's under test)
    val d = (1L to 60L).map(i =>
        (i, s"w${i % 5} w${(i * 3) % 7} w${(i * 5) % 11} w${i % 3} " +
          s"w${(i * 7) % 5} w${i % 7}"))
      .toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getDouble(2))).sortBy(_._1).toSeq
    val conf = spark.conf
    conf.set("spark.graft.kn.boundedBuild", "true")
    try {
      val single = rows(Corpus.knTrigramScore(d, "doc_id", "text",
        minCount = 2))
      // force the sizing rule past its ceiling → multiple buckets
      conf.set("spark.graft.kn.bytesPerPartition", "512")
      conf.set("spark.graft.kn.widthCeiling", "2")
      val (w, p) = Corpus.exchangeWidthPlan(d, "kn")
      assert(w === 2 && p > 1, s"width=$w passes=$p")
      val multi = rows(Corpus.knTrigramScore(d, "doc_id", "text",
        minCount = 2))
      assert(multi === single)
    } finally {
      conf.unset("spark.graft.kn.boundedBuild")
      conf.unset("spark.graft.kn.bytesPerPartition")
      conf.unset("spark.graft.kn.widthCeiling")
    }
  }

  test("trigram KN: many-context continuation outranks one-context at equal counts") {
    // both 'rare' and 'only1' close the trigram (san, francisco, ·)
    // exactly once; 'rare' additionally appears after 10 different
    // bigram contexts — the continuation term must prefer it.
    val d = ((1L to 10L).map(i => (i, s"ctx$i mid$i rare")) ++
      (11L to 20L).map(i => (i, "san francisco bay")) ++
      Seq((30L, "san francisco rare"), (31L, "san francisco only1")))
      .toDF("doc_id", "text")
    val out = Corpus.knTrigramScore(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(out(30L) < out(31L))
  }

  test("trigram KN: hot-key salting is result-invariant") {
    val d = ((1L to 150L).map(i => (i, s"of the day of the tail$i")) ++
      (201L to 240L).map(i => (i, s"cold$i pair$i third$i")))
      .toDF("doc_id", "text")
    val salted = rows(Corpus.knTrigramScore(d, "doc_id", "text",
      hotDf = 16, salts = 4))
    val cold = rows(Corpus.knTrigramScore(d, "doc_id", "text",
      hotDf = 1000000, salts = 4))
    assert(salted === cold)
    assert(salted.size === 190)
  }

  test("kneser-ney: hot-bigram salting is result-invariant") {
    // 200 docs all repeating the same head bigram (every key crosses
    // a hotDf=16 threshold at the 1-in-8 sample) + a long cold tail;
    // the salted plan must produce bit-identical rows to the cold
    // (empty-hotSet) plan — replication meets each probe row exactly
    // once, and the per-doc sums are order-free decimals.
    val d = ((1L to 200L).map(i => (i, s"of the of the tail$i")) ++
      (201L to 260L).map(i => (i, s"cold$i pair$i"))).toDF("doc_id", "text")
    val salted = rows(Corpus.knScore(d, "doc_id", "text",
      hotDf = 16, salts = 4))
    val cold = rows(Corpus.knScore(d, "doc_id", "text",
      hotDf = 1000000, salts = 4))
    assert(salted === cold)
    assert(salted.size === 260)
  }

  test("pmi: independent vs always-adjacent pairs rank as expected") {
    // "p q" always adjacent; fillers vary
    val d = (1L to 20L).map(i => (i, s"p q f$i p q")).toDF("doc_id", "text")
    val out = Corpus.pmiCollocations(d, "text", minCount = 10)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    // p_q seen 40×; q_p-type pairs (q f_i, f_i p) each below minCount
    assert(out.keySet === Set("p_q"))
    assert(out("p_q") > 0.0) // adjacent far above independence
  }

  test("token drift: over-represented tokens score positive, shared ~zero") {
    val a = Seq.tabulate(20)(i => (i.toLong, "common shift")).toDF("doc_id", "text")
    val b = Seq.tabulate(20)(i => (i.toLong, "common stay")).toDF("doc_id", "text")
    val out = Corpus.tokenDrift(a, b, "text", minCount = 10)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getDouble(5)))).toMap
    assert(out("shift")._1 === 20L && out("shift")._2 === 0L)
    assert(out("shift")._3 > 0.0)   // only in A → positive KL contribution
    assert(out("stay")._3 < 0.0)    // only in B → negative
    assert(math.abs(out("common")._3) < 0.01) // balanced → near zero
  }

  test("edit-distance verify keeps only close candidate pairs") {
    val d = Seq(
      (1L, "hello world"), (2L, "hello worle"), (3L, "totally different text")
    ).toDF("doc_id", "text")
    val cands = Seq((1L, 2L), (1L, 3L)).toDF("a_id", "b_id")
    val out = Dedup.editDistanceVerify(d, "doc_id", "text", cands, maxDist = 3)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), r.getInt(2))).toMap
    assert(out === Map((1L, 2L) -> 1))
  }

  test("piiScrub redacts emails/phones/IPs with typed tags and exact counts") {
    val d = Seq(
      (1L, "mail a.user+tag@sub.ex-ample.org or b_2@x.io, call +1-555-0042 now"),
      (2L, "server 192.168.0.1 and 10.0.300.7 respond; dial +44 207-946-0958"),
      (3L, "no pii here, just 1234 plain words and version 2.5")
    ).toDF("doc_id", "text")
    val out = Corpus.piiScrub(d, "doc_id", "text")
      .collect().map(r => r.getLong(0) ->
        ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(out(1L) === (("mail <EMAIL> or <EMAIL>, call <PHONE> now", 2L, 1L, 0L)))
    // 10.0.300.7 is syntactically a dotted quad (the pattern is
    // syntactic, like C4's, not range-validating); version 2.5 is not
    assert(out(2L) === (("server <IP> and <IP> respond; dial <PHONE>", 0L, 1L, 2L)))
    assert(out(3L) === (("no pii here, just 1234 plain words and version 2.5",
      0L, 0L, 0L)))
  }

  test("perplexityBuckets: thirds per key, lower score is head") {
    import org.apache.spark.sql.functions.col
    val d = ((1 to 9).map(i => ("en", i.toDouble)) ++
      Seq(("de", 100.0), ("de", 200.0), ("de", 300.0)))
      .toDF("lang", "nll")
    val got = Corpus.perplexityBuckets(d, Seq("lang"), col("nll"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getString(2)))
    val en = got.filter(_._1 == "en").sortBy(_._2).map(_._3)
    // bounds: (9-1)/3 -> 3.667, 2*(9-1)/3 -> 6.333
    assert(en.toSeq === Seq("head", "head", "head", "middle", "middle",
      "middle", "tail", "tail", "tail"))
    val de = got.filter(_._1 == "de").sortBy(_._2).map(_._3)
    assert(de.toSeq === Seq("head", "middle", "tail"))
  }

  test("perplexityBuckets: NULL scores get a NULL bucket") {
    import org.apache.spark.sql.functions.col
    val d = Seq(("en", Some(1.0)), ("en", Some(2.0)), ("en", Some(3.0)),
      ("en", None)).toDF("lang", "nll")
    val got = Corpus.perplexityBuckets(d, Seq("lang"), col("nll"))
      .filter(col("nll").isNull).collect()
    assert(got.length === 1 && got.head.isNullAt(2))
  }

  test("thresholdSweep: counts, ratios and NULL conventions per threshold") {
    import org.apache.spark.sql.functions.col
    // scores: 0.1(pos), 0.5(pos), 0.5(neg), 0.9(neg)
    val d = Seq((0.1, true), (0.5, true), (0.5, false), (0.9, false))
      .toDF("q", "pos")
    val got = Corpus.thresholdSweep(d, col("q"), col("pos"),
        Seq(0.0, 0.5, 0.9, 1.0))
      .orderBy("threshold").collect()
      .map(r => (r.getDouble(0), r.getLong(1), r.getLong(2),
        Option(r.get(5)), Option(r.get(6)), Option(r.get(7))))
    assert(got(0) === ((0.0, 4L, 2L, Some(0.5), Some(1.0), Some(1.0))))
    assert(got(1) === ((0.5, 3L, 1L,
      Some(0.333333), Some(0.5), Some(0.75))))
    assert(got(2) === ((0.9, 1L, 0L, Some(0.0), Some(0.0), Some(0.25))))
    // nothing survives t=1.0: precision is NULL (0/0), recall 0
    assert(got(3) === ((1.0, 0L, 0L, None, Some(0.0), Some(0.0))))
  }

  test("thresholdSweep: all-negative labels give NULL recall") {
    import org.apache.spark.sql.functions.col
    val d = Seq((0.5, false)).toDF("q", "pos")
    val got = Corpus.thresholdSweep(d, col("q"), col("pos"), Seq(0.4))
      .collect().head
    assert(got.getLong(3) === 1L && got.getLong(4) === 0L)
    assert(got.isNullAt(6)) // recall 0/0
  }

  test("thresholdSweep plan: one aggregate, no per-threshold scan") {
    import org.apache.spark.sql.functions.col
    val d = Seq((0.5, true)).toDF("q", "pos")
    val plan = Corpus.thresholdSweep(d, col("q"), col("pos"),
      Seq(0.1, 0.5, 0.9)).queryExecution.optimizedPlan
    val aggs = plan.collect {
      case a: org.apache.spark.sql.catalyst.plans.logical.Aggregate => a
    }
    assert(aggs.size === 1, plan.toString)
  }
}
