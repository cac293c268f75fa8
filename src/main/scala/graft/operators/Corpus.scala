package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions
import graft.functions.NgramHashes.ngram_hashes

/** Corpus-level text curation operators for the training-data pipeline
  * surface: benchmark decontamination, boilerplate detection,
  * intra-document repetition scoring (Gopher-style quality rules), and
  * PMI collocation mining. All shapes are the ones a 100 TB corpus
  * needs — per-document columns stay narrow (64-bit shingle hashes,
  * never shingle strings, cross the wire), aggregates are
  * map-side-combinable hash aggregations, and the only joins are keyed
  * on shingle hashes or bounded benchmark sets.
  */
object Corpus {

  /** Email pattern — deliberately ASCII character-class-only (no \d,
    * \b, backreferences or lookaround), so Java regex (Spark codegen)
    * and RE2 (DuckDB oracle) agree match-for-match. */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** Phone pattern: international-prefix form (+C[-C]-NNN-NNNN with
    * -, dot or space separators). The mandatory leading '+' keeps it
    * disjoint from bare numbers in prose and from the email pattern.
    * The optional 4-digit tail is a NON-capturing group: with a capture
    * group, `regexp_extract_all` only works because both engines are
    * explicitly told group 0 — `(?:…)` removes that footgun. */
  val PhonePattern =
    "\\+[0-9]{1,2}[-. ][0-9]{3}[-. ][0-9]{3,4}(?:[-. ][0-9]{4})?"

  /** IPv4 pattern (syntactic dotted quad). */
  val Ipv4Pattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII SCRUB — the standard pre-training redaction pass (C4/Dolma
    * pipelines scrub or flag emails, phone numbers and IP addresses
    * before anything else sees the text). One codegen pass per
    * document, no shuffle at all: three `regexp_replace`s produce
    * `clean_text` (emails → `<EMAIL>`, phones → `<PHONE>`, IPv4s →
    * `<IP>`) and three `regexp_extract_all` counts report what was
    * found, counted on the ORIGINAL text. The email and phone patterns
    * are mutually disjoint by construction (see [[PhonePattern]]); the
    * IPv4 pattern is NOT fully disjoint from the email pattern — a
    * dotted quad embedded in an email's local/domain part matches both,
    * so in that corner case `n_ips` (counted on the original text) can
    * report an IP that no longer appears in `clean_text` because the
    * email scrub ran first. The oracle applies the identical order and
    * counting, so parity is unaffected. At 100 TB this is a pure
    * map stage that fuses into whatever scan or filter surrounds it;
    * the regexes are anchored to character classes only so the same
    * strings drive the DuckDB oracle (q112) match-for-match. */
  def piiScrub(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    docs.select(
      col(idCol),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailPattern, "<EMAIL>"),
          PhonePattern, "<PHONE>"),
        Ipv4Pattern, "<IP>").as("clean_text"),
      size(regexp_extract_all(t, lit(EmailPattern), lit(0)))
        .cast("long").as("n_emails"),
      size(regexp_extract_all(t, lit(PhonePattern), lit(0)))
        .cast("long").as("n_phones"),
      size(regexp_extract_all(t, lit(Ipv4Pattern), lit(0)))
        .cast("long").as("n_ips"))
  }

  /** Benchmark DECONTAMINATION: for every corpus document, count the
    * distinct word n-grams it shares with a benchmark/eval set — the
    * standard train/test-overlap filter run before LLM training
    * (13-gram overlap in GPT-3/PaLM data cards; n is a knob here).
    * Returns (doc_id, n_overlap) for contaminated documents
    * (n_overlap ≥ 1), benchmark members excluded.
    *
    * Scale: the corpus side never shuffles its text — documents
    * collapse to distinct 64-bit shingle hashes (one codegen pass) and
    * the exchange carries (doc_id, hash) longs only. The benchmark
    * n-gram set is distinct-aggregated first (eval suites are ~10⁵
    * rows, i.e. tiny next to a 100 TB corpus), so Spark's planner can
    * broadcast it and the contamination check becomes a map-side hash
    * probe + one output-sized count aggregation. */
  def decontaminate(
      corpus: DataFrame, benchmark: DataFrame,
      idCol: String, textCol: String, n: Int): DataFrame = {
    val corpusSh = corpus
      .select(col(idCol).as("doc_id"), explode(ngram_hashes(col(textCol), n)).as("h"))
    val benchSh = benchmark
      .select(explode(ngram_hashes(col(textCol), n)).as("h")).distinct()
    corpusSh
      .join(broadcast(benchSh), "h")
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** BOILERPLATE detection: per document, the fraction of its distinct
    * n-grams that are corpus-frequent (document frequency ≥ minDf) —
    * headers, navigation chrome and stock phrases score high, and the
    * ratio is the standard drop/trim signal (C4/RefinedWeb-style).
    * Returns (doc_id, n_shingles, n_frequent, round6 ratio).
    *
    * Scale: one distinct-hash explode feeds BOTH the document-frequency
    * aggregate and the per-document count — hashes, not text, shuffle.
    * The df table is aggregation OUTPUT (|vocab| rows, not |postings|),
    * its frequent subset is |postings|/minDf-bounded, and the re-join
    * is keyed on the hash so AQE can pick a broadcast when the frequent
    * set is small. */
  def boilerplateRatio(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDf: Long): DataFrame = {
    val sh = docs
      .select(col(idCol).as("doc_id"), explode(ngram_hashes(col(textCol), n)).as("h"))
      .localCheckpoint(eager = false) // two consumers — evaluate the scan+shingle pass once
    val frequent = sh.groupBy(col("h"))
      .agg(count(lit(1)).as("df")) // hashes are per-doc distinct ⇒ count = doc frequency
      .filter(col("df") >= minDf)
      .select(col("h"))
    sh.join(frequent, Seq("h"), "left_semi")
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frequent"))
      .join(sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles")),
        Seq("doc_id"), "right")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_frequent"), lit(0L)).as("n_frequent"),
        TextFunctions.round6(coalesce(col("n_frequent"), lit(0L))
          .cast("double") / col("n_shingles").cast("double")).as("ratio"))
  }

  /** Intra-document REPETITION stats (Gopher quality rules 4-7 shape):
    * duplicate-n-gram ratio (1 − distinct/total n-grams) and
    * top-token ratio (most frequent token's share). High values mark
    * degenerate generations / boilerplate loops. Pure per-row column
    * math — no shuffle at all; the plan is scan → project. The counting
    * runs in the one-pass O(L·n) codegen kernel
    * [[graft.functions.RepetitionStatsExpr]] (the earlier HOF top-token
    * count was O(distinct·tokens) per row — quadratic on book-length
    * documents); values are identical, pinned by TextKernelsSpec. */
  def repetitionStats(
      docs: DataFrame, idCol: String, textCol: String, n: Int): DataFrame = {
    val stats = graft.functions.TextKernels.repetition_stats(col(textCol), n)
    docs.select(col(idCol).as("doc_id"), stats.as("st"))
      .select(col("doc_id"),
        col("st.n_tokens").as("n_tokens"),
        TextFunctions.round6(
          when(col("st.n_ngrams") > 0,
            lit(1.0) - col("st.n_distinct").cast("double") /
              col("st.n_ngrams").cast("double")).otherwise(lit(0.0)))
          .as("dup_ngram_ratio"),
        TextFunctions.round6(col("st.top_tok").cast("double") /
          col("st.n_tokens").cast("double")).as("top_token_ratio"))
  }

  /** Token-distribution DRIFT between two corpus slices: per-token
    * KL-divergence contributions p·ln(p/q) under add-one smoothing —
    * the standard monitor for "did this month's crawl shift against
    * the reference corpus" (drift dashboards, mixture re-weighting).
    * Returns (tok, c_a, c_b, p_a, p_b, contrib) for tokens whose
    * combined count reaches `minCount`; positive contrib = token
    * over-represented in A.
    *
    * Scale: two token-count hash aggregates (map-side combined), a
    * full-outer join keyed on the token over vocabulary-sized output,
    * and a single totals row (n_a, n_b, |V|) cross-joined in — the
    * bounded-plan-parameter pattern, no driver loop. All per-token
    * arithmetic is deterministic; no cross-row FP summation exists, so
    * every output cell is exactly oracle-checkable. */
  def tokenDrift(
      a: DataFrame, b: DataFrame, textCol: String, minCount: Long): DataFrame = {
    def counts(df: DataFrame, name: String): DataFrame = df
      .select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as(name))
    val ca = counts(a, "c_a")
    val cb = counts(b, "c_b")
    val joined = ca.join(cb, Seq("tok"), "full_outer")
      .select(col("tok"), coalesce(col("c_a"), lit(0L)).as("c_a"),
        coalesce(col("c_b"), lit(0L)).as("c_b"))
      .localCheckpoint(eager = false) // totals + output read one pass
    val totals = joined.agg(sum(col("c_a")).as("n_a"), sum(col("c_b")).as("n_b"),
      count(lit(1)).as("vocab"))
    val p = (col("c_a").cast("double") + lit(1.0)) /
      (col("n_a").cast("double") + col("vocab").cast("double"))
    val q = (col("c_b").cast("double") + lit(1.0)) /
      (col("n_b").cast("double") + col("vocab").cast("double"))
    joined.join(broadcast(totals))
      .filter(col("c_a") + col("c_b") >= minCount)
      .select(col("tok"), col("c_a"), col("c_b"),
        TextFunctions.round6(p).as("p_a"), TextFunctions.round6(q).as("p_b"),
        TextFunctions.round6(p * log(p / q)).as("contrib"))
  }

  /** LM QUALITY score (the CCNet-style perplexity filter shape): score
    * every document by its average negative log-likelihood under an
    * add-one-smoothed BIGRAM model trained on the corpus itself —
    * ppl-like scores separate fluent text from boilerplate/garbage and
    * drive the keep/head/tail bucketing CCNet popularized. Returns
    * (doc_id, n_pairs, nll) for documents with ≥ 1 bigram; lower nll =
    * more typical text.
    *
    * Determinism: each pair's −ln p(b|a) is rounded to 6dp and
    * accumulated as DECIMAL(28,6) — an order-free exact sum (the q24
    * money-sum pattern), so the per-doc average is reproducible under
    * any partitioning and mirrored term-for-term by the oracle.
    *
    * Scale: one tokenize pass (checkpointed) feeds the bigram stream
    * and the unigram counts; both count tables are vocabulary-sized
    * aggregation OUTPUTS; the scoring probe joins the pair stream on
    * (a,b) and (a) — hash joins on token keys, AQE-broadcastable when
    * the vocab is small. |V| is one driver scalar (bounded plan
    * parameter). */
  def lmScore(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import TextFunctions.bindOnce
    val toks = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .localCheckpoint(eager = false) // feeds pairs AND unigram counts
    val pairs = toks.select(col("doc_id"), explode(bindOnce(col("t")) { t =>
        when(size(t) < 2, array().cast("array<struct<a:string,b:string>>")).otherwise(
          transform(sequence(lit(1), size(t) - 1),
            i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
      }).as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"))
      .localCheckpoint(eager = false) // feeds bigram counts AND the probe
    // checkpointed: uni feeds the |V| count AND the probe join — the
    // barrier keeps the explode+aggregate to one evaluation
    val uni = toks.select(explode(col("t")).as("a"))
      .groupBy(col("a")).agg(count(lit(1)).as("c_a"))
      .localCheckpoint(eager = false)
    val bi = pairs.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
    // side-action jobs run AQE-off (Par.withoutAqe): one-shot
    // deterministic scalars; AQE re-planning is pure latency here
    val vocab = Par.withoutAqe(docs.sparkSession)(uni.count()) // |V|: driver scalar, bounded plan parameter
    val contrib = TextFunctions.round6(-log(
      (col("c_ab") + lit(1L)).cast("double") /
        (col("c_a") + lit(vocab)).cast("double")))
    pairs
      .join(bi, Seq("a", "b"))
      .join(uni, Seq("a"))
      .select(col("doc_id"), contrib.as("x"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(28,6)")).as("s"))
      .select(col("doc_id"), col("n_pairs"),
        TextFunctions.round6(col("s").cast("double") /
          col("n_pairs").cast("double")).as("nll"))
  }

  /** QUALITY-SIGNALS SHEET — the RedPajama-V2-style per-document
    * signal table: instead of running each curation query separately,
    * ONE scan emits every cheap signal side by side (length/token
    * counts, the q20 quality score, q19 language id, q56 repetition
    * ratios, the full q131 Gopher rule panel) so downstream selection
    * reads a signals parquet instead of re-touching text. Every value
    * is definitionally identical to its standalone query — the q153
    * oracle nests those queries' exact SQL bodies and joins them.
    *
    * Scale shape: one Project over one scan — four codegen kernels per
    * row, ZERO shuffle, zero state (plan-pinned in CorpusSpec: no
    * Exchange, one scan). At 100 TB this is the cheapest possible
    * pass; everything text-local a pipeline wants should ride it. */
  def qualitySignals(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.functions.{QualityKernels, TextKernels}
    import TextFunctions.round6
    val profiles = TextFunctions.LangProfiles
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(0.0))
        .otherwise(round6(num.cast("double") / den.cast("double")))
    val base = docs.select(col(idCol).as("doc_id"),
      length(col(textCol)).cast("int").as("n_chars"),
      TextKernels.text_stats(col(textCol), profiles("en")).as("__st"),
      TextKernels.lang_scores(col(textCol),
        profiles.toSeq.sortBy(_._1)).as("__ls"),
      TextKernels.repetition_stats(col(textCol), 3).as("__rp"),
      QualityKernels.gopher_counts(col(textCol)).as("__gc"))
    val cols = base.select(col("doc_id"), col("n_chars"),
      col("__st.ws_tokens").as("ws_tokens"),
      col("__st.re_tokens").as("re_tokens"),
      col("__st.quality").as("quality"),
      col("__ls.en_score").as("en_score"),
      col("__ls.pred_lang").as("pred_lang"),
      round6(when(col("__rp.n_ngrams") > 0,
          lit(1.0) - col("__rp.n_distinct").cast("double") /
            col("__rp.n_ngrams").cast("double")).otherwise(lit(0.0)))
        .as("dup_ngram_ratio"),
      round6(col("__rp.top_tok").cast("double") /
        col("__rp.n_tokens").cast("double")).as("top_token_ratio"),
      col("__gc.n_words").cast("int").as("n_words"),
      when(col("__gc.n_words") === 0, lit(0.0))
        .otherwise(round6(col("__gc.sum_word_chars").cast("double") /
          col("__gc.n_words").cast("double"))).as("mean_word_len"),
      ratio(col("__gc.n_symbol_words"), col("__gc.n_words")).as("symbol_ratio"),
      ratio(col("__gc.n_bullet_lines"), col("__gc.n_lines")).as("bullet_ratio"),
      ratio(col("__gc.n_ellipsis_lines"), col("__gc.n_lines")).as("ellipsis_ratio"),
      ratio(col("__gc.n_alpha_words"), col("__gc.n_words")).as("alpha_ratio"),
      col("__gc.n_stop_present").cast("int").as("n_stop_present"))
    val failed =
      when(col("n_words") >= 50 && col("n_words") <= 100000, lit(0)).otherwise(lit(1)) +
      when(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0, lit(0)).otherwise(lit(1)) +
      when(col("symbol_ratio") <= 0.1, lit(0)).otherwise(lit(1)) +
      when(col("bullet_ratio") <= 0.9, lit(0)).otherwise(lit(1)) +
      when(col("ellipsis_ratio") <= 0.3, lit(0)).otherwise(lit(1)) +
      when(col("alpha_ratio") >= 0.8, lit(0)).otherwise(lit(1)) +
      when(col("n_stop_present") >= 2, lit(0)).otherwise(lit(1))
    cols.withColumn("n_rules_failed", failed)
      .withColumn("gopher_pass", col("n_rules_failed") === 0)
  }

  /** WORD-ENTROPY / LEXICAL-DIVERSITY SIGNALS — the per-document
    * unigram-distribution statistics quality filters read next to the
    * [[qualitySignals]] ratios (public recipe: low word entropy and
    * low type-token ratio flag template/spam/keyword-stuffed pages —
    * the "diversity" panel of RedPajama-V2-class signal sheets):
    * Shannon entropy H = ln n − (Σ_w c_w·ln c_w)/n over the doc's
    * word counts (nats), type count, and type-token ratio.
    *
    * Scale shape: ZERO SHUFFLE — the textbook form (explode words →
    * per-(doc,word) counts → per-doc aggregate) pays two corpus-scale
    * exchanges for a computation that is doc-local; here each row
    * sorts its own token array (equal words become adjacent — ANY
    * total order works, so engine/oracle collation differences are
    * irrelevant) and ONE `aggregate` fold counts runs in place:
    * state = (prev, run, Σ, types), a run's term round6(c·ln c) is
    * added when the run closes, the finish lambda closes the last
    * run. The Σ accumulates as DECIMAL(28,6) over round6'd terms (the
    * q75 discipline), so the value is fold-order-exact and the oracle
    * — which uses the textbook GROUP BY form — lands on identical
    * bits.
    *
    * Empty docs (no non-empty whitespace tokens) emit no row.
    * @return (doc_id, n_tokens, n_types, ttr, entropy) — ttr and
    *         entropy round6, entropy in nats. */
  def entropySignals(
      docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    import TextFunctions.round6
    val dec = "decimal(28,6)"
    def term(run: Column): Column =
      round6(run.cast("double") * log(run.cast("double"))).cast(dec)
    val init = struct(lit(null).cast("string").as("p"), lit(0L).as("r"),
      lit(0).cast(dec).as("s"), lit(0L).as("k"))
    val folded = aggregate(col("__t"), init,
      (st, t) => when(st.getField("p").isNull,
          struct(t.as("p"), lit(1L).as("r"),
            st.getField("s").as("s"), lit(1L).as("k")))
        .when(t === st.getField("p"),
          struct(t.as("p"), (st.getField("r") + lit(1L)).as("r"),
            st.getField("s").as("s"), st.getField("k").as("k")))
        .otherwise(struct(t.as("p"), lit(1L).as("r"),
          (st.getField("s") + term(st.getField("r"))).cast(dec).as("s"),
          (st.getField("k") + lit(1L)).as("k"))),
      st => when(st.getField("p").isNull, st)
        .otherwise(struct(st.getField("p").as("p"),
          st.getField("r").as("r"),
          (st.getField("s") + term(st.getField("r"))).cast(dec).as("s"),
          st.getField("k").as("k"))))
    docs
      .select(col(idCol).as("doc_id"),
        array_sort(filter(TextFunctions.tokens(col(textCol)),
          w => w =!= "")).as("__t"))
      .select(col("doc_id"), size(col("__t")).cast("long").as("n_tokens"),
        folded.as("__f"))
      .filter(col("n_tokens") >= 1)
      .select(col("doc_id"), col("n_tokens"),
        col("__f.k").as("n_types"),
        round6(col("__f.k").cast("double") /
          col("n_tokens").cast("double")).as("ttr"),
        round6(log(col("n_tokens").cast("double")) -
          col("__f.s").cast("double") / col("n_tokens").cast("double"))
          .as("entropy"))
  }

  /** VOCABULARY-SIZE COVERAGE SWEEP — the vocab-size calibration
    * every tokenizer design starts from (public recipe: pick V by
    * reading the OOV/coverage curve of the top-V frequency-ranked
    * vocabulary — the Zipf-tail question "how much of the corpus do
    * the top V word types cover?"), the [[Packing.contextLengthSweep
    * q158]] convention applied to vocabulary: ONE corpus count pass,
    * then every candidate V reads off the same ranked table —
    * closed-form, no per-candidate scan.
    *
    * Ranking ties break (count DESC, word ASC) so the curve is
    * deterministic and oracle-replayable.
    *
    * Scale shape: one map-side-combined word-count aggregate (vocab-
    * sized output), one window over the VOCAB-sized table (bounded —
    * the corpus never sorts), then a single one-row aggregate emitting
    * all candidates. 100 TB cost = the one count pass.
    * @return (vocab_size, n_types, total_tokens, kept_tokens,
    *         oov_rate) — oov_rate round6. */
  def vocabCoverageSweep(
      docs: DataFrame, idCol: String, textCol: String,
      sizes: Seq[Int] = Seq(1000, 2000, 4000, 8000)): DataFrame = {
    require(sizes.nonEmpty && sizes.forall(_ >= 1),
      "sizes must be non-empty positive")
    import TextFunctions.round6
    val wc = docs
      .select(explode(filter(TextFunctions.tokens(col(textCol)),
        w => w =!= "")).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("c"))
    val ranked = wc.withColumn("rank",
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("c").desc, col("w"))))
    val aggs = sizes.map(v =>
      sum(when(col("rank") <= v, col("c")).otherwise(lit(0L)))
        .cast("long").as(s"__k$v"))
    val one = ranked.agg(count(lit(1)).as("__types"),
      (sum(col("c")).cast("long").as("__total") +: aggs): _*)
    one.select(explode(array(sizes.map(v => struct(
        lit(v).cast("long").as("vocab_size"),
        col("__types").as("n_types"),
        col("__total").as("total_tokens"),
        col(s"__k$v").as("kept_tokens"))): _*)).as("s"))
      .select(col("s.vocab_size"), col("s.n_types"),
        col("s.total_tokens"), col("s.kept_tokens"),
        round6(lit(1.0) - col("s.kept_tokens").cast("double") /
          col("s.total_tokens").cast("double")).as("oov_rate"))
  }

  /** DISTINCT-N DIVERSITY — the corpus-diversity panel (public
    * recipe: distinct-n = distinct n-grams / total n-grams, Li et al.
    * 2016 — the standard degeneracy check on generated/synthetic
    * corpora, read per source so a collapsing generator or a template
    * farm stands out against organic sources): for each n, per-source
    * total and distinct n-gram counts and their ratio.
    *
    * Scale shape: one explode + two-level aggregate per n — the
    * (source, gram) partial counts combine map-side, the second level
    * is source-sized; grams travel as their portable hashes (text
    * never shuffles), so "distinct" means distinct HASHES — mod-1e9+7
    * collisions bias the ratio down ~\|grams\|²/2e9 (negligible below
    * ~10⁶ grams/source; swap the hash for the joined gram string when
    * the bias matters, or [[distinctNgramRatiosSketch]] when exact
    * counting outgrows memory — measured head-to-head in the
    * distinct_n[_sketch] stress pair).
    * @return (source, n, total_ngrams, distinct_ngrams,
    *         distinct_ratio) — ratio round6; sources with no n-gram
    *         of a given n (all docs shorter than n) emit no row. */
  def distinctNgramRatios(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, ns: Seq[Int] = Seq(1, 2, 3)): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    import TextFunctions.round6
    // SELF-SIZING (the rankByHash / kn.boundedBuild convention, applied
    // here after round 16 proved the dial by sweep): the n-leg exchange
    // width derives from the input's Catalyst size estimate at the
    // measured zero-spill density — the 1M-doc sweep read 627.8 MB of
    // input stats with 128 partitions = 41.9 GB spill, 192 = ZERO,
    // 512 = 23.1 GB (past the bypass-writer ceiling the sort writer's
    // map-side buffering re-appears as spill) — i.e. ~3.3 MB of input
    // bytes per partition, floored at the session width so small
    // inputs keep their plan. A width past the ≤200 bypass ceiling
    // cannot just clamp (per-task hash-agg state would grow unbounded
    // with the corpus): it SPLITS into ceil(W/200) disjoint gram-hash
    // bucket passes — distinct counts ADD exactly across disjoint
    // buckets — each pass finishing eagerly at |sources| rows so
    // sibling passes never share the memory pool (the IVF-Lloyd /
    // kn-checkpoint convention: jobs during construction are the
    // operator's cost; the extra explode scans are the price of a
    // bounded per-task state at ANY corpus size under a fixed writer
    // ceiling — on a real cluster raise
    // spark.shuffle.sort.bypassMergeThreshold at submit time and the
    // same rule takes one wider pass instead).
    val (width, passes) = distinctNWidthPlan(docs)
    val legs = ns.map { n =>
      val toks = filter(TextFunctions.tokens(col(textCol)), w => w =!= "")
      val grams = TextFunctions.bindOnce(toks) { t =>
        when(size(t) < n, array().cast("array<long>")).otherwise(
          transform(sequence(lit(1), size(t) - (n - 1)),
            // space-joined before hashing: tokens are split on space,
            // so a space separator is collision-free; any other joiner
            // (incl. the former 0x01 byte) can appear INSIDE a token and
            // alias boundary-ambiguous grams, undercounting distincts
            // — and the oracle must join with the same byte
            i => graft.functions.PortableHash.portable_hash(
              concat_ws(" ", (0 until n).map(o =>
                element_at(t, i + o)): _*))))
      }
      val gramRows =
        docs.select(col(sourceCol).as("source"), explode(grams).as("g"))
      val partials = (0 until passes).map { b =>
        val slice = if (passes == 1) gramRows
          else gramRows.filter(pmod(col("g"), lit(passes)) === b)
        val agg = slice
          // repartition-first (the round-14 Kneser–Ney lesson, measured
          // again here: 59.9 GB of partial-aggregate fallback spill at
          // 1M docs × 3 n-legs without it): n-gram keys are mostly
          // DISTINCT, so map-side combine builds corpus-sized hash
          // tables that spill without combining — shuffle the raw
          // 12 B/gram rows once and aggregate clustered instead
          .transform(sizedRepartition(_, width, passes, col("source"), col("g")))
          .groupBy(col("source"), col("g"))
          .agg(count(lit(1)).as("__c"))
          .groupBy(col("source"))
          .agg(sum(col("__c")).cast("long").as("__total"),
            count(lit(1)).as("__distinct"))
        if (passes == 1) agg else agg.localCheckpoint(eager = true)
      }
      partials.reduce(_ unionByName _)
        .groupBy(col("source"))
        .agg(sum(col("__total")).cast("long").as("total_ngrams"),
          sum(col("__distinct")).cast("long").as("distinct_ngrams"))
        .select(col("source"), lit(n).cast("long").as("n"),
          col("total_ngrams"), col("distinct_ngrams"),
          round6(col("distinct_ngrams").cast("double") /
            col("total_ngrams").cast("double")).as("distinct_ratio"))
    }
    legs.reduce(_ unionByName _)
  }

  /** Measured zero-spill density for [[distinctNgramRatios]]'s gram
    * exchange: the round-16 three-point sweep at the 1M-doc staged
    * corpus (627.8 MB of Catalyst input stats) read 0 spill at 192
    * partitions and spilled at 128 — ~3.3 MB of INPUT bytes per
    * partition; 3 MiB is that rule with margin on the safe side.
    * Conf `spark.graft.distinctN.bytesPerPartition` overrides. */
  private val DistinctNBytesPerPartition: Long = 3L << 20


  /** Repartition under an [[exchangeWidthPlan]] result: when the rule
    * has real demand (width from stats, or multiple passes) the width
    * is EXPLICIT — AQE must not coalesce below the zero-spill density.
    * When the width is only the session floor (estimate fits one
    * session-width pass), emit a plain keyed repartition instead so
    * AQE's advisory-size coalescing stays free to shrink a small
    * exchange — the round-17 q182 sf0.1 regression was exactly this:
    * an explicit 32 pinned 3 n-legs of ~10 ms tasks that AQE used to
    * coalesce (round-18 verdict #5). */
  private[operators] def sizedRepartition(
      df: DataFrame, width: Int, passes: Int, keys: Column*): DataFrame = {
    val session = df.sparkSession.sessionState.conf.numShufflePartitions
    if (passes == 1 && width == session) df.repartition(keys: _*)
    else df.repartition(width, keys: _*)
  }

  /** The shared self-sizing rule for corpus-scale clustered-aggregate
    * exchanges: (per-pass exchange width, number of disjoint hash-
    * bucket passes). Total width = input stats / bytesPerPartition
    * (the measured zero-spill density — ~3.3 MB of INPUT bytes per
    * partition holds for both the distinct-n gram aggregate and the
    * KN trigram-model aggregate at their 1M-doc sweep points),
    * floored at the session shuffle width; demand past the bypass-
    * writer ceiling becomes extra passes instead of wider (and
    * therefore state-heavier) partitions. The ceiling defaults to the
    * DEPLOYMENT's `spark.shuffle.sort.bypassMergeThreshold` (200
    * unless the cluster raised it at submit time — in which case the
    * same rule takes fewer, wider passes on its own), overridable per
    * scope via `spark.graft.<scope>.widthCeiling`. */
  private[graft] def exchangeWidthPlan(
      docs: DataFrame, scope: String,
      defaultBytesPerPartition: Long = 3L << 20): (Int, Int) = {
    val sp = docs.sparkSession
    val perPart = sp.conf
      .getOption(s"spark.graft.$scope.bytesPerPartition")
      .map(_.toLong).getOrElse(defaultBytesPerPartition)
    val ceiling = sp.conf
      .getOption(s"spark.graft.$scope.widthCeiling")
      .map(_.toInt).getOrElse(sp.sparkContext.getConf
        .getInt("spark.shuffle.sort.bypassMergeThreshold", 200))
    val session = sp.sessionState.conf.numShufflePartitions.toLong
    val est = docs.queryExecution.optimizedPlan.stats.sizeInBytes
    // Pass count derives from the ESTIMATE width alone: the session
    // floor is a parallelism default, not aggregate-state demand, so
    // flooring the total width at the session count before splitting
    // by the ceiling would force ceil(session/ceiling) redundant
    // full-input passes — each an extra explode+aggregate scan — for
    // EVERY input on any deployment whose shuffle width exceeds the
    // bypass ceiling (e.g. 2000-partition submit confs). When the
    // estimate fits one pass, the per-pass width still floors at the
    // session count (capped by the ceiling) so small inputs keep the
    // deployment's parallelism.
    val estWidth = ((est + perPart - 1) / perPart).max(BigInt(1))
    val passes = ((estWidth + ceiling - 1) / ceiling).max(BigInt(1)).toInt
    val width = estWidth.max(BigInt(session)).min(BigInt(ceiling)).toInt
    (width, passes)
  }

  /** [[exchangeWidthPlan]] under the `distinctN` conf scope — see
    * [[DistinctNBytesPerPartition]] for the measured density. */
  private[operators] def distinctNWidthPlan(docs: DataFrame): (Int, Int) =
    exchangeWidthPlan(docs, "distinctN", DistinctNBytesPerPartition)

  /** DISTINCT-N DIVERSITY, SKETCHED — [[distinctNgramRatios]] with the
    * distinct count estimated by the q38 KMV min-k sketch
    * ([[graft.functions.KmvDistinct]]) instead of counted exactly.
    * This is the 100× escape the exact panel documents: at corpus
    * scale the (source, gram) aggregate is a sort-agg over ~corpus-
    * many mostly-unique keys per box (measured 43.3 GB of spill at
    * 1M docs — stress `distinct_n`), because global distinctness
    * can't stay doc-local. The sketch CAN: KMV keeps only the k
    * smallest distinct scrambled hashes per (source, n) group —
    * O(k) state regardless of gram cardinality — so the whole panel
    * collapses to ONE map-side-combined aggregate per n-leg finishing
    * at |sources| rows, with no corpus-scale exchange at all (the
    * wire carries |tasks|·|sources|·k longs of partial sketches).
    *
    * Determinism: min-k over distinct scrambled hashes is order- and
    * partitioning-independent, so the ESTIMATE itself is exact-
    * reproducible and the q183 oracle replays the full estimator
    * (scramble, k-th order statistic, the n̂ = (k−1)·M/h_k − 1
    * formula, 4-dp round) in SQL — the q38 discipline. Relative
    * error ~1/√(k−2) (≈3 % at k=1024); below k distinct grams the
    * sketch IS the exact count.
    * @return (source, n, total_ngrams, distinct_est,
    *         distinct_ratio_est) — est 4-dp, ratio round6; sources
    *         with no n-gram of a given n emit no row. */
  def distinctNgramRatiosSketch(
      docs: DataFrame, idCol: String, textCol: String,
      sourceCol: String, ns: Seq[Int] = Seq(1, 2, 3),
      k: Int = 1024): DataFrame = {
    require(ns.nonEmpty && ns.forall(_ >= 1), "ns must be positive")
    require(k >= 2, "k must be >= 2")
    import TextFunctions.round6
    import graft.functions.KmvDistinct.kmv_distinct
    val legs = ns.map { n =>
      val toks = filter(TextFunctions.tokens(col(textCol)), w => w =!= "")
      val grams = TextFunctions.bindOnce(toks) { t =>
        when(size(t) < n, array().cast("array<long>")).otherwise(
          transform(sequence(lit(1), size(t) - (n - 1)),
            // space joiner: byte-identical to the exact panel (and
            // collision-free — tokens are split on space)
            i => graft.functions.PortableHash.portable_hash(
              concat_ws(" ", (0 until n).map(o =>
                element_at(t, i + o)): _*))))
      }
      docs.select(col(sourceCol).as("source"), explode(grams).as("g"))
        // NO repartition here — the exact panel needs it because its
        // partial (source, gram) maps are corpus-sized; the sketch's
        // partial state is |sources|·k longs per task, the case
        // map-side combine exists for
        .groupBy(col("source"))
        .agg(count(lit(1)).as("total_ngrams"),
          kmv_distinct(col("g"), k).as("distinct_est"))
        .select(col("source"), lit(n).cast("long").as("n"),
          col("total_ngrams"), col("distinct_est"),
          round6(col("distinct_est") /
            col("total_ngrams").cast("double")).as("distinct_ratio_est"))
    }
    legs.reduce(_ unionByName _)
  }

  /** KNESER–NEY SMOOTHED bigram LM scoring — the smoothing family the
    * CCNet/KenLM perplexity filter actually ships (absolute
    * discounting + continuation-probability backoff), upgrading
    * [[lmScore]]'s add-one baseline: P(b|a) = max(c(ab)−d, 0)/c(a) +
    * d·N₁₊(a,·)/c(a) · N₁₊(·,b)/|bigrams| — a word is likely not
    * because it is frequent but because it follows MANY contexts (the
    * "San Francisco" correction). Context counts c(a) are pair-left
    * counts (Σ_b c(ab)), so the model is self-consistent at document
    * edges; scoring covers the training corpus itself, so every
    * scored pair is seen and the max() never zeroes a probability.
    *
    * Determinism: all model inputs are exact longs; each pair's
    * contribution −ln P is ONE transcendental whose operand tree is
    * replicated operand-for-operand in the q151 oracle, round6'd, and
    * summed as DECIMAL(28,6) (the q75 discipline).
    *
    * Scale shape: the corpus tokenizes TWICE (bigram counts, probe) —
    * never cached: checkpointing corpus-scale pair rows trades a
    * cheap scan-side map for storage that strangles join memory (the
    * DSIR lesson; first-cut stress spilled 77 GB). The model JOINS
    * happen at BIGRAM-TABLE size: contribution x(a,b) is finished on
    * the (checkpointed, vocab-bounded) bigram aggregate joined with
    * its two derived tables, and the corpus-scale probe then pays ONE
    * (a,b)-keyed join against the finished x-table instead of three.
    * The |bigrams| scalar is a bounded driver plan parameter.
    * @return (doc_id, n_pairs, nll) over docs with ≥ 2 tokens. */
  def knScore(
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75,
      hotDf: Int = 65536, salts: Int = 16): DataFrame = {
    import TextFunctions.bindOnce
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    require(hotDf >= 16 && salts >= 2,
      s"hotDf >= 16 and salts >= 2 required, got hotDf=$hotDf salts=$salts")
    def pairs = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), explode(bindOnce(col("t")) { t =>
        when(size(t) < 2, array().cast("array<struct<a:string,b:string>>")).otherwise(
          transform(sequence(lit(1), size(t) - 1),
            i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
      }).as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"))
    // checkpointed: bi derives ctx, rights, the |bigrams| scalar AND
    // the x-table — one evaluation serves all four, and it is the
    // model-sized table (vocab-bounded on real corpora), not the pairs.
    // REPARTITION-FIRST (the urlDupClusters lesson): bigram TYPES per
    // scan task ≈ rows per scan task (the tail dominates types in any
    // Zipfian corpus), so map-side combine holds a rows-sized hash map
    // while shrinking the exchange only ~17% — measured at the 119M-
    // pair stress point: 11.7 GB of deterministic partial-agg fallback
    // spill and 22 s/task, ALL of the scenario's spill (per-stage
    // attribution, round 15). Shuffling the raw narrow pairs first
    // moves ~2× the bytes but aggregates colocated keys in
    // |types|/partitions-sized maps — zero spill.
    // Width self-sized from the input's Catalyst estimate (the
    // [[exchangeWidthPlan]] convention, `kn` scope): bigram TYPES per
    // task grow with the corpus (the Zipf tail dominates types), so a
    // fixed session-width exchange re-creates the oversized-reducer
    // state this plan shape exists to avoid; demand past the bypass-
    // writer ceiling is paid as disjoint hash(a,b)-bucket passes —
    // a bigram type lives in exactly one bucket, so per-bucket counts
    // are COMPLETE and the union IS the single-pass table. Multi-pass
    // partials checkpoint eager DISK_ONLY (the bounded-KN convention:
    // serialize sibling aggregates; never pin model tables into the
    // storage-protected pool).
    val (biWidth, biPasses) = exchangeWidthPlan(docs, "kn")
    val biParts = (0 until biPasses).map { b =>
      val sliced = if (biPasses == 1) pairs.select(col("a"), col("b"))
        else pairs.select(col("a"), col("b")).filter(
          pmod(xxhash64(col("a"), col("b")), lit(biPasses.toLong)) === b)
      val agg = sliced
        .transform(sizedRepartition(_, biWidth, biPasses, col("a"), col("b")))
        .groupBy(col("a"), col("b"))
        .agg(count(lit(1)).as("c_ab"))
      if (biPasses == 1) agg
      else agg.localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }
    val bi =
      if (biPasses == 1) biParts.head.localCheckpoint(eager = false)
      else biParts.reduce(_ unionByName _)
    val ctx = bi.groupBy(col("a"))
      .agg(sum(col("c_ab")).as("c_a"), count(lit(1)).as("n1a"))
    val rights = bi.groupBy(col("b")).agg(count(lit(1)).as("n1b"))
    val nBigrams = Par.withoutAqe(docs.sparkSession)(bi.count()) // bounded driver plan parameter (q75's vocab)
    val p = (greatest(col("c_ab").cast("double") - lit(discount), lit(0.0)) +
      lit(discount) * col("n1a").cast("double") *
        (col("n1b").cast("double") / lit(nBigrams.toDouble))) /
      col("c_a").cast("double")
    // ctx/rights are |vocab| rows — broadcast them so the x-table is
    // a map-side decoration of bi, never a string-keyed SMJ
    val xtab = bi
      .join(broadcast(ctx), Seq("a"))
      .join(broadcast(rights), Seq("b"))
      .select(col("a"), col("b"), TextFunctions.round6(-log(p)).as("x"))
    // HOT-BIGRAM GUARD (the ngramJaccardPairs salting pattern): probe
    // keys are Zipf-distributed — the head bigram alone is percents of
    // ALL pairs and pins one reducer at corpus scale (kneser_ney_zipf
    // stress, 4% head bigram at 119M pairs: probe-stage max/median
    // task duration 3.5 unsalted → 1.66 salted; byte columns
    // UNDERSTATE this skew because a constant hot key's rows compress
    // ~10× better than the stream around them). Hot keys are
    // detected on a deterministic 1-in-8 doc sample (threshold halved
    // on top of the expected-value scaling so borderline keys salt
    // rather than miss) and carried as an InSet of xxhash64(a,b) — a
    // bounded plan parameter (≤ |pairs|/hotDf keys survive, always
    // driver-collectable); a 64-bit collision merely salts a cold key,
    // never drops a row. Hot probe rows spread over `salts` reducers
    // by doc-id hash; their x-rows replicate once per salt, so every
    // probe row still meets exactly ONE x-row and the per-doc sums
    // are unchanged (order-free DECIMAL). Cold keys ride salt 0: with
    // no hot keys the plan degenerates to the plain (a, b) join shape
    // plus one constant column.
    val sampleMod = 8
    val hotSet = Par.withoutAqe(docs.sparkSession)(pairs
      .filter(pmod(xxhash64(col("doc_id")), lit(sampleMod.toLong)) === 0)
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("df"))
      .filter(col("df") > hotDf / sampleMod / 2)
      .select(xxhash64(col("a"), col("b")).as("hk"))
      .collect()).map(_.getLong(0)).toSeq
    val isHot = xxhash64(col("a"), col("b")).isInCollection(hotSet)
    val (probe, build) =
      if (hotSet.isEmpty)
        (pairs.withColumn("salt", lit(0)),
          xtab.withColumn("salt", lit(0)))
      else
        (pairs.withColumn("salt",
            when(isHot, pmod(xxhash64(col("doc_id")), lit(salts.toLong))
              .cast("int")).otherwise(lit(0))),
          xtab.withColumn("salt", explode(
            when(isHot, sequence(lit(0), lit(salts - 1)))
              .otherwise(sequence(lit(0), lit(0))))))
    // hash join, x-table as build side: an SMJ would SORT the corpus-
    // scale pair stream (measured 20 GB of sort spill at the 119M-pair
    // stress point); hashing the bigram-bounded side costs its
    // partition's types only and the pair stream just flows through
    probe
      .join(build.hint("shuffle_hash"), Seq("a", "b", "salt"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(col("x").cast("decimal(28,6)")).as("s"))
      .select(col("doc_id"), col("n_pairs"),
        TextFunctions.round6(col("s").cast("double") /
          col("n_pairs").cast("double")).as("nll"))
  }

  /** TRIGRAM INTERPOLATED Kneser–Ney scoring — [[knScore]] one order
    * up (the direction real CCNet-class filters go: KenLM ships
    * 5-gram interpolated KN; the trigram form exercises every
    * structural discipline the jump needs). Chen & Goodman's
    * interpolated formulation with absolute discount d at BOTH
    * orders, lower-order counts as CONTINUATION counts over trigram
    * TYPES, unigram level from bigram types:
    *
    *   Pcont(c)  = N₁₊(·c) / |bigram types|
    *   P₂(c|b)   = (max(N₁₊(·bc)−d, 0) + d·N₁₊(b·*)·Pcont(c)) / N₁₊(·b·)
    *   P₃(c|a,b) = (max(c(abc)−d, 0) + d·N₁₊(ab·)·P₂(c|b)) / c(ab)
    *
    * where N₁₊(·bc) = distinct a with trigram (a,b,c); N₁₊(·b·) =
    * Σ_c N₁₊(·bc); N₁₊(b·*) = distinct c with any (·,b,c); N₁₊(ab·) =
    * distinct c after (a,b); c(ab) = Σ_c c(abc) (pair-left counts —
    * self-consistent at document edges); N₁₊(·c) = distinct b with
    * bigram (b,c). Scoring covers the training corpus, so every
    * denominator is positive and the max() never zeroes a term.
    *
    * Determinism: all model inputs are exact longs; each trigram's
    * −ln P₃ is ONE transcendental whose operand tree (casts, the
    * left-associated d·N·P products, the division order) the q161
    * oracle replays operand-for-operand, round6'd and DECIMAL-summed.
    *
    * Scale shape — the bigram lessons, held one order up: the corpus
    * tokenizes per pass and is never cached; the trigram-count
    * aggregate is REPARTITION-FIRST (types per scan task ≈ rows per
    * scan task — the round-15 spill attribution); every derived table
    * is finished at aggregate size — g1/g2 are trigram-type-keyed
    * model joins, g3/n1c are vocab-bounded broadcasts, |bigram types|
    * is a driver scalar; and the corpus-scale probe pays ONE
    * (a,b,c)-keyed shuffle_hash join against the finished x-table,
    * with [[knScore]]'s sampled hot-key guard salting Zipf-head
    * trigrams.
    *
    * "Model-sized" is a ZIPF-REUSE property that weakens one order up:
    * trigram types grow as vocab³, and on a pathological uniform draw
    * types ≈ occurrences — the checkpointed model table becomes
    * corpus-sized (the kn_trigram stress note). Natural corpora reuse
    * trigrams heavily; `minCount` is the KenLM-parity escape for the
    * rest:
    *
    * PRUNING (`minCount` > 1, KenLM's `--prune` on the top order,
    * default-shaped: KenLM prunes singleton trigrams): trigram types
    * with c(abc) < minCount are DROPPED from the x-table, so the one
    * trigram-type-sized model table is bounded by construction — on a
    * low-reuse corpus the singletons ARE the bulk of the types. Lower
    * orders keep their full unpruned counts (the KenLM convention:
    * adjusted counts are computed before pruning), so every
    * denominator stays exact. A scored trigram missing from the
    * pruned x-table — every corpus trigram exists pre-pruning, so a
    * miss means PRUNED, never unseen — backs off to the same
    * interpolation with its c3 term zeroed: P = d·N₁₊(ab·)·P₂(c|b) /
    * c(ab), paid as two bigram-type-keyed joins over only the pruned
    * OCCURRENCES (≈ the singleton types, a small share of corpus
    * occurrences by construction).
    * @return (doc_id, n_tris, nll) over docs ≥ 3 tokens. */
  /** The bounded-build decision for [[knTrigramScore]], factored out
    * so the verify/test surface can pin WHEN the branch engages (the
    * rankByHash adaptive convention): explicit
    * `spark.graft.kn.boundedBuild=true|false` wins; otherwise bounded
    * engages when the INPUT's Catalyst size estimate reaches
    * `spark.graft.kn.boundedBuildThresholdBytes` (default 256 MiB).
    * Unpruned models (minCount == 1) never take it — without pruning
    * there is no bounded model table to buy with the extra passes. */
  private[graft] def knBoundedSwitch(
      docs: DataFrame, minCount: Int): Boolean =
    minCount > 1 && {
      docs.sparkSession.conf.getOption("spark.graft.kn.boundedBuild") match {
        case Some(s) => s.toBoolean
        case None =>
          val threshold = docs.sparkSession.conf
            .getOption("spark.graft.kn.boundedBuildThresholdBytes")
            .map(_.toLong).getOrElse(256L * 1024 * 1024)
          docs.queryExecution.optimizedPlan.stats.sizeInBytes >= threshold
      }
    }

  def knTrigramScore(
      docs: DataFrame, idCol: String, textCol: String,
      discount: Double = 0.75,
      hotDf: Int = 65536, salts: Int = 16,
      minCount: Int = 1): DataFrame = {
    import TextFunctions.bindOnce
    require(discount > 0.0 && discount < 1.0,
      s"discount must be in (0, 1), got $discount")
    require(hotDf >= 16 && salts >= 2,
      s"hotDf >= 16 and salts >= 2 required, got hotDf=$hotDf salts=$salts")
    require(minCount >= 1, s"minCount must be >= 1, got $minCount")
    def tris = docs.select(col(idCol).as("doc_id"),
        TextFunctions.tokens(col(textCol)).as("t"))
      .select(col("doc_id"), explode(bindOnce(col("t")) { t =>
        when(size(t) < 3,
          array().cast("array<struct<a:string,b:string,c:string>>"))
          .otherwise(transform(sequence(lit(1), size(t) - 2), i =>
            struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"),
              element_at(t, i + 2).as("c"))))
      }).as("g"))
      .select(col("doc_id"), col("g.a").as("a"), col("g.b").as("b"),
        col("g.c").as("c"))
    def pairs = docs.select(TextFunctions.tokens(col(textCol)).as("t"))
      .select(explode(bindOnce(col("t")) { t =>
        when(size(t) < 2, array().cast("array<struct<a:string,b:string>>"))
          .otherwise(transform(sequence(lit(1), size(t) - 1), i =>
            struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
      }).as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"))
    // trigram model table: repartition-first (the knScore lesson),
    // width self-sized from the input's Catalyst estimate
    // ([[exchangeWidthPlan]], `kn` scope) — on the low-reuse corpora
    // the aggregate's per-task state grows with the corpus, so the
    // exchange must widen with it; demand past the bypass-writer
    // ceiling is paid as disjoint hash(a,b)-bucket passes in the
    // bounded branch below
    val (modelWidth, modelPasses) = exchangeWidthPlan(docs, "kn")
    val triBase = tris.select(col("a"), col("b"), col("c"))
    def triAggSlice(p: Int, passes: Int): DataFrame = {
      val sliced = if (passes == 1) triBase
        else triBase.filter(
          pmod(xxhash64(col("a"), col("b")), lit(passes.toLong)) === p)
      sliced
        .transform(sizedRepartition(_, modelWidth, modelPasses, col("a"), col("b"), col("c")))
        .groupBy(col("a"), col("b"), col("c"))
        .agg(count(lit(1)).as("c3"))
    }
    val triAgg = triAggSlice(0, 1)
    // Build-structure decision (PLAN only — values identical):
    //  - materialized build (minCount == 1 always, and pruning on a
    //    SMALL input): the aggregate IS the model table — checkpoint
    //    it once and serve every derived table from the
    //    materialization (one pass over the corpus).
    //  - bounded build (pruning on a large input): NEVER materialize
    //    the unpruned aggregate — on the low-reuse corpora the
    //    pruning dial exists for, it approaches corpus size (the
    //    measured 8 GiB OOM at the vocab-2000 stress point); instead
    //    the PRUNED x-table base and the bigram-type-BOUNDED derived
    //    tables each checkpoint, paying extra passes over the trigram
    //    exchange so that nothing corpus-sized ever pins. These
    //    checkpoints are EAGER: each re-runs the trigram aggregate,
    //    whose per-task state fits task memory ALONE (measured 0
    //    spill) but tips the shared pool when SIBLING copies overlap
    //    (the same plan spilled 0-20 GB run-to-run on scheduling
    //    luck); eager materialization serializes them (the IVF-Lloyd
    //    convention: jobs during construction are the operator's
    //    cost).
    // The switch ([[knBoundedSwitch]]) follows the rankByHash adaptive
    // convention; the pruned model's size is what's unknown — the
    // trigram-type count approaches the input size exactly in the
    // regime the bounded build exists for.
    val bounded = knBoundedSwitch(docs, minCount)
    val (triP, g1, g2) =
      if (!bounded) {
        val tri = triAgg.localCheckpoint(eager = false)
        val triP =
          if (minCount == 1) tri else tri.filter(col("c3") >= minCount)
        val g1 = tri.groupBy(col("a"), col("b"))
          .agg(sum(col("c3")).as("c2"), count(lit(1)).as("n3fw"))
        val g2 = tri.groupBy(col("b"), col("c"))
          .agg(count(lit(1)).as("cont"))
          .localCheckpoint(eager = false)
        (triP, g1, g2)
      } else {
        // bounded build, BUCKETED when the sizing rule demands more
        // width than the bypass ceiling allows: buckets key on
        // hash(a, b), so (a,b,c) types, the pruned x-table base and
        // the g1 (a,b) groups each complete WITHIN a bucket; g2's
        // (b,c) type counts span buckets but count DISJOINT type sets
        // (a trigram type lives in exactly one bucket), so per-bucket
        // partials SUM exactly. Every per-bucket table is bounded
        // (pruned rows / bigram types), checkpointed EAGER so sibling
        // aggregate copies never overlap the memory pool (the
        // IVF-Lloyd convention; measured 0-20 GB scheduling-luck
        // spill without it). Cost: 3 passes over each bucket's slice
        // of the trigram exchange = the same 3 corpus-equivalents the
        // single-bucket bounded build already paid, at per-task state
        // the sizing rule bounds REGARDLESS of corpus size.
        // DISK_ONLY checkpoints, deliberately: the unified memory
        // manager PROTECTS cached blocks below storageFraction from
        // execution eviction, so MEMORY_AND_DISK model tables (the
        // pruned base alone is ~2 GB at the 5M-doc stress point)
        // would permanently shrink every later corpus-scale
        // aggregate's execution share — measured as a 346 GB sort-agg
        // spill cascade at 5M docs before this level was set. The
        // tables are model-sized and re-read a handful of times;
        // streaming them from local disk costs ms, the stolen
        // execution memory cost hundreds of GB of spill.
        val disk = org.apache.spark.storage.StorageLevel.DISK_ONLY
        val parts = (0 until modelPasses).map { p =>
          val tp = triAggSlice(p, modelPasses)
          val triPp = tp.filter(col("c3") >= minCount)
            .localCheckpoint(eager = true, disk)
          val g1p = tp.groupBy(col("a"), col("b"))
            .agg(sum(col("c3")).as("c2"), count(lit(1)).as("n3fw"))
            .localCheckpoint(eager = true, disk)
          val g2p = tp.groupBy(col("b"), col("c"))
            .agg(count(lit(1)).as("cont"))
            .localCheckpoint(eager = true, disk)
          (triPp, g1p, g2p)
        }
        val triP = parts.map(_._1).reduce(_ unionByName _)
        val g1 = parts.map(_._2).reduce(_ unionByName _)
        val g2 =
          if (modelPasses == 1) parts.head._3
          else parts.map(_._3).reduce(_ unionByName _)
            .groupBy(col("b"), col("c"))
            .agg(sum(col("cont")).as("cont"))
            .localCheckpoint(eager = true, disk)
        (triP, g1, g2)
      }
    val g3 = g2.groupBy(col("b"))
      .agg(sum(col("cont")).as("nmid"), count(lit(1)).as("nfw2"))
    // bigram TYPES (unigram continuation level): repartition-first
    // distinct under the SAME width plan as the trigram model — type
    // state per task grows with the corpus, and a bigram type lives
    // in exactly one hash(a,b) bucket, so multi-pass distincts union
    // exactly (round-17 verdict #6: no fixed-width corpus-scale
    // exchanges left outside the sizing rule)
    val btParts = (0 until modelPasses).map { p =>
      val sliced = if (modelPasses == 1) pairs
        else pairs.filter(
          pmod(xxhash64(col("a"), col("b")), lit(modelPasses.toLong)) === p)
      val d = sizedRepartition(sliced, modelWidth, modelPasses, col("a"), col("b")).distinct()
      if (modelPasses == 1) d
      else d.localCheckpoint(eager = true,
        org.apache.spark.storage.StorageLevel.DISK_ONLY)
    }
    val bt =
      if (modelPasses == 1) btParts.head.localCheckpoint(eager = false)
      else btParts.reduce(_ unionByName _)
    val n1c = bt.groupBy(col("b").as("c")).agg(count(lit(1)).as("n1"))
    val nB = Par.withoutAqe(docs.sparkSession)(bt.count()) // bounded driver plan parameter
    val pcont = col("n1").cast("double") / lit(nB.toDouble)
    val p2 = (greatest(col("cont").cast("double") - lit(discount),
      lit(0.0)) +
      lit(discount) * col("nfw2").cast("double") * pcont) /
      col("nmid").cast("double")
    val p3 = (greatest(col("c3").cast("double") - lit(discount),
      lit(0.0)) +
      lit(discount) * col("n3fw").cast("double") * p2) /
      col("c2").cast("double")
    // model-sized joins: g1/g2 ride the trigram-type keys, g3/n1c are
    // vocab rows — broadcast
    // the HAVING lives in triP above: only the top order prunes;
    // g1/g2/g3/n1c all derive from the UNPRUNED counts, so every
    // denominator stays exact (the KenLM convention)
    val xtab = triP
      .join(g1, Seq("a", "b"))
      .join(g2, Seq("b", "c"))
      .join(broadcast(g3), Seq("b"))
      .join(broadcast(n1c), Seq("c"))
      .select(col("a"), col("b"), col("c"),
        TextFunctions.round6(-log(p3)).as("x"))
    // hot-trigram guard — knScore's sampled salting, keys one wider.
    // Repartition-first here too: in the low-reuse regime the sampled
    // keys are still ~corpus/8 mostly-unique, so a partial-agg-first
    // plan builds map-side tables that spill without combining (the
    // round-14 lesson); the sample is 1/8 of the narrow gram rows, so
    // one model-width exchange of it is cheap insurance at any reuse
    val sampleMod = 8
    val hotSet = Par.withoutAqe(docs.sparkSession)(tris
      .filter(pmod(xxhash64(col("doc_id")), lit(sampleMod.toLong)) === 0)
      .transform(sizedRepartition(_, modelWidth, modelPasses, col("a"), col("b"), col("c")))
      .groupBy(col("a"), col("b"), col("c")).agg(count(lit(1)).as("df"))
      .filter(col("df") > hotDf / sampleMod / 2)
      .select(xxhash64(col("a"), col("b"), col("c")).as("hk"))
      .collect()).map(_.getLong(0)).toSeq
    val isHot = xxhash64(col("a"), col("b"), col("c"))
      .isInCollection(hotSet)
    val (probe, build) =
      if (hotSet.isEmpty)
        (tris.withColumn("salt", lit(0)),
          xtab.withColumn("salt", lit(0)))
      else
        (tris.withColumn("salt",
            when(isHot, pmod(xxhash64(col("doc_id")), lit(salts.toLong))
              .cast("int")).otherwise(lit(0))),
          xtab.withColumn("salt", explode(
            when(isHot, sequence(lit(0), lit(salts - 1)))
              .otherwise(sequence(lit(0), lit(0))))))
    val scored =
      if (minCount == 1)
        probe
          .join(build.hint("shuffle_hash"), Seq("a", "b", "c", "salt"))
          .select(col("doc_id"), col("x"))
      else {
        // pruned model: a probe miss can only mean PRUNED (the corpus
        // trained the model, so every scored trigram was seen pre-
        // pruning); misses re-score through the backoff term alone,
        // paid as two bigram-type-keyed hash joins over just the
        // pruned occurrences. Hot trigrams are never pruned (hot ⇒
        // frequent), so the salt guard lives entirely on the hit
        // path. The probe side evaluates twice (inner + anti) — the
        // operator's standing convention; caching corpus-scale pair
        // rows to save a scan-side map is the measured anti-pattern
        // (the knScore DSIR lesson).
        val hits = probe
          .join(build.hint("shuffle_hash"), Seq("a", "b", "c", "salt"))
          .select(col("doc_id"), col("x"))
        val misses = probe
          .join(build.hint("shuffle_hash"), Seq("a", "b", "c", "salt"),
            "left_anti")
          .select(col("doc_id"), col("a"), col("b"), col("c"))
        val backoff = misses
          .join(g1.hint("shuffle_hash"), Seq("a", "b"))
          .join(g2.hint("shuffle_hash"), Seq("b", "c"))
          .join(broadcast(g3), Seq("b"))
          .join(broadcast(n1c), Seq("c"))
          .select(col("doc_id"), TextFunctions.round6(-log(
            lit(discount) * col("n3fw").cast("double") /
              col("c2").cast("double") * p2)).as("x"))
        // repartition-first for the per-doc rollup: the two-leg union
        // breaks the single-join plan's pipelined partial agg, and
        // doc_ids arrive scattered in (a,b,c) order — measured at the
        // low-reuse 1M-doc point, the planner's partial aggregates
        // held ~rows-sized maps and spilled 13.2 GB merging them;
        // shuffling the narrow (doc_id, x) rows once aggregates
        // clustered keys instead
        hits.unionByName(backoff).repartition(col("doc_id"))
      }
    scored
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_tris"),
        sum(col("x").cast("decimal(28,6)")).as("s"))
      .select(col("doc_id"), col("n_tris"),
        TextFunctions.round6(col("s").cast("double") /
          col("n_tris").cast("double")).as("nll"))
  }

  /** PMI COLLOCATIONS: pointwise mutual information of adjacent token
    * pairs over the whole corpus — ln((c_ab/N) / ((c_a/M)(c_b/M))) for
    * pairs seen ≥ minCount times. The standard phrase-mining /
    * tokenizer-diagnostics aggregate.
    *
    * Scale: two hash aggregations (bigram counts, token counts) whose
    * outputs are vocabulary-sized, then joins keyed on the token — all
    * data crossing the wire is aggregation OUTPUT. The N/M totals are
    * single scalars read via one tiny driver aggregate (bounded plan
    * parameters, same pattern as IVF centroids). */
  def pmiCollocations(
      docs: DataFrame, textCol: String, minCount: Long): DataFrame = {
    import TextFunctions.bindOnce
    val toks = docs.select(TextFunctions.tokens(col(textCol)).as("t"))
      .localCheckpoint(eager = false) // feeds bigram AND unigram branches
    val bigrams = toks.select(explode(bindOnce(col("t")) { t =>
        when(size(t) < 2, array().cast("array<struct<a:string,b:string>>")).otherwise(
          transform(sequence(lit(1), size(t) - 1),
            i => struct(element_at(t, i).as("a"), element_at(t, i + 1).as("b"))))
      }).as("g"))
      .select(col("g.a").as("a"), col("g.b").as("b"))
    // checkpointed: uni feeds BOTH join legs below — without a barrier
    // the explode+aggregate would run once per leg
    val uni = toks.select(explode(col("t")).as("tok"))
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
      .localCheckpoint(eager = false)
    val bi = bigrams.groupBy(col("a"), col("b")).agg(count(lit(1)).as("c_ab"))
      .filter(col("c_ab") >= minCount)
    // the N/M totals need no explode: per doc, bigrams = max(|t|−1, 0)
    // and tokens = |t|, so ONE scalar aggregate over the checkpointed
    // token arrays replaces two jobs that re-ran the explode streams
    // greatest(…, 0) on BOTH totals: size(NULL) is -1 under Spark's
    // default legacy sizeOfNull, and a null-text doc must contribute 0
    // to M exactly as the explode-derived total counted it
    val totals = toks.agg(
      coalesce(sum(greatest(size(col("t")) - 1, lit(0)).cast("long")),
        lit(0L)).as("nbi"),
      coalesce(sum(greatest(size(col("t")), lit(0)).cast("long")),
        lit(0L)).as("muni")).head
    val (nBi, mUni) = (totals.getLong(0), totals.getLong(1))
    bi.join(uni.withColumnRenamed("tok", "a").withColumnRenamed("c", "c_a"), "a")
      .join(uni.withColumnRenamed("tok", "b").withColumnRenamed("c", "c_b"), "b")
      .select(concat(col("a"), lit("_"), col("b")).as("gram"), col("c_ab"),
        TextFunctions.round6(
          log((col("c_ab").cast("double") / lit(nBi.toDouble)) /
            ((col("c_a").cast("double") / lit(mUni.toDouble)) *
             (col("c_b").cast("double") / lit(mUni.toDouble))))).as("pmi"))
  }

  /** GOPHER RULE-BASED QUALITY GATE — the published document-level
    * filter heuristics from Rae et al. 2021 (table A1), the standard
    * first-pass curation gate (MassiveText/RefinedWeb/Dolma lineage):
    *  - word count in [50, 100000];
    *  - mean word length in [3, 10] characters;
    *  - symbol-word ratio (words containing `#` or `...`) ≤ 0.1;
    *  - ≤ 90 % of non-blank lines start with a bullet (`-`/`*`);
    *  - ≤ 30 % of non-blank lines end with `...`;
    *  - ≥ 80 % of words contain an alphabetic character;
    *  - ≥ 2 of the required stopwords (the, be, to, of, and, that,
    *    have, with) occur as exact tokens.
    *
    * Shape at 100 TB: the eight counts come from ONE fused codegen
    * scan per document ([[graft.functions.GopherCounts]] — never a
    * HOF re-split per rule), ratios and flags are plain projections on
    * those integers, and nothing shuffles: the gate composes with the
    * scan (filter pushdown keeps `pass=true` consumers scan-side).
    * Ratios are [[TextFunctions.round6]]-rounded BEFORE the threshold
    * comparisons, so the flag arithmetic is engine-portable (the same
    * rounded decimal compares identically everywhere).
    *
    * @return (id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
    *         ellipsis_ratio, alpha_ratio, n_stop_present,
    *         n_rules_failed, pass) */
  def gopherQualityGate(
      docs: DataFrame, idCol: Column, textCol: Column): DataFrame = {
    import TextFunctions.round6
    val c = graft.functions.QualityKernels.gopher_counts(textCol)
    def ratio(num: Column, den: Column): Column =
      when(den === 0, lit(0.0))
        .otherwise(round6(num.cast("double") / den.cast("double")))
    val base = docs.select(idCol.as("id"), c.as("__c"))
      .select(col("id"),
        col("__c.n_words").as("n_words"),
        when(col("__c.n_words") === 0, lit(0.0))
          .otherwise(round6(col("__c.sum_word_chars").cast("double") /
            col("__c.n_words").cast("double"))).as("mean_word_len"),
        ratio(col("__c.n_symbol_words"), col("__c.n_words")).as("symbol_ratio"),
        ratio(col("__c.n_bullet_lines"), col("__c.n_lines")).as("bullet_ratio"),
        ratio(col("__c.n_ellipsis_lines"), col("__c.n_lines")).as("ellipsis_ratio"),
        ratio(col("__c.n_alpha_words"), col("__c.n_words")).as("alpha_ratio"),
        col("__c.n_stop_present").as("n_stop_present"))
    val failed =
      when(col("n_words") >= 50 && col("n_words") <= 100000, lit(0)).otherwise(lit(1)) +
      when(col("mean_word_len") >= 3.0 && col("mean_word_len") <= 10.0, lit(0)).otherwise(lit(1)) +
      when(col("symbol_ratio") <= 0.1, lit(0)).otherwise(lit(1)) +
      when(col("bullet_ratio") <= 0.9, lit(0)).otherwise(lit(1)) +
      when(col("ellipsis_ratio") <= 0.3, lit(0)).otherwise(lit(1)) +
      when(col("alpha_ratio") >= 0.8, lit(0)).otherwise(lit(1)) +
      when(col("n_stop_present") >= 2, lit(0)).otherwise(lit(1))
    base.withColumn("n_rules_failed", failed)
      .withColumn("pass", col("n_rules_failed") === 0)
  }

  /** MARKUP TEXT EXTRACTION — prose out of HTML-ish markup (the WET
    * extraction pass; see [[graft.functions.HtmlExtract]] for the
    * documented five-step contract). One codegen projection per row,
    * zero shuffle; at 100 TB this runs scan-side so the raw markup
    * never crosses the wire.
    * @return (id, clean_text, n_chars) */
  def extractHtmlText(
      docs: DataFrame, idCol: Column, htmlCol: Column): DataFrame =
    docs.select(idCol.as("id"),
        graft.functions.QualityKernels.html_extract(htmlCol).as("clean_text"))
      .withColumn("n_chars", length(col("clean_text")))

  /** C4 LINE-LEVEL FILTER — the Raffel et al. 2020 line-granular
    * cleaning pass ([[graft.functions.C4LineFilter]] holds the exact
    * contract): keep lines ending in terminal punctuation with ≥ 5
    * words and no `javascript`; flag docs containing `lorem ipsum` or
    * `{`; a doc survives with ≥ 3 kept lines and neither flag. One
    * codegen scan per document, zero shuffle — like the Gopher gate,
    * this composes scan-side under a `keep_doc` filter pushdown.
    * @return (id, clean_text, n_lines_kept, n_lines_dropped,
    *         has_lorem, has_brace, keep_doc) */
  def c4LineFilter(
      docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("id"),
        graft.functions.QualityKernels.c4_line_filter(textCol).as("__c"))
      .select(col("id"),
        col("__c.clean_text").as("clean_text"),
        col("__c.n_lines_kept").as("n_lines_kept"),
        col("__c.n_lines_dropped").as("n_lines_dropped"),
        col("__c.has_lorem").as("has_lorem"),
        col("__c.has_brace").as("has_brace"),
        col("__c.keep_doc").as("keep_doc"))

  /** CORPUS SNAPSHOT DIFF — what changed between two dataset versions
    * (the review gate every iterative corpus build runs before
    * retraining: how much churn did the new crawl/filter recipe
    * introduce?): full-outer join of the two snapshots on id,
    * comparing CONTENT FINGERPRINTS — (xxhash64(text), length), the
    * q13/q86 dedup fingerprint — never the text itself.
    *
    * Scale: both sides reduce to ~16 B/row (id, hash, len) at the
    * scan, so diffing two 10¹⁰-doc snapshots exchanges fingerprints
    * only; the join is the one shuffle. Status is exact for
    * fingerprint-equal content (hash+length collision odds are the
    * same ones the exact-dedup surface already accepts).
    * @return (id, status ∈ added|removed|changed|unchanged,
    *         old_len, new_len) */
  def snapshotDiff(
      oldDocs: DataFrame, newDocs: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    def fp(df: DataFrame, side: String) = df.select(
      col(idCol).cast("long").as("id"),
      xxhash64(col(textCol)).as(s"${side}_h"),
      length(col(textCol)).as(s"${side}_len"))
    fp(oldDocs, "old")
      .join(fp(newDocs, "new").withColumnRenamed("id", "__nid"),
        col("id") === col("__nid"), "full_outer")
      .select(
        coalesce(col("id"), col("__nid")).as("id"),
        when(col("id").isNull, lit("added"))
          .when(col("__nid").isNull, lit("removed"))
          .when(col("old_h") === col("new_h") &&
            col("old_len") === col("new_len"), lit("unchanged"))
          .otherwise(lit("changed")).as("status"),
        col("old_len"), col("new_len"))
  }

  /** PER-HOST DOCUMENT CAP — the domain-balance rule (RefinedWeb-style
    * "no single site dominates the corpus"): keep at most `cap` docs
    * per canonical host, deterministically the lowest-id ones. Host
    * comes from the [[graft.functions.CanonicalizeUrl]] key (scan-side
    * kernel + one regexp), so `HTTP://X.COM:80/..` and `http://x.com`
    * count against the same budget.
    *
    * Scale — the MEGAHOST guard: a crawl's top host is millions of
    * pages, and a single per-host window funnels all of them through
    * ONE reducer. Above a size threshold the cap runs TWO-LEVEL (the
    * rankByHash discipline): a per-(host, id-hash-block) window keeps
    * each block's `cap` lowest ids — the megahost spreads over
    * `blocks` reducers — then the global window ranks only the
    * survivors (≤ cap·blocks per host, a bounded table). Top-k of a
    * union IS the top-k of per-block top-k's, so the forms are
    * bit-identical on unique ids (the contract; row_number over tied
    * ids is arbitrary in ANY form). The small-input form stays the
    * single window: the second exchange + window are pure overhead
    * when the biggest host fits a task. Explicit
    * `spark.graft.corpus.twoLevelHostCap=true|false` forces a form;
    * otherwise the Catalyst size estimate decides (threshold conf
    * `spark.graft.corpus.twoLevelHostCapThresholdBytes`).
    * @return (id, host, host_rank) for KEPT docs, host_rank 1-based. */
  def perHostCap(
      urls: DataFrame, idCol: Column, urlCol: Column, cap: Int,
      blocks: Int = 64): DataFrame = {
    require(cap >= 1, "cap must be >= 1")
    require(blocks >= 2, "blocks must be >= 2")
    import org.apache.spark.sql.expressions.Window
    val host = regexp_extract(
      graft.functions.UrlKernels.canonicalize_url(urlCol),
      "^[^:/?#]+://([^/?]*)", 1)
    val narrow = urls.select(idCol.as("id"), host.as("host"))
    val conf = urls.sparkSession.conf
    val twoLevel =
      conf.getOption("spark.graft.corpus.twoLevelHostCap") match {
        case Some(s) => s.toBoolean
        case None =>
          val threshold = conf
            .getOption("spark.graft.corpus.twoLevelHostCapThresholdBytes")
            .map(_.toLong).getOrElse(256L * 1024 * 1024)
          narrow.queryExecution.optimizedPlan.stats.sizeInBytes >= threshold
      }
    val staged =
      if (!twoLevel) narrow
      else {
        val wb = Window.partitionBy(col("host"), col("__b"))
          .orderBy(col("id"))
        narrow
          .withColumn("__b", pmod(xxhash64(col("id")), lit(blocks.toLong)))
          .withColumn("__r", row_number().over(wb))
          .filter(col("__r") <= cap)
          .drop("__b", "__r")
      }
    val w = Window.partitionBy(col("host")).orderBy(col("id"))
    staged.withColumn("host_rank", row_number().over(w))
      .filter(col("host_rank") <= cap)
  }

  /** URL-CANONICAL DUPLICATE CLUSTERS — crawl dedup by normalized URL
    * (the cheapest, first dedup pass every web corpus runs before any
    * content fingerprinting): canonicalize
    * ([[graft.functions.CanonicalizeUrl]] — fragment/tracking-param
    * stripped, authority lowercased, default ports dropped, params
    * sorted), then one hash aggregation per canonical key.
    *
    * Scale: the canonicalizer is a scan-side codegen projection; only
    * the narrow (id, canon_url) rows reach the exchange, and the
    * default aggregate is map-side combinable — per-URL state, never
    * per-doc content.
    *
    * `countDocs` adds an exact distinct-doc count per cluster — a
    * PAIR-level (canon, id) aggregate; keep it off at scale unless the
    * workload genuinely repeats (id, url) rows (n_urls ≥ n_docs
    * always, with equality whenever a crawl log lists each (doc, url)
    * once).
    *
    * `combineFirst = false` (default) repartitions the narrow rows on
    * canon_url BEFORE aggregating: crawl-regime duplicates are
    * SCATTERED across input tasks, so the planner's pre-shuffle
    * partial hash maps achieve ~zero combine while holding ~all their
    * input distinct — measured at 50M URLs: 23.7 GB of partial-agg
    * spill with countDocs, 7.2 GB without, and the exchange was raw-
    * row-sized either way (1.0 GB — combine bought nothing); the
    * repartition-first plan moves the SAME 1.0 GB but aggregates
    * colocated keys in ~65k-key task maps, zero spill. Set
    * `combineFirst = true` only when the input is already clustered
    * by URL (then map-side combine genuinely shrinks the exchange).
    * @return (canon_url, host, n_urls[, n_docs], min_doc) */
  def urlDupClusters(
      urls: DataFrame, idCol: Column, urlCol: Column,
      countDocs: Boolean = false,
      combineFirst: Boolean = false): DataFrame = {
    val canon = urls.select(idCol.as("id"),
      graft.functions.UrlKernels.canonicalize_url(urlCol).as("canon_url"))
    val staged =
      if (combineFirst) canon else canon.repartition(col("canon_url"))
    val aggs =
      if (countDocs)
        Seq(count(lit(1)).as("n_urls"),
          countDistinct(col("id")).as("n_docs"),
          min(col("id")).as("min_doc"))
      else
        Seq(count(lit(1)).as("n_urls"), min(col("id")).as("min_doc"))
    staged.groupBy(col("canon_url"))
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("host",
        regexp_extract(col("canon_url"), "^[^:/?#]+://([^/?]*)", 1))
  }

  /** GLOBAL PARAGRAPH-LEVEL DEDUP — the CCNet/RefinedWeb first content
    * pass (Wenzek et al. 2020 dedup paragraphs across the WHOLE corpus
    * before any document-level fingerprinting — boilerplate like
    * cookie banners and nav footers repeats across millions of pages
    * but each page is still "unique" at document granularity):
    * documents split on `sep`, each trimmed non-empty paragraph keeps
    * only its GLOBALLY FIRST occurrence (lowest (doc id, position),
    * so intra-document repeats drop too), and every document is
    * rebuilt from its kept paragraphs in original order.
    *
    * Scale shape — content never rides the election: paragraphs
    * reduce to (id, pos, xxhash64, length) fingerprints (~28 B/row)
    * at the scan; the first-occurrence election is a window over
    * those narrow rows (per-reducer volume = a cluster's duplicate
    * count × 28 B, even for a 10⁸-copy cookie banner), kept positions
    * aggregate to ONE array row per surviving document, and the
    * rebuild is a scan-side HOF re-split of the original text joined
    * against that position table on id — document content crosses the
    * wire exactly once (the id join), never through the dedup window.
    * The naive form (window partitioned by the paragraph STRING,
    * rebuild via groupBy-collect) shuffles and sorts full content
    * twice; the stress scenario `paragraph_dedup[_flat]` measures the
    * two head-to-head.
    *
    * Trim/empty contract: paragraphs are `trim`med (ASCII space) for
    * fingerprinting and output; whitespace-only paragraphs are
    * dropped before the election (they are formatting, not content)
    * and `n_paras` counts non-empty paragraphs only. `sep` is a
    * LITERAL separator (regex-quoted for Spark's `split`), so the
    * oracle's `string_split` sees the identical cut points.
    * @return (id, clean_text, n_paras, n_kept) — one row per input
    *         document; fully-deduplicated documents keep clean_text =
    *         "" with n_kept = 0 (the caller applies CCNet's drop). */
  def paragraphDedup(
      docs: DataFrame, idCol: Column, textCol: Column,
      sep: String = "\n"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val quoted = java.util.regex.Pattern.quote(sep)
    val base = docs.select(idCol.cast("long").as("id"), textCol.as("__t"))
    val narrow = base
      .select(col("id"), posexplode(split(col("__t"), quoted)))
      .select(col("id"), col("pos"), trim(col("col")).as("__p"))
      .filter(length(col("__p")) > 0)
      .select(col("id"), col("pos"),
        xxhash64(col("__p")).as("__h"), length(col("__p")).as("__l"))
    val w = Window.partitionBy(col("__h"), col("__l"))
      .orderBy(col("id"), col("pos"))
    val keptPos = narrow
      .withColumn("__rk", row_number().over(w))
      .filter(col("__rk") === 1)
      .groupBy(col("id"))
      .agg(sort_array(collect_list(col("pos"))).as("__keep"),
        count(lit(1)).cast("long").as("n_kept"))
    val parts = split(col("__t"), quoted)
    val indexed = filter(
      transform(parts, (p, i) => struct(i.as("i"), trim(p).as("p"))),
      s => length(s.getField("p")) > 0)
    // __idx materializes in its OWN projection: HOF chains are
    // interpreted with no common-subexpression elimination, so
    // referencing `indexed` from both clean_text and n_paras in one
    // select would re-split and re-trim every paragraph per reference
    // (CollapseProject keeps the split because the producer expression
    // is non-cheap and consumed twice).
    base.join(keptPos, Seq("id"), "left")
      .select(col("id"), indexed.as("__idx"),
        coalesce(col("__keep"), array().cast("array<int>")).as("__k"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .select(col("id"),
        array_join(transform(
            filter(col("__idx"),
              s => array_contains(col("__k"), s.getField("i"))),
            s => s.getField("p")), sep).as("clean_text"),
        size(col("__idx")).cast("long").as("n_paras"),
        col("n_kept"))
  }

  /** DOMAIN-SUFFIX BLOCKLIST FILTER — the URL-level safety/quality
    * gate every web pipeline runs against curated domain lists (UT1,
    * adult/malware blocklists, RefinedWeb's banned domains): a URL is
    * blocked when ANY dot-suffix of its canonical host equals a
    * listed domain, so listing `example.com` blocks
    * `a.b.example.com` and case/port/tracking-param variants share
    * the verdict through the [[graft.functions.CanonicalizeUrl]] key
    * (the q134/q138 host derivation).
    *
    * Scale shape: hosts explode to their dot-suffixes — bounded by
    * label count (≤ ~5 for real hosts), narrow (id, suffix) rows —
    * and semi-join the blocklist, which is ALWAYS the broadcast side
    * (the largest public lists are ~10⁶ domains ≈ tens of MB); the
    * most-specific (longest) match aggregates per id map-side. No
    * wide exchange touches URL strings beyond the suffix rows.
    * @return (id, host, blocked, matched_domain) — `matched_domain`
    *         is the LONGEST matching listed suffix, NULL when
    *         `blocked` is false. */
  def blocklistFilter(
      urls: DataFrame, idCol: Column, urlCol: Column,
      blocked: DataFrame): DataFrame = {
    val host = regexp_extract(
      graft.functions.UrlKernels.canonicalize_url(urlCol),
      "^[^:/?#]+://([^/?]*)", 1)
    val hosts = urls.select(idCol.cast("long").as("id"), host.as("host"))
    // host "a.b.c" -> suffixes ["a.b.c", "b.c", "c"]: drop i labels
    // from the front for i in 0..n-1.
    val labels = split(col("host"), "\\.")
    val suffixes = transform(
      sequence(lit(0), size(labels) - 1),
      i => array_join(slice(labels, i + 1, size(labels)), "."))
    val matches = hosts
      .select(col("id"), col("host"), explode(suffixes).as("suffix"))
      .join(broadcast(blocked.select(col("domain").as("suffix"))), Seq("suffix"))
      .groupBy(col("id"))
      .agg(max_by(col("suffix"), length(col("suffix"))).as("matched_domain"))
    hosts.join(matches, Seq("id"), "left")
      .select(col("id"), col("host"),
        col("matched_domain").isNotNull.as("blocked"),
        col("matched_domain"))
  }

  /** PERPLEXITY HEAD/MIDDLE/TAIL BUCKETS — the CCNet selection step
    * that [[lmScore]]'s doc says it feeds (Wenzek et al. 2020: score
    * every document with an LM, split each language at the ⅓ and ⅔
    * perplexity quantiles, keep head — or sample buckets at different
    * rates): per-key exact interpolated percentile bounds (Spark
    * `percentile` ≡ DuckDB `quantile_cont`, the q53/q82 precedent —
    * no rounding policy needed), then a bucket label per row. Lower
    * score = better (an NLL), so `head` is score ≤ the pHead bound.
    *
    * Scale: one hash aggregate to key-count-sized bounds (exact
    * percentile state is O(distinct scores) per key — the [[lmScore]]
    * output is round6'd, capping distinct values; the
    * [[Quantiles.histogramQuantiles]] dial applies beyond that, and
    * the same state tripwire as winsorize guards the plan), then a
    * broadcast-friendly join back; scored rows never shuffle. NULL
    * scores get a NULL bucket.
    * @return `scored` + `bucket` ∈ head|middle|tail. */
  def perplexityBuckets(
      scored: DataFrame, keys: Seq[String], scoreCol: Column,
      pHead: Double = 1.0 / 3, pTail: Double = 2.0 / 3,
      maxDistinctPerKey: Long = 4000000L): DataFrame = {
    require(keys.nonEmpty, "perplexityBuckets needs at least one key")
    require(0.0 < pHead && pHead < pTail && pTail < 1.0,
      s"need 0 < pHead < pTail < 1, got ($pHead, $pTail)")
    val v = scoreCol.cast("double")
    val bounds = scored.groupBy(keys.map(col): _*)
      .agg(percentile(v, lit(pHead)).as("__lo"),
        percentile(v, lit(pTail)).as("__hi"),
        approx_count_distinct(v).as("__cd"))
    Normalize.guardDistinctState(scored.join(bounds, keys),
        "perplexityBuckets", maxDistinctPerKey)
      .withColumn("bucket",
        when(v.isNull, lit(null).cast("string"))
          .when(v <= col("__lo"), lit("head"))
          .when(v <= col("__hi"), lit("middle"))
          .otherwise(lit("tail")))
      .drop("__lo", "__hi", "__cd")
  }

  /** QUALITY-FILTER CALIBRATION SWEEP — the threshold-tuning loop a
    * pipeline runs before committing to a quality cut (the DCLM/
    * FineWeb "what fraction survives at t, and how much of the good
    * stuff do we keep" curve): for each candidate threshold, keep
    * docs with `scoreCol` ≥ t and report kept counts, precision and
    * recall against a boolean `labelCol` (a labeled subset, an LM
    * judge, or any proxy signal), plus the kept fraction.
    *
    * Scale shape: ONE scalar aggregate pass — each threshold
    * contributes two conditional sums to a single map-side-combined
    * aggregate (2·|thresholds|+2 running longs of state), then the
    * one-row result explodes to |thresholds| rows driver-side-free.
    * Never a per-threshold scan, never a shuffle of doc rows.
    * @return (threshold, n_kept, n_pos_kept, n_docs, n_pos,
    *         precision, recall, frac_kept); 0/0 ratios are NULL. */
  def thresholdSweep(
      docs: DataFrame, scoreCol: Column, labelCol: Column,
      thresholds: Seq[Double]): DataFrame = {
    require(thresholds.nonEmpty, "thresholds must be non-empty")
    import graft.functions.TextFunctions.round6
    val aggs =
      Seq(count(lit(1)).as("n_docs"),
        sum(when(labelCol, 1L).otherwise(0L)).as("n_pos")) ++
      thresholds.zipWithIndex.flatMap { case (t, i) => Seq(
        sum(when(scoreCol >= t, 1L).otherwise(0L)).as(s"__k$i"),
        sum(when(scoreCol >= t && labelCol, 1L).otherwise(0L))
          .as(s"__p$i")) }
    def ratio(num: Column, den: Column) =
      when(den === 0, lit(null).cast("double"))
        .otherwise(round6(num.cast("double") / den.cast("double")))
    val rows = thresholds.zipWithIndex.map { case (t, i) =>
      struct(lit(t).as("threshold"), col(s"__k$i").as("n_kept"),
        col(s"__p$i").as("n_pos_kept")) }
    docs.agg(aggs.head, aggs.tail: _*)
      .select(col("n_docs"), col("n_pos"),
        explode(array(rows: _*)).as("r"))
      .select(col("r.threshold").as("threshold"),
        col("r.n_kept").as("n_kept"),
        col("r.n_pos_kept").as("n_pos_kept"),
        col("n_docs"), col("n_pos"),
        ratio(col("r.n_pos_kept"), col("r.n_kept")).as("precision"),
        ratio(col("r.n_pos_kept"), col("n_pos")).as("recall"),
        ratio(col("r.n_kept"), col("n_docs")).as("frac_kept"))
  }

  /** UNICODE TEXT NORMALIZATION — the cleanup pass that runs before
    * anything fingerprints or tokenizes the text
    * ([[graft.functions.NormalizeTextExpr]] holds the exact contract:
    * CRLF/CR → LF, NFC composition, zero-width + C0-control strip).
    * Composed/decomposed encodings of the same visible text become
    * byte-identical, so exact dedup and shingle hashing stop treating
    * encoding accidents as distinct content. One codegen scan per
    * document, zero shuffle — fuses into the surrounding stage like
    * the Gopher/C4 kernels.
    * @return (id, clean_text, n_stripped, changed). */
  def normalizeText(
      docs: DataFrame, idCol: Column, textCol: Column): DataFrame =
    docs.select(idCol.as("id"),
        graft.functions.TextKernels.normalize_text(textCol).as("__n"))
      .select(col("id"),
        col("__n.clean_text").as("clean_text"),
        col("__n.n_stripped").cast("long").as("n_stripped"),
        col("__n.changed").as("changed"))
}
