package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** DISTRIBUTED BPE TOKENIZER TRAINING — the learning side of the
  * tokenizer seam ([[graft.functions.Bpe]] is the applying side): from
  * a corpus, learn the ranked merge list that greedy byte-pair
  * encoding uses (Sennrich et al. 2016, the published `learn_bpe`
  * loop; reference `merges.txt` artifact format).
  *
  * The algorithm is inherently round-sequential (merge r+1's counts
  * depend on merge r having been applied), so the scalable shape is
  * the one every production trainer (HF tokenizers, SentencePiece)
  * uses: touch the CORPUS once — a word-frequency aggregate — and run
  * the rounds over the DISTINCT-WORD table, which is vocabulary-sized
  * (Heaps' law: ~10⁶–10⁷ rows at 100 TB, not 10¹² tokens). Each round
  * is one weighted pair-count aggregate over that table plus one
  * narrow merge map; the driver receives exactly ONE row per round
  * (the argmax pair — a bounded plan parameter, the Lloyd-iteration
  * pattern), and `localCheckpoint` caps lineage growth across rounds
  * exactly as [[Dedup.duplicateClusters]] does.
  *
  * Determinism (what makes an external oracle possible):
  *  - words are whitespace tokens; symbols start as single characters;
  *  - pair counts are INTEGER sums of word frequencies over all
  *    ADJACENT symbol positions (overlapping adjacencies each count —
  *    the published counting rule);
  *  - the winning pair is (count desc, lhs asc, rhs asc) — a total
  *    order, so ties cannot diverge between engines;
  *  - applying a merge replaces LEFT-TO-RIGHT NON-OVERLAPPING
  *    occurrences (the published application rule). Words ride as
  *    DOUBLE-delimited symbol strings (`␟␟a␟␟b␟␟…`), and the merge is
  *    plain string `replace` of `␟l␟␟r␟` by `␟lr␟`: the pattern
  *    claims ONE delimiter from each outer boundary, so consecutive
  *    occurrences in a run (`aaaa` under pair (a,a)) each find their
  *    own boundary delimiter and merge exactly greedily — a
  *    SINGLE-delimited encoding gets this wrong, because the scan
  *    consumes the boundary the next occurrence needs (spec-pinned on
  *    the `aaaa` shape). A mid-symbol false match is impossible: a
  *    match starting at a boundary's second delimiter requires the
  *    full symbol to EQUAL `lhs` (the pattern's interior `␟␟` must
  *    land on a real boundary) and the next to equal `rhs`. `replace`
  *    scans left-to-right non-overlapping identically in Spark and
  *    ANSI SQL, so the whole loop replays unrolled in the oracle.
  */
object BpeTrain {

  /** Symbol delimiter (ASCII unit separator — cannot occur in text
    * tokens, which are whitespace-split). Boundaries between symbols
    * are DOUBLED (see the application rule above). */
  val Sep = "\u001f"
  private val SS = Sep + Sep

  /** Whitespace contract: words are maximal runs between ASCII
    * whitespace (space, tab, LF, CR, FF, VT) — an EXPLICIT class, not
    * `\s`, because Java's and RE2's `\s` disagree on VT and an oracle
    * must replay the split byte-for-byte. Symbol seeding uses
    * `(?s)(.)` so control characters inside words (which a
    * non-DOTALL `.` skips at line terminators) still become
    * single-character initial symbols. */
  val WhitespaceClass = "[ \t\n\r\f\u000B]+"

  /** One-pass corpus word-frequency table: (word, n). The ONLY
    * corpus-sized stage of training. */
  def wordCounts(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(filter(split(col(textCol), WhitespaceClass),
        w => w =!= "")).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("n"))

  /** TOKENIZER FERTILITY EVALUATION — the standard "how well does this
    * tokenizer fit this corpus" measurement (tokens-per-word /
    * chars-per-token, the fertility metric multilingual-tokenizer
    * papers report per language; here per `groupCol`, e.g. source).
    * Applies an already-learned ranked merge list by replaying the
    * SAME double-delimited greedy replace the trainer uses (BPE
    * application ≡ applying merges in rank order — each replace is the
    * trainer's own rule, so train-then-eval is exactly consistent),
    * chained as ONE nested-replace projection over the per-group
    * DISTINCT-WORD table — vocabulary-sized work per group, the corpus
    * is touched once for the (group, word) counts.
    * @return (group, n_words, n_tokens, n_chars, tokens_per_word,
    *         chars_per_token) — ratios round6'd. */
  def tokenizerFertility(
      docs: DataFrame, groupCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    import graft.functions.TextFunctions.round6
    val wc = docs
      .select(col(groupCol).as("grp"),
        explode(filter(split(col(textCol), WhitespaceClass),
          w => w =!= "")).as("word"))
      .groupBy(col("grp"), col("word")).agg(count(lit(1)).as("n"))
    val delimited = concat(lit(SS),
      regexp_replace(col("word"), "(?s)(.)", "$1" + SS))
    val applied = merges.foldLeft(delimited) { case (acc, (l, r)) =>
      replace(acc, lit(Sep + l + SS + r + Sep), lit(Sep + l + r + Sep))
    }
    wc.select(col("grp"), col("n"), length(col("word")).as("chars"),
        size(filter(split(applied, Sep), s => s =!= "")).as("toks"))
      .groupBy(col("grp"))
      .agg(sum(col("n")).as("n_words"),
        sum(col("toks").cast("long") * col("n")).as("n_tokens"),
        sum(col("chars").cast("long") * col("n")).as("n_chars"))
      .select(col("grp").as(groupCol), col("n_words"), col("n_tokens"),
        col("n_chars"),
        round6(col("n_tokens").cast("double") /
          col("n_words").cast("double")).as("tokens_per_word"),
        round6(col("n_chars").cast("double") /
          col("n_tokens").cast("double")).as("chars_per_token"))
  }

  /** Learn `nMerges` ranked merges from the corpus.
    * @return (rank, lhs, rhs, pair_count) — rank 0-based in learning
    *         order; pair_count the weighted adjacency count that won
    *         the round. Stops early if no adjacent pair remains. */
  def trainMerges(
      docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    require(nMerges >= 1, "nMerges must be >= 1")
    val spark = docs.sparkSession
    // ␟␟c1␟␟c2␟␟…␟␟ — one regexp pass appends ␟␟ to every char
    // ((?s): match control chars inside words too — see WhitespaceClass)
    var words = wordCounts(docs, textCol)
      .select(concat(lit(SS),
          regexp_replace(col("word"), "(?s)(.)", "$1" + SS)).as("w"),
        col("n"))
      .localCheckpoint()
    val learned = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    var r = 0
    var exhausted = false
    // AQE off for the merge loop (operators.Par.withoutAqe rationale):
    // every round is one tiny deterministic-result job (global top-1
    // pair + a checkpoint rewrite) over a bounded word table; AQE's
    // per-stage re-optimization is pure per-round latency here
    // (round-18 A/B: q130 steady 1.7 -> 1.2 s, q102 unchanged shape).
    Par.withoutAqe(docs.sparkSession) {
    while (r < nMerges && !exhausted) {
      val syms = filter(split(col("w"), Sep), s => s =!= "")
      val best = words
        .select(col("n"), syms.as("s"))
        .select(col("n"), explode(arrays_zip(
          slice(col("s"), lit(1), greatest(size(col("s")) - 1, lit(0))).as("l"),
          slice(col("s"), lit(2), greatest(size(col("s")) - 1, lit(0))).as("r"))).as("p"))
        .groupBy(col("p.l").as("lhs"), col("p.r").as("rhs"))
        .agg(sum(col("n")).as("c"))
        .orderBy(col("c").desc, col("lhs").asc, col("rhs").asc)
        .limit(1)
        .collect()
      if (best.isEmpty) exhausted = true
      else {
        val (l, rt, c) =
          (best(0).getString(0), best(0).getString(1), best(0).getLong(2))
        learned += ((r.toLong, l, rt, c))
        words = words
          .select(replace(col("w"), lit(Sep + l + SS + rt + Sep),
            lit(Sep + l + rt + Sep)).as("w"), col("n"))
          .localCheckpoint()
      }
      r += 1
    }
    }
    import spark.implicits._
    learned.toSeq.toDF("rank", "lhs", "rhs", "pair_count")
  }
}
