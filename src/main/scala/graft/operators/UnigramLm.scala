package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.round6
import graft.functions.UnigramSegment.unigram_segment

/** UNIGRAM-LM TOKENIZER TRAINING — the SentencePiece family (Kudo
  * 2018), the other production tokenizer next to BPE ([[BpeTrain]],
  * q130): pieces carry log-probabilities and segmentation maximizes a
  * word's total score, instead of BPE's greedy ranked merges. This is
  * a deliberately deterministic Viterbi-EM variant, every step
  * replayable in SQL:
  *
  *  - CANDIDATES: every substring of length 1..maxPieceLen of every
  *    distinct word, occurrence-counted (overlapping occurrences
  *    count, weighted by word frequency); kept = all single
  *    characters (the completeness guarantee: any word stays
  *    segmentable) ∪ the top `maxVocab` multi-char pieces with count
  *    ≥ minCount, ranked (count desc, piece asc) — a total order;
  *  - INIT: s₀(p) = round6(ln(c_p / T)), T = Σ c over kept pieces;
  *  - E-STEP: Viterbi-segment each DISTINCT word under the current
  *    scores ([[graft.functions.UnigramSegment]] — ties pinned:
  *    j ascending, strict >); piece usage = Σ word-frequency-weighted
  *    occurrences. The corpus is touched ONCE (the word-frequency
  *    aggregate); EM runs over the vocabulary-sized word table, the
  *    BpeTrain scale argument;
  *  - M-STEP: s(p) = round6(ln((u_p + 1) / (U + |V|))) — add-one
  *    smoothing over the FIXED candidate set (unused pieces sink, no
  *    mid-EM pruning, so the oracle unrolls without a dynamic vocab);
  *  - OUTPUT after `iters` EM rounds: pieces with final usage > 0
  *    plus all single characters (the prune step), with final scores.
  *
  * The score maps are bounded driver artifacts (≤ maxVocab +
  * |alphabet| entries — the Lloyd/BPE plan-parameter pattern); each
  * EM round is one segmentation projection + one vocab-sized hash
  * aggregate. At 100 TB: one corpus scan, then per-round work ∝
  * distinct words (Heaps' law), nothing else.
  */
object UnigramLm {

  /** Candidate substring pieces of the distinct-word table.
    *
    * The top-maxVocab rank is a single global window — its input is
    * NOT corpus-sized but substring-TYPE-sized after the minCount
    * filter (≤ maxPieceLen · Σ|word| over DISTINCT words, further cut
    * by minCount). On a 100 TB corpus with a 10⁷-word vocabulary that
    * is tens of millions of narrow rows through one reducer — raise
    * `minCount` (production trainers seed from high-frequency
    * substrings anyway) to keep it small; the EM rounds themselves
    * never touch this path again.
    * @param words (word, n) from [[BpeTrain.wordCounts]]
    * @return (piece, c) — kept per the rule above. */
  def candidatePieces(
      words: DataFrame, maxPieceLen: Int, minCount: Long,
      maxVocab: Int): DataFrame = {
    require(maxPieceLen >= 1, "maxPieceLen must be >= 1")
    require(maxVocab >= 1, "maxVocab must be >= 1")
    val counts = words.select(col("n"),
        explode(flatten(transform(
          sequence(lit(1), length(col("word"))),
          i => transform(
            sequence(lit(1),
              least(lit(maxPieceLen), length(col("word")) - i + 1)),
            l => col("word").substr(i, l))))).as("piece"))
      .groupBy(col("piece")).agg(sum(col("n")).as("c"))
    val singles = counts.filter(length(col("piece")) === 1)
    val multi = counts.filter(length(col("piece")) > 1 &&
        col("c") >= minCount)
      .withColumn("__r", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("c").desc, col("piece").asc)))
      .filter(col("__r") <= maxVocab)
      .drop("__r")
    singles.unionByName(multi)
  }

  /** SERVING PATH — segment whole documents under a trained piece
    * table (the q102 apply-side mirror of this trainer, as
    * `Bpe.bpe_tokenize` is to [[BpeTrain]]): every word Viterbi-
    * segments independently ([[graft.functions.UnigramSegment]], the
    * same kernel the E-step uses — train and serve cannot diverge),
    * and the document's piece STREAM (word order × in-word piece
    * order) is pinned by a position-weighted portable-hash checksum —
    * Σ hash(piece)·position, exact long arithmetic (≤ 10⁹·stream
    * length, far inside Long). One narrow projection + one per-doc
    * window; the trained map rides as a bounded literal.
    * @return (id, n_pieces, piece_checksum). */
  def segmentDocs(
      docs: DataFrame, idCol: String, textCol: String,
      scores: Map[String, Double], maxPieceLen: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val words = docs.select(col(idCol).cast("long").as("id"),
        posexplode(filter(split(col(textCol), BpeTrain.WhitespaceClass),
          w => w =!= "")).as(Seq("wi", "word")))
    val pieces = words.select(col("id"), col("wi"),
        posexplode(unigram_segment(col("word"), scores, maxPieceLen))
          .as(Seq("pi", "piece")))
      .withColumn("pos", row_number().over(
        Window.partitionBy(col("id"))
          .orderBy(col("wi").asc, col("pi").asc)))
    pieces.groupBy(col("id"))
      .agg(count(lit(1)).as("n_pieces"),
        sum(graft.functions.PortableHash.portable_hash(col("piece")) *
          col("pos").cast("long")).as("piece_checksum"))
  }

  /** VOCABULARY PRUNING — the shrink step of the SentencePiece
    * lifecycle (public recipe: train large, then drop the
    * lowest-value pieces and re-segment — the serving-cost dial;
    * SentencePiece proper ranks by likelihood loss, this engine form
    * ranks by the trained log-score, documented simplification):
    * drops the `dropMulti` LOWEST-scoring multi-character pieces
    * (ties by piece ascending — deterministic, oracle-replayable);
    * single-CHARACTER pieces are never dropped — they are the
    * coverage floor that keeps every word segmentable. Character =
    * Unicode code point (mirrors SQL `length()`), not UTF-16 units.
    * Scores are NOT renormalized: Viterbi only reads relative
    * log-scores, so the pruned map serves directly. */
  def pruneScores(
      scores: Map[String, Double], dropMulti: Int): Map[String, Double] = {
    require(dropMulti >= 0, "dropMulti must be >= 0")
    val dropped = scores.toSeq
      .filter { case (p, _) => p.codePointCount(0, p.length) > 1 }
      .sortBy { case (p, sc) => (sc, p) }
      .take(dropMulti).map(_._1).toSet
    scores -- dropped
  }

  /** Train for `iters` Viterbi-EM rounds; returns the final piece
    * table (piece, score, usage) as described above. */
  def trainUnigram(
      docs: DataFrame, textCol: String, maxPieceLen: Int = 4,
      minCount: Long = 2, maxVocab: Int = 1000,
      iters: Int = 2): DataFrame = {
    require(iters >= 1, "iters must be >= 1")
    def r6(v: Double): Double = math.floor(v * 1e6 + 0.5) / 1e6
    val words = BpeTrain.wordCounts(docs, textCol)
      .localCheckpoint(eager = false) // one corpus scan feeds every round
    val cand = candidatePieces(words, maxPieceLen, minCount, maxVocab)
      .localCheckpoint(eager = false) // feeds the score maps AND the output
    val kept = cand.collect()
      .map(r => (r.getString(0), r.getLong(1))) // bounded vocab artifact
    val vSize = kept.length
    val t0 = kept.map(_._2).sum
    var scores: Map[String, Double] =
      kept.map { case (p, c) => p -> r6(math.log(c.toDouble / t0)) }.toMap
    var usage: DataFrame = null
    var uTotal = 0L
    // AQE off for the EM loop (operators.Par.withoutAqe rationale):
    // one deterministic usage-count collect per round over bounded
    // tables — AQE re-optimization is pure per-round latency.
    Par.withoutAqe(words.sparkSession) {
      for (_ <- 1 to iters) {
        usage = words.select(col("n"),
            explode(unigram_segment(col("word"), scores, maxPieceLen))
              .as("piece"))
          .groupBy(col("piece")).agg(sum(col("n")).as("u"))
          .localCheckpoint(eager = false) // last round's table feeds output
        val uMap = usage.collect()
          .map(r => (r.getString(0), r.getLong(1))).toMap
        uTotal = uMap.valuesIterator.sum
        scores = kept.map { case (p, _) =>
          p -> r6(math.log((uMap.getOrElse(p, 0L) + 1).toDouble /
            (uTotal + vSize).toDouble))
        }.toMap
      }
    }
    cand.select(col("piece"))
      .join(usage, Seq("piece"), "left")
      .select(col("piece"), coalesce(col("u"), lit(0L)).as("usage"))
      .filter(col("usage") > 0 || length(col("piece")) === 1)
      .select(col("piece"),
        round6(log((col("usage") + 1).cast("double") /
          lit((uTotal + vSize).toDouble))).as("score"),
        col("usage"))
  }
}
