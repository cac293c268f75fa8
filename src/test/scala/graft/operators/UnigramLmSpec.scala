package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UnigramLmSpec extends SparkSpec {
  import spark.implicits._

  // independent reference Viterbi (recursive, memo-free) — max total
  // score, ties by SMALLEST j at each position (longest last piece)
  private def refSegment(
      word: String, scores: Map[String, Double], maxLen: Int): Seq[String] = {
    val L = word.length
    val best = new Array[Double](L + 1)
    val choice = new Array[Int](L + 1)
    for (i <- 1 to L) {
      var bs = Double.NegativeInfinity; var bj = -1
      for (j <- math.max(0, i - maxLen) until i) {
        val s = scores.getOrElse(word.substring(j, i), -1e9)
        if (best(j) + s > bs) { bs = best(j) + s; bj = j }
      }
      best(i) = bs; choice(i) = bj
    }
    var pos = L; var out = List.empty[String]
    while (pos > 0) { out = word.substring(choice(pos), pos) :: out; pos = choice(pos) }
    out
  }

  test("unigram_segment: matches the reference DP, prefers high-score long pieces") {
    import graft.functions.UnigramSegment.unigram_segment
    val scores = Map("a" -> -3.0, "b" -> -3.0, "c" -> -3.0,
      "ab" -> -2.0, "bc" -> -1.5, "abc" -> -5.0)
    val words = Seq("abc", "abcabc", "cab", "b", "zzz").toDF("word")
    val got = words.select(col("word"),
        unigram_segment(col("word"), scores, 4).as("p"))
      .collect().map(r => r.getString(0) -> r.getSeq[String](1)).toMap
    words.collect().map(_.getString(0)).foreach { w =>
      assert(got(w) === refSegment(w, scores, 4), s"word $w")
    }
    // "abc": a+bc (-4.5) beats ab+c (-5.0) and abc (-5.0) and a+b+c (-9)
    assert(got("abc") === Seq("a", "bc"))
    // unknown chars still segment via the penalty path; the penalty
    // form favors the FEWEST unknown pieces (each costs −10⁹), so a
    // fully-unknown word stays whole — never occurs in training,
    // where every single char is in the vocabulary
    assert(got("zzz") === Seq("zzz"))
  }

  test("trainUnigram: frequent collocation earns a multi-char piece with high usage") {
    // 'sh' appears in every word of a frequent family; junk words vary
    val docs = ((1 to 30).map(i => s"shop shut shed") ++
      (1 to 3).map(i => s"x$i y$i")).toDF("text")
    val out = UnigramLm.trainUnigram(docs, "text", maxPieceLen = 3,
        minCount = 5, maxVocab = 50, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    val byPiece = out.map(t => t._1 -> t).toMap
    // EM settles on s + {hop, hut, hed}: the shared 's' piece absorbs
    // 90 uses (one per word occurrence) and each stem survives with
    // its 30 — a genuinely learned multi-char vocabulary (deterministic,
    // so the exact outcome is pinned)
    assert(byPiece("s")._3 === 90L)
    Seq("hop", "hut", "hed").foreach { p =>
      assert(byPiece(p)._3 === 30L, s"piece $p missing/wrong: " +
        out.map(_._1).sorted.mkString(","))
    }
    // every single char of the corpus survives the prune (completeness)
    val chars = "shoputed".map(_.toString).toSet
    assert(chars.forall(byPiece.contains))
    // unused singles are kept at usage 0; junk multi-char pieces are not
    assert(byPiece("h")._3 === 0L)
    assert(!byPiece.contains("sho") && !byPiece.contains("shu"))
    // scores on the 6dp grid, all log-probs non-positive
    assert(out.forall(t => t._2 <= 0.0))
    assert(out.forall(t => (t._2 * 1e6) == math.floor(t._2 * 1e6)))
  }

  test("segmentDocs: checksum equals the hand-built doc piece stream") {
    def phash(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      h
    }
    val scores = Map("a" -> -3.0, "b" -> -3.0, "c" -> -3.0,
      "ab" -> -2.0, "bc" -> -1.5)
    val d = Seq((1L, "abc cab"), (2L, "b")).toDF("doc_id", "text")
    val got = UnigramLm.segmentDocs(d, "doc_id", "text", scores, 4)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    // doc 1 stream: abc -> [a, bc]; cab -> [c, ab] => a,bc,c,ab @ 1..4
    val s1 = Seq("a", "bc", "c", "ab").zipWithIndex
      .map { case (p, i) => phash(p) * (i + 1) }.sum
    assert(got(1L) === ((4L, s1)))
    assert(got(2L) === ((1L, phash("b"))))
  }

  test("pruneScores: drops lowest multi-char pieces, keeps the single-char coverage floor, code-point lengths") {
    val m = Map("a" -> -9.0, "b" -> -8.0, "ab" -> -2.0, "ba" -> -2.0,
      "abc" -> -1.0, "bc" -> -3.0)
    // bottom-2 multi-char by (score asc, piece asc): bc(-3), then the
    // -2 tie breaks to ab before ba
    assert(UnigramLm.pruneScores(m, 2).keySet ===
      Set("a", "b", "ba", "abc"))
    assert(UnigramLm.pruneScores(m, 0) === m)
    // single chars survive any k — the coverage floor
    assert(UnigramLm.pruneScores(m, 100).keySet === Set("a", "b"))
    // character = code point: a surrogate-pair emoji is ONE char and
    // is never dropped, while the two-letter piece is
    val m2 = Map("😀" -> -20.0, "x" -> -1.0, "xy" -> -0.5)
    assert(UnigramLm.pruneScores(m2, 1).keySet ===
      Set("😀", "x"))
    // pruning an UNUSED piece leaves every segmentation unchanged
    val docs0 = Seq((1L, "ab ab b")).toDF("doc_id", "text")
    val full = Map("a" -> -3.0, "b" -> -3.0, "ab" -> -1.0, "zz" -> -9.0)
    assert(rows(UnigramLm.segmentDocs(docs0, "doc_id", "text",
        UnigramLm.pruneScores(full, 1), 4)) ===
      rows(UnigramLm.segmentDocs(docs0, "doc_id", "text", full, 4)))
  }

  test("trainUnigram: deterministic across runs and partitionings") {
    val docs = (1 to 40).map(i => "alpha beta alphabeta ab al").toDF("text")
    val a = UnigramLm.trainUnigram(docs.repartition(1), "text",
        maxPieceLen = 4, minCount = 3, maxVocab = 30, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    val b = UnigramLm.trainUnigram(docs.repartition(13), "text",
        maxPieceLen = 4, minCount = 3, maxVocab = 30, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).sortBy(_._1)
    assert(a.toSeq === b.toSeq)
    assert(a.nonEmpty)
  }
}
