package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference: the published learn_bpe loop (overlapping
    * adjacency counts, (count desc, lhs, rhs) argmax, greedy
    * left-to-right non-overlapping application). */
  private def reference(
      corpus: Seq[String], nMerges: Int): Seq[(Long, String, String, Long)] = {
    var words: Map[Vector[String], Long] = corpus
      .flatMap(_.split(BpeTrain.WhitespaceClass).filter(_.nonEmpty))
      .groupBy(identity).map { case (w, ws) =>
        w.map(_.toString).toVector -> ws.size.toLong
      }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, Long)]
    for (r <- 0 until nMerges) {
      val counts = scala.collection.mutable.Map
        .empty[(String, String), Long].withDefaultValue(0L)
      words.foreach { case (syms, n) =>
        syms.sliding(2).filter(_.size == 2)
          .foreach(p => counts((p(0), p(1))) += n)
      }
      if (counts.nonEmpty) {
        val ((l, rt), c) = counts.toSeq
          .sortBy { case ((a, b), n) => (-n, a, b) }.head
        out += ((r.toLong, l, rt, c))
        words = words.map { case (syms, n) =>
          val merged = scala.collection.mutable.ArrayBuffer.empty[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == rt) {
              merged += l + rt; i += 2
            } else { merged += syms(i); i += 1 }
          }
          merged.toVector -> n
        }.groupBy(_._1).map { case (k, vs) => k -> vs.values.sum }
      }
    }
    out.toSeq
  }

  test("trainMerges matches the published learn_bpe loop (classic low/lower/lowest corpus)") {
    val corpus = Seq(
      "low low low low low lower lower newest newest",
      "newest newest newest newest widest widest widest")
    val docs = corpus.toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", nMerges = 6)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got === reference(corpus, 6))
    // the classic result: 'es' then 'est' emerge from newest/widest
    assert(got.map(m => m._2 + m._3).contains("es"))
    assert(got.map(m => m._2 + m._3).contains("est"))
  }

  test("greedy non-overlapping application: 'aaaa' merges left-to-right") {
    // one word "aaaa" ×3: round 0 counts (a,a)=9 (overlapping),
    // application yields [aa, aa]; round 1 merges (aa,aa)
    val docs = Seq("aaaa aaaa aaaa").toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", nMerges = 2)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got === Seq((0L, "a", "a", 9L), (1L, "aa", "aa", 3L)))
  }

  test("early exhaustion: single-char words stop the loop") {
    val docs = Seq("a b c a b").toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", nMerges = 5)
    assert(got.count() === 0L)
  }

  test("random corpora: engine equals reference on every round") {
    val rnd = new scala.util.Random(7)
    val corpus = (0 until 3).map(_ => (0 until 80).map(_ =>
      (0 until (1 + rnd.nextInt(6))).map(_ =>
        ('a' + rnd.nextInt(4)).toChar).mkString).mkString(" "))
    val docs = corpus.toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", nMerges = 10)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got === reference(corpus, 10))
  }

  test("whitespace contract: tabs/newlines/CRLF split words like spaces") {
    // pre-fix, "low\nlow" was ONE word whose \n became a multi-char
    // 'initial symbol' ("w\nl"), silently violating chars-then-merges
    val corpus = Seq("low\nlow\tlow low\r\nlower\flower",
      "newestnewest\n\nnewest  newest newest widest\twidest widest")
    val docs = corpus.toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", nMerges = 6)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got === reference(corpus, 6))
    // identical to the same corpus with plain spaces — the split class
    // is behavior-invisible beyond tokenization
    val spaced = corpus.map(_.replaceAll("[ \t\n\r\f]+", " "))
    val got2 = BpeTrain.trainMerges(spaced.toDF("text"), "text", nMerges = 6)
      .collect().map(r =>
        (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      .sortBy(_._1)
    assert(got === got2)
    // no learned symbol may contain whitespace
    assert(got.forall { case (_, l, r, _) =>
      !(l + r).exists(c => " \t\n\r\f".contains(c)) })
  }
  test("tokenizerFertility matches a word-level reference under the trained merges") {
    val corpus = Seq(
      ("a", "low low lower lowest low"),
      ("b", "newest newest widest new"),
      ("b", "low newest lowest lowest"))
    val docs = corpus.toDF("source", "text")
    val merges = BpeTrain.trainMerges(docs, "text", nMerges = 6)
      .orderBy(col("rank")).collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val got = BpeTrain.tokenizerFertility(docs, "source", "text", merges)
      .orderBy("source").collect()
    // reference: apply merges in rank order to each word
    def tokens(word: String): Int = {
      var syms = word.map(_.toString).toVector
      merges.foreach { case (l, r) =>
        val out = scala.collection.mutable.ArrayBuffer.empty[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) {
            out += l + r; i += 2
          } else { out += syms(i); i += 1 }
        }
        syms = out.toVector
      }
      syms.length
    }
    def round6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val bySource = corpus.groupBy(_._1).map { case (src, rows) =>
      val words = rows.flatMap(_._2.split(" ")).filter(_.nonEmpty)
      val nT = words.map(tokens).sum.toLong
      val nC = words.map(_.length.toLong).sum
      (src, words.length.toLong, nT, nC)
    }
    got.foreach { r =>
      val (_, nw, nt, nc) = bySource.find(_._1 == r.getString(0)).get
      assert(r.getLong(1) === nw)
      assert(r.getLong(2) === nt)
      assert(r.getLong(3) === nc)
      assert(r.getDouble(4) === round6(nt.toDouble / nw))
      assert(r.getDouble(5) === round6(nc.toDouble / nt))
    }
    // no merges -> every token is a character
    val flat = BpeTrain.tokenizerFertility(docs, "source", "text", Nil)
      .collect()
    flat.foreach(r => assert(r.getLong(2) === r.getLong(3)))
  }
}
