package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class PackingSpec extends SparkSpec {
  import spark.implicits._

  test("hashSplit: exhaustive, disjoint, roughly proportional, stable") {
    val d = (1L to 1000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val out = Sampling.hashSplit(d, col("doc_id"),
      Seq(("train", 80), ("val", 10), ("test", 10)))
    assert(out.count() === 1000L) // every row labeled exactly once
    val byLabel = out.groupBy("split").count()
      .as[(String, Long)].collect().toMap
    assert(byLabel.keySet === Set("train", "val", "test"))
    assert(byLabel("train") > 700 && byLabel("train") < 900)
    // growth stability: a superset corpus keeps old ids in old splits
    val bigger = (1L to 2000L).map(i => (i, s"doc $i")).toDF("doc_id", "text")
    val again = Sampling.hashSplit(bigger, col("doc_id"),
        Seq(("train", 80), ("val", 10), ("test", 10)))
      .filter(col("doc_id") <= 1000).select("doc_id", "split")
    assert(rows(again) === rows(out.select("doc_id", "split")))
    intercept[IllegalArgumentException](
      Sampling.hashSplit(d, col("doc_id"), Seq(("a", 50), ("b", 40))))
  }

  test("weightedSample: weight-sensitive, deterministic, excludes w<=0") {
    // 2000 rows: ids ≡ 0 mod 4 get weight 50, others weight 1 — heavy
    // rows should dominate the sample far beyond their 25% share
    val d = (1L to 2000L)
      .map(i => (i, if (i % 4 == 0) 50.0 else 1.0)).toDF("id", "w")
    val out = Sampling.weightedSample(d, col("id"), col("w"), k = 200)
    val ids = out.select("id").as[Long].collect()
    assert(ids.length === 200)
    val heavy = ids.count(_ % 4 == 0)
    assert(heavy > 150, s"heavy rows won only $heavy of 200")
    // deterministic: identical on a different partitioning
    val again = Sampling.weightedSample(d.repartition(17), col("id"), col("w"), 200)
    assert(rows(again) === rows(out))
    // zero/negative weights can never win
    val z = Sampling.weightedSample(
      Seq((1L, 0.0), (2L, -3.0), (3L, 1.0)).toDF("id", "w"),
      col("id"), col("w"), 5)
    assert(z.select("id").as[Long].collect().toSeq === Seq(3L))
  }

  test("concatChunks: per-shard streams are gapless; chunk spans exact") {
    val d = (1L to 200L).map(i => (i, i % 7 + 1)).toDF("id", "toks")
    val out = Packing.concatChunks(d, col("id"), col("toks"),
      contextLen = 10, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5)))
    // gapless concatenation within each shard, in id order
    out.groupBy(_._2).foreach { case (_, rs) =>
      val sorted = rs.sortBy(_._1)
      var off = 0L
      sorted.foreach { case (_, _, toks, start, chunk, n) =>
        assert(start === off)
        assert(chunk === start / 10)
        assert(n === (start + toks - 1) / 10 - start / 10 + 1)
        off += toks
      }
    }
    // a doc longer than the context spans multiple chunks
    val big = Seq((1L, 25L)).toDF("id", "toks")
    val r = Packing.concatChunks(big, col("id"), col("toks"), 10, 1)
      .collect().head
    assert(r.getLong(5) === 3L) // 25 tokens from offset 0 → chunks 0,1,2

    // empty docs occupy no stream space and span zero chunks
    val withEmpty = Seq((1L, 5L), (2L, 0L), (3L, 7L)).toDF("id", "toks")
    val rs = Packing.concatChunks(withEmpty, col("id"), col("toks"), 10, 1)
      .orderBy("id").collect()
    assert(rs.map(_.getLong(5)).toSeq === Seq(1L, 0L, 2L)) // doc 3: offs 5..11 → 2 chunks
    assert(rs.map(_.getLong(3)).toSeq === Seq(0L, 5L, 5L))
  }

  test("packTokenChunks: chunks reassemble the exact per-shard stream") {
    // deterministic ids: doc i carries tokens [i*100 .. i*100 + len)
    val docs = (1L to 40L).map { i =>
      (i, (0 until (i % 7 + 1).toInt).map(k => (i * 100 + k).toInt))
    }.toDF("id", "ids")
    val out = Packing.packTokenChunks(docs, col("id"), col("ids"),
        contextLen = 10, nShards = 3)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2)))
    // reference stream: same shard hash + id order as concatChunks
    val byId = docs.collect()
      .map(r => (r.getLong(0), r.getSeq[Int](1))).toMap
    val shardOf = Packing.concatChunks(
        docs.select(col("id"), org.apache.spark.sql.functions.size(col("ids")).as("toks")),
        col("id"), col("toks"), 10, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val streams = byId.keys.toSeq.sorted
      .groupBy(shardOf)
      .map { case (sh, ids) => sh -> ids.flatMap(byId) }
    out.groupBy(_._1).foreach { case (sh, chunks) =>
      val rebuilt = chunks.sortBy(_._2).flatMap(_._3).toSeq
      assert(rebuilt === streams(sh.toLong), s"shard $sh stream")
      // every chunk except the shard's last is exactly contextLen
      val sorted = chunks.sortBy(_._2)
      sorted.dropRight(1).foreach { c =>
        assert(c._3.length === 10, s"shard $sh chunk ${c._2}") }
    }
    // a chunk boundary mid-document splits the doc's tokens across
    // chunks without loss (covered by the stream equality above, but
    // pin one concrete case: the first shard's chunk 0 is full)
    assert(out.filter(c => c._2 == 0L).forall(_._3.nonEmpty))
  }

  test("shuffleShards: per-shard mix enforced, seeded order deterministic, seed-sensitive") {
    // 3 sources × 40 docs, interleaved ids so source blocks don't align
    val docs = (0L until 120L)
      .map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val mix = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    def run(seed: Long) = Packing.shuffleShards(docs, "doc_id", "source",
      seed, nShards = 4, mix = mix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(r => (r._1, r._2))
    val a = run(7L)
    // quotas: N = min(floor(40/.5)=80, floor(40/.25)=160) = 80 →
    // src0 40, src1 20, src2 20 docs
    assert(a.length === 80)
    assert(a.count(_._4 == "src0") === 40)
    assert(a.count(_._4 == "src1") === 20)
    // the MIX holds per shard (round-robin): each of 4 shards gets
    // exactly 10 src0 + 5 src1 + 5 src2
    (0L until 4L).foreach { sh =>
      val s = a.filter(_._1 == sh)
      assert(s.count(_._4 == "src0") === 10, s"shard $sh")
      assert(s.count(_._4 == "src1") === 5, s"shard $sh")
      assert(s.count(_._4 == "src2") === 5, s"shard $sh")
      // positions are dense 0..n-1
      assert(s.map(_._2).toSeq === (0L until s.length.toLong).toSeq)
    }
    // identical seed reproduces the run bit-for-bit
    assert(run(7L).toSeq === a.toSeq)
    // a different seed permutes the training order
    assert(run(8L).map(_._3).toSeq !== a.map(_._3).toSeq)
    // sources interleave within shards rather than arriving in blocks:
    // shard 0's first 10 positions can't all be one source
    assert(a.filter(_._1 == 0L).take(10).map(_._4).distinct.length > 1)
  }

  test("curriculumOrder: anneal tail held out of the bulk, appended per shard, deterministic") {
    val docs = (0L until 120L)
      .map(i => (i, s"src${i % 3}", if (i % 5 == 0) 0.9 else 0.1))
      .toDF("doc_id", "source", "qual")
    val mix = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    def run(seed: Long) = Packing.curriculumOrder(docs, "doc_id", "source",
      seed, nShards = 4, mix = mix, annealWhen = col("qual") >= 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).sortBy(r => (r._1, r._2))
    val a = run(7L)
    val annealIds = (0L until 120L).filter(_ % 5 == 0).toSet
    // phase 1 is EXACTLY the predicate-selected docs (24 of 120)...
    assert(a.filter(_._5 == 1L).map(_._3).toSet === annealIds)
    // ...and the bulk never contains one (held out, trained once)
    assert(a.filter(_._5 == 0L).map(_._3).toSet.intersect(annealIds).isEmpty)
    assert(a.map(_._3).distinct.length === a.length)
    (0L until 4L).foreach { sh =>
      val s = a.filter(_._1 == sh)
      // positions are dense 0..n-1 across BOTH phases...
      assert(s.map(_._2).toSeq === (0L until s.length.toLong).toSeq)
      // ...with every phase-0 position strictly before every phase-1
      val n0 = s.count(_._5 == 0L)
      assert(s.filter(_._5 == 0L).forall(_._2 < n0), s"shard $sh")
      assert(s.filter(_._5 == 1L).forall(_._2 >= n0), s"shard $sh")
    }
    // bulk-phase mix is enforced on the REMAINING pool: 32 src0 +
    // 16 src1 + 16 src2 per the quota rule over 96 non-anneal docs
    val bulk = a.filter(_._5 == 0L)
    assert(bulk.count(_._4 == "src0") === 32)
    assert(bulk.count(_._4 == "src1") === 16)
    assert(bulk.count(_._4 == "src2") === 16)
    // identical seed reproduces bit-for-bit; another seed permutes
    assert(run(7L).toSeq === a.toSeq)
    assert(run(8L).map(_._3).toSeq !== a.map(_._3).toSeq)
    // an all-false predicate reduces to plain shuffleShards + phase 0
    val plain = Packing.shuffleShards(docs, "doc_id", "source", 7L,
      nShards = 4, mix = mix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(r => (r._1, r._2))
    val none = Packing.curriculumOrder(docs, "doc_id", "source", 7L,
      nShards = 4, mix = mix, annealWhen = lit(false))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).sortBy(r => (r._1, r._2))
    assert(none.forall(_._5 == 0L))
    assert(none.map(r => (r._1, r._2, r._3, r._4)).toSeq === plain.toSeq)
  }

  test("epochOrder: same doc set every epoch, per-shard mix and counts invariant, orders differ, positions dense across epochs") {
    val docs = (0L until 120L)
      .map(i => (i, s"src${i % 3}"))
      .toDF("doc_id", "source")
    val mix = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    def run(seed: Long) = Packing.epochOrder(docs, "doc_id", "source",
      seed, nShards = 4, mix = mix, epochs = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3), r.getLong(4))).sortBy(r => (r._1, r._2))
    val a = run(7L)
    assert(a.length === 3 * 80)
    val byEpoch = a.groupBy(_._5)
    // every epoch trains EXACTLY the quota-selected set
    val set0 = byEpoch(0L).map(_._3).toSet
    assert(set0.size === 80)
    (1L to 2L).foreach(e => assert(byEpoch(e).map(_._3).toSet === set0))
    // per-shard source mix and counts hold in every epoch
    (0L until 4L).foreach { sh =>
      (0L to 2L).foreach { e =>
        val s = a.filter(r => r._1 == sh && r._5 == e)
        assert(s.count(_._4 == "src0") === 10, s"shard $sh epoch $e")
        assert(s.count(_._4 == "src1") === 5, s"shard $sh epoch $e")
        assert(s.length === 20, s"shard $sh epoch $e")
      }
      // positions are dense 0..59 across the three epochs, in
      // epoch-major order (epoch e occupies [20e, 20e+20))
      val s = a.filter(_._1 == sh)
      assert(s.map(_._2).toSeq === (0L until 60L).toSeq)
      s.foreach(r => assert(r._2 / 20 === r._5, s"$r"))
    }
    // each epoch draws a DIFFERENT order of the same docs
    assert(byEpoch(0L).map(_._3).toSeq !== byEpoch(1L).map(_._3).toSeq)
    assert(byEpoch(1L).map(_._3).toSeq !== byEpoch(2L).map(_._3).toSeq)
    // deterministic; epoch 0 IS the q115 layout
    assert(run(7L).toSeq === a.toSeq)
    val plain = Packing.shuffleShards(docs, "doc_id", "source", 7L,
      nShards = 4, mix = mix)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getString(3))).sortBy(r => (r._1, r._2))
    assert(byEpoch(0L).map(r => (r._1, r._2, r._3, r._4)).toSeq === plain.toSeq)
  }

  test("chunkDocBoundaries: locates every doc's first token; continuation chunks absent; empty docs excluded") {
    // shard 0: doc 1 (5 toks @ 0) then doc 2 (7 toks @ 5) under L=4 →
    // chunks 0,1,2; doc 2 begins mid-chunk-1; chunk 2 is pure
    // continuation. doc 4 is zero-token. shard 1: doc 3 alone.
    val assigned = Seq((0L, 0L, 1L), (0L, 1L, 2L), (0L, 2L, 4L),
      (1L, 0L, 3L)).toDF("shard", "pos", "id")
    val toks = Seq(
      (1L, Seq(10, 11, 12, 13, 14)),
      (2L, Seq(20, 21, 22, 23, 24, 25, 26)),
      (3L, Seq(30, 31)),
      (4L, Seq.empty[Int])).toDF("id", "ids")
    val b = Packing.chunkDocBoundaries(assigned, toks, col("id"),
        col("ids"), contextLen = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2),
        r.getLong(3))).toSet
    assert(b === Set((0L, 0L, 0, 1L), (0L, 1L, 1, 2L), (1L, 0L, 0, 3L)))
    // the index agrees with the packed contents: the token AT each
    // boundary is its doc's first token (same offs derivation, but
    // pin it end-to-end anyway)
    val chunks = Packing.packTokenChunksAssigned(assigned, toks,
        col("id"), col("ids"), contextLen = 4)
      .collect().map(r => ((r.getLong(0), r.getLong(1)),
        r.getSeq[Int](2))).toMap
    val firstTok = Map(1L -> 10, 2L -> 20, 3L -> 30)
    b.foreach { case (sh, ch, off, id) =>
      assert(chunks((sh, ch))(off) === firstTok(id), s"doc $id") }
  }

  test("slidingChunks: overlap, tail clamp, short-doc single chunk") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"), // 10 tokens
      (2L, "x y"),                 // shorter than a chunk
      (3L, (1 to 13).map(i => s"t$i").mkString(" ")) // 13 tokens
    ).toDF("doc_id", "text")
    val out = Packing.slidingChunks(docs, col("doc_id"), col("text"),
        chunkTokens = 4, stride = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getString(4)))
    val d1 = out.filter(_._1 == 1L).sortBy(_._2)
    // 10 tokens, chunk 4, stride 2 → 1 + ceil(6/2) = 4 chunks
    assert(d1.length === 4)
    assert(d1.head._5 === "a b c d")
    assert(d1(1)._5 === "c d e f") // 2-token overlap
    assert(d1.last === ((1L, 3L, 6L, 4L, "g h i j")))
    // short doc → exactly one (clamped) chunk
    assert(out.filter(_._1 == 2L).toSeq === Seq((2L, 0L, 0L, 2L, "x y")))
    // 13 tokens → 1 + ceil(9/2) = 6 chunks; tail n_tok clamps to 1
    val d3 = out.filter(_._1 == 3L).sortBy(_._2)
    assert(d3.length === 6)
    assert(d3.last._4 === 3L && d3.last._5 === "t11 t12 t13")
    // every token index is covered by some chunk
    val covered = d1.flatMap(ch => ch._3 until (ch._3 + ch._4)).toSet
    assert(covered === (0L until 10L).toSet)
    // pure narrow plan: no exchange
    val plan = Packing.slidingChunks(docs, col("doc_id"), col("text"), 4, 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("spanCorruption: matches a brute-force reference; spans bounded, block-disjoint, rate near 1/corruptOneIn") {
    def phash(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      h
    }
    val seed = 99L
    val docs = (0L until 200L)
      .map(i => (i, (0 until (i % 40).toInt).map(j =>
        ((i * 131 + j * 17) % 65536).toInt).toArray))
      .toDF("doc_id", "ids")
    val out = Packing.spanCorruption(docs, col("doc_id"), col("ids"),
        seed, blockLen = 16, spanLen = 5, corruptOneIn = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // brute-force reference over the same corpus
    val expect = (0L until 200L).flatMap { i =>
      val ids = (0 until (i % 40).toInt).map(j =>
        ((i * 131 + j * 17) % 65536).toLong)
      val tot = ids.zipWithIndex.map { case (t, k) => t * (k + 1) }.sum
      val spans = (0L until ids.length / 16).flatMap { b =>
        val h = phash(s"$seed~sc:$i:$b;" * 3)
        if (h % 2 == 0) Some((b, b * 16 + (h / 2) % 12)) else None
      }
      val keptSum = tot - spans.map { case (_, st) =>
        (0 until 5).map(j => ids(st.toInt + j) * (st + j + 1)).sum }.sum
      spans.zipWithIndex.map { case ((_, st), k) =>
        (i, k.toLong, st,
          (0 until 5).map(j => ids(st.toInt + j) * (j + 1)).sum, keptSum)
      }
    }
    assert(out.sortBy(r => (r._1, r._2)).toSeq ===
      expect.sortBy(r => (r._1, r._2)))
    assert(out.nonEmpty)
    // structural guarantees: spans stay inside their block (so they
    // never overlap or cross a block boundary) and inside the doc
    out.foreach { case (d, _, st, _, _) =>
      val n = (d % 40).toInt
      assert(st % 16 <= 11 && st + 5 <= (n / 16) * 16, s"doc $d start $st")
    }
    // rate: roughly half of all full blocks carry a span
    val blocks = (0L until 200L).map(i => (i % 40) / 16).sum
    assert(out.length > blocks * 0.3 && out.length < blocks * 0.7,
      s"${out.length} spans over $blocks blocks")
  }

  test("fimTransform: checksum equals a literally-materialized PSM stream; passthrough keeps plain order") {
    def phash(s: String): Long = {
      var h = 0L
      s.getBytes("UTF-8").foreach(b => h = (h * 31 + (b & 0xff)) % 1000000007L)
      h
    }
    val seed = 77L
    val docs = (0L until 200L)
      .map(i => (i, (0 until (i % 23).toInt).map(j =>
        ((i * 131 + j * 17) % 65536).toInt).toArray))
      .toDF("doc_id", "ids")
    val out = Packing.fimTransform(docs, col("doc_id"), col("ids"), seed)
      .collect().map(r => (r.getLong(0), r.getBoolean(1),
        if (r.isNullAt(2)) -1L else r.getLong(2),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        r.getLong(4), r.getLong(5))).sortBy(_._1)
    // reference: BUILD the actual reordered stream and checksum it —
    // independent of the operator's closed-form position arithmetic
    val expect = (0L until 200L).flatMap { i =>
      val ids = (0 until (i % 23).toInt).map(j =>
        ((i * 131 + j * 17) % 65536).toLong)
      val n = ids.length
      if (n == 0) None else {
        val fim = phash(s"$seed~fim:$i;" * 3) % 100 < 50
        if (fim) {
          val h1 = phash(s"$seed~f1:$i;" * 3) % (n + 1)
          val h2 = phash(s"$seed~f2:$i;" * 3) % (n + 1)
          val (lo, hi) = (math.min(h1, h2), math.max(h1, h2))
          val stream = Seq(65536L) ++ ids.slice(0, lo.toInt) ++
            Seq(65537L) ++ ids.slice(hi.toInt, n) ++
            Seq(65538L) ++ ids.slice(lo.toInt, hi.toInt)
          val ck = stream.zipWithIndex.map { case (t, k) => t * (k + 1) }.sum
          Some((i, true, lo, hi, stream.length.toLong, ck))
        } else {
          val ck = ids.zipWithIndex.map { case (t, k) => t * (k + 1) }.sum
          Some((i, false, -1L, -1L, n.toLong, ck))
        }
      }
    }
    assert(out.toSeq === expect.sortBy(_._1))
    assert(out.exists(_._2) && out.exists(!_._2), "need both arms")
    // empty-cut degenerate shapes exist and still checksum correctly
    assert(out.filter(_._2).exists(r => r._3 == 0L || r._4 == r._5 - 3),
      "expected at least one empty prefix or empty suffix")
  }

  test("contextLengthSweep: hand-checked bins/padding/truncation per candidate") {
    // five docs of 3 tokens + one of 10
    val d = (Seq.fill(5)(3L) :+ 10L).toDF("n")
    val got = Packing.contextLengthSweep(d, col("n"), Seq(8, 4))
      .collect().map(r => r.getInt(0) -> ((r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5), r.getDouble(6)))).toMap
    // L=4: len-3 class k=1 -> 5 bins, pad 5; the 10-doc truncates to 4
    assert(got(4) === ((6L, 6L, 19L, 5L, 6L,
      math.floor(19.0 / 24.0 * 1e6 + 0.5) / 1e6)))
    // L=8: len-3 class k=2 -> ceil(5/2)=3 bins, pad 9; 10-doc -> len 8
    assert(got(8) === ((6L, 4L, 23L, 9L, 2L, 23.0 / 32.0)))
  }

  test("fimApply: materialized arrays carry exactly fimTransform's length and checksum") {
    val docs = (0L until 200L)
      .map(i => (i, (0 until (i % 23).toInt).map(j =>
        ((i * 131 + j * 17) % 65536).toInt).toArray))
      .toDF("doc_id", "ids")
    val applied = Packing.fimApply(docs, col("doc_id"), col("ids"), 77L)
      .select(col("id"), size(col("ids")).cast("long").as("n"),
        aggregate(
          zip_with(col("ids"), sequence(lit(1), size(col("ids"))),
            (t, p) => t.cast("long") * p.cast("long")),
          lit(0L), (a, x) => a + x).as("ck"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val audit = Packing.fimTransform(docs, col("doc_id"), col("ids"), 77L)
      .collect().map(r => r.getLong(0) -> ((r.getLong(4), r.getLong(5)))).toMap
    assert(applied === audit)
  }

  test("two-level rank/offset parity: bucketed form is bit-identical to the naive windows") {
    // the scale form (hash-range-blocked ranks + blocked per-shard
    // cumulative sums) must produce EXACTLY the flat-window results on
    // every training-order operator — block sizes forced tiny so the
    // multi-block offset arithmetic is actually exercised (defaults
    // would put this whole corpus in a handful of blocks)
    val docs = (0L until 600L)
      .map(i => (i * 7 % 1000, s"src${i % 8 % 3}",
        (0 until (i % 5).toInt).map(j => s"w${i}_$j").mkString(" ")))
      .toDF("doc_id", "source", "text")
    val mix = Map("src0" -> 0.5, "src1" -> 0.25, "src2" -> 0.25)
    val toks = docs.select(col("doc_id").as("id"),
      transform(filter(split(col("text"), " "), w => w =!= ""),
        w => pmod(graft.functions.PortableHash.portable_hash(w),
          lit(65536L)).cast("int")).as("ids"))
    def withConfs(pairs: (String, String)*)(body: => Seq[Set[Seq[Any]]]) = {
      pairs.foreach { case (k, v) => spark.conf.set(k, v) }
      try body finally pairs.foreach { case (k, _) => spark.conf.unset(k) }
    }
    def all() = Seq(
      Packing.shuffleShards(docs, "doc_id", "source", 7L, 4, mix),
      Packing.epochOrder(docs, "doc_id", "source", 7L, 4, mix, epochs = 3),
      Packing.curriculumOrder(docs, "doc_id", "source", 7L, 4, mix,
        annealWhen = col("doc_id") % 5 === 0),
      Packing.packTokenChunksAssigned(
        Packing.shuffleShards(docs, "doc_id", "source", 7L, 4, mix),
        toks, col("id"), col("ids"), contextLen = 6),
      Packing.chunkDocBoundaries(
        Packing.shuffleShards(docs, "doc_id", "source", 7L, 4, mix),
        toks, col("id"), col("ids"), contextLen = 6),
      Packing.binPackByLength(
        toks.select(col("id"), size(col("ids")).cast("long").as("n")),
        col("id"), col("n"), contextLen = 6, nShards = 4, seed = 7L)
    ).map(rows)
    val blocked = withConfs(
      "spark.graft.pack.twoLevelRank" -> "true",
      "spark.graft.pack.rankBlocks" -> "11",
      "spark.graft.pack.posBlock" -> "7")(all())
    val flat = withConfs(
      "spark.graft.pack.twoLevelRank" -> "false")(all())
    blocked.zip(flat).zipWithIndex.foreach { case ((b, f), i) =>
      assert(b === f, s"operator $i diverged between rank forms")
      assert(b.nonEmpty, s"operator $i returned nothing")
    }
  }

  test("binPackByLength: whole docs only, homogeneous bins, dense numbering, padding bound") {
    val ctx = 16
    // lengths 0..24: empties (excluded), truncations (> ctx), and a
    // spread of lengths that exercises cap values 1, 2, 3, 4, 8, 16
    val docsDf = (0L until 400L).map(i => (i, (i * 13 % 25)))
      .toDF("id", "n_tokens")
    val out = Packing.binPackByLength(docsDf, col("id"), col("n_tokens"),
        contextLen = ctx, nShards = 3, seed = 7L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getBoolean(3), r.getLong(4), r.getLong(5), r.getLong(6)))
    val expected = (0L until 400L).map(i => (i, i * 13 % 25))
      .filter(_._2 > 0)
    assert(out.map(_._1).sorted === expected.map(_._1).sorted,
      "every non-empty doc packed exactly once")
    out.foreach { case (id, _, len, trunc, _, slot, off) =>
      val n = id * 13 % 25
      assert(len === math.min(n, ctx.toLong), s"doc $id len")
      assert(trunc === (n > ctx), s"doc $id truncated flag")
      assert(off === slot * len, s"doc $id bin_off")
    }
    // bins are homogeneous in length, hold <= floor(ctx/len) docs
    // with dense slots, and never exceed the context
    out.groupBy(b => (b._2, b._5)).foreach { case ((sh, bin), ds) =>
      val lens = ds.map(_._3).distinct
      assert(lens.length === 1, s"bin ($sh,$bin) mixes lengths")
      val cap = ctx / lens.head
      assert(ds.length <= cap && lens.head * ds.length <= ctx,
        s"bin ($sh,$bin) overfull")
      assert(ds.map(_._6).sorted === (0L until ds.length).toSeq,
        s"bin ($sh,$bin) slots not dense")
    }
    // per-shard bin ids are dense from 0
    out.groupBy(_._2).foreach { case (sh, ds) =>
      val bins = ds.map(_._5).distinct.sorted
      assert(bins === (0L until bins.length).toSeq,
        s"shard $sh bins not dense")
    }
  }

  test("rank form is chosen adaptively by input size (plan inspection, no execution)") {
    // both forms are bit-identical, so the choice is a pure plan
    // decision: a small corpus must get the naive window (no extra
    // scan/broadcast — the sf0.1 bench rows measured the blocked
    // form 2.5-4x slower there), a large one the blocked form. The
    // discriminator in the plan: only the two-level form contains a
    // join (the broadcast block-offsets side table).
    def hasJoin(df: org.apache.spark.sql.DataFrame): Boolean =
      df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }.nonEmpty
    def ranked(df: org.apache.spark.sql.DataFrame) =
      Packing.rankByHash(df.withColumn("__h",
        graft.functions.PortableHash.portable_hash(
          col("id").cast("string"))), "source", "r")
    val small = (0L until 100L).map(i => (i, s"src${i % 3}"))
      .toDF("id", "source")
    assert(!hasJoin(ranked(small)),
      "small input must take the naive window")
    // 100M-row range: stats-only, the plan is inspected, never run
    val big = spark.range(100000000L).select(col("id"),
      concat(lit("src"), pmod(col("id"), lit(3L)).cast("string"))
        .as("source"))
    assert(hasJoin(ranked(big)),
      "large input must take the two-level form")
    // explicit conf overrides the size heuristic in both directions
    spark.conf.set("spark.graft.pack.twoLevelRank", "true")
    try assert(hasJoin(ranked(small)),
      "conf=true must force the two-level form")
    finally spark.conf.unset("spark.graft.pack.twoLevelRank")
    spark.conf.set("spark.graft.pack.twoLevelRank", "false")
    try assert(!hasJoin(ranked(big)),
      "conf=false must force the naive window")
    finally spark.conf.unset("spark.graft.pack.twoLevelRank")
  }

  test("sftMaskedPack: hand-checked masks, chunk splits, prompt-only tails") {
    // shard-0 stream (nShards = 1, id order):
    // conv 1 = prompt [10,11] + response [20]; conv 2 = prompt [30] +
    // response [40,41,42]; conv 3 = prompt [50] + EMPTY response.
    // L = 4 → chunk0 [10,11,20,30] mask [0,0,1,0];
    //         chunk1 [40,41,42,50] mask [1,1,1,0]
    val convs = Seq(
      (1L, Seq(10, 11), Seq(20)),
      (2L, Seq(30), Seq(40, 41, 42)),
      (3L, Seq(50), Seq.empty[Int]))
      .toDF("id", "p", "r")
    val got = Packing.sftMaskedPack(convs, col("id"), col("p"), col("r"),
        contextLen = 4, nShards = 1)
      .orderBy("chunk_id").collect()
      .map(row => (row.getLong(1), row.getSeq[Int](2), row.getSeq[Int](3)))
    assert(got.toSeq === Seq(
      (0L, Seq(10, 11, 20, 30), Seq(0, 0, 1, 0)),
      (1L, Seq(40, 41, 42, 50), Seq(1, 1, 1, 0))))
  }

  test("sftMaskedPack: positionally identical to packTokenChunks; mask counts = response lengths") {
    // the masked stream must be the SAME layout as the unmasked ids
    // through the same chunker — mask is metadata, never a reorder
    val convs = (1L to 40L).map { i =>
      val p = (0 until (i % 5).toInt + 1).map(j => (i * 7 + j).toInt)
      val r = (0 until (i % 3).toInt * 2).map(j => (i * 13 + j).toInt)
      (i, p, r)
    }.toDF("id", "p", "r")
    val masked = Packing.sftMaskedPack(convs, col("id"), col("p"),
      col("r"), contextLen = 16, nShards = 4)
    val plain = Packing.packTokenChunks(
      convs.select(col("id"), concat(col("p"), col("r")).as("ids")),
      col("id"), col("ids"), contextLen = 16, nShards = 4)
    assert(rows(masked.select(col("shard"), col("chunk_id"),
        col("token_ids"))) ===
      rows(plain))
    val nLoss = masked
      .select(aggregate(col("loss_mask"), lit(0L), (a, m) =>
        a + m.cast("long")).as("n"))
      .agg(sum(col("n"))).collect().head.getLong(0)
    val nResp = convs.select(sum(size(col("r")))).collect().head.getLong(0)
    assert(nLoss === nResp)
  }

  test("needleInsert: closed-form checksum equals the brute-force rearranged stream") {
    val docs = Seq((1L, Seq(10, 20, 30)), (2L, Seq(7)),
      (3L, (1 to 17).toSeq), (4L, Seq.empty[Int]))
      .toDF("id", "ids")
    val needle = Seq(1, 2)
    val depths = Seq(0, 50, 100)
    val out = Packing.needleInsert(docs, col("id"), col("ids"),
        needle, depths)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // empty doc emits nothing
    assert(out.keySet.map(_._1) === Set(1L, 2L, 3L))
    val idsMap = Map(1L -> Seq(10, 20, 30), 2L -> Seq(7),
      3L -> (1 to 17).toSeq)
    out.foreach { case ((id, d), (pos, len, cks)) =>
      val ids = idsMap(id)
      val expectPos = ids.length * d / 100
      assert(pos === expectPos.toLong)
      val stream = ids.take(expectPos.toInt) ++ needle ++
        ids.drop(expectPos.toInt)
      assert(len === stream.length.toLong)
      assert(cks === stream.zipWithIndex.map {
        case (t, i) => t.toLong * (i + 1) }.sum,
        s"doc $id depth $d checksum")
    }
    // hand value: doc 1 depth 50 → [10,1,2,20,30] → 248
    assert(out((1L, 50L))._3 === 248L)
  }

  test("ul2Mix: disjoint seeded modes, per-mode operating points, prefix-LM S leg, R ≡ spanCorruption") {
    val docs = (1L to 120L).map { i =>
      (i, (0 until (i % 40).toInt + 2).map(j => (i + j).toInt))
    }.toDF("id", "ids")
    val out = Packing.ul2Mix(docs, col("id"), col("ids"), seed = 7L)
    val rows0 = out.collect()
    // one mode per doc, matching the independent hash draw
    val modes = docs.select(col("id"),
      pmod(graft.functions.PortableHash.portable_hash(
        repeat(concat(lit("7~ul2:"), col("id").cast("string"),
          lit(";")), 3)), lit(4L)).as("m"))
      .as[(Long, Long)].collect().toMap
    rows0.foreach { r =>
      val expect = modes(r.getLong(0)) match {
        case 0 | 1 => "R"; case 2 => "X"; case _ => "S" }
      assert(r.getString(1) === expect)
    }
    assert(Set("R", "X", "S").subsetOf(
      rows0.map(_.getString(1)).toSet), "all three denoisers exercised")
    // X spans sit on block boundaries (offs = 1) at full length 12
    rows0.filter(_.getString(1) == "X").foreach { r =>
      assert(r.getLong(3) % 12 === 0 && r.getLong(4) === 12L) }
    rows0.filter(_.getString(1) == "R").foreach { r =>
      assert(r.getLong(4) === 3L) }
    // S: exactly one row per sampled doc; both checksums recompute
    val idsMap = docs.as[(Long, Seq[Int])].collect().toMap
    val sRows = rows0.filter(_.getString(1) == "S")
    assert(sRows.nonEmpty)
    sRows.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length === 1) }
    sRows.foreach { r =>
      val ids = idsMap(r.getLong(0)); val split = r.getLong(3).toInt
      assert(split >= 1 && split < ids.length, "both sides non-empty")
      val span = ids.drop(split)
      assert(r.getLong(4) === span.length.toLong)
      assert(r.getLong(5) === span.zipWithIndex.map {
        case (t, j) => t.toLong * (j + 1) }.sum)
      assert(r.getLong(6) === ids.take(split).zipWithIndex.map {
        case (t, i) => t.toLong * (i + 1) }.sum)
    }
    // the R leg is definitionally spanCorruption at (10, 3, 2)
    val rIds = modes.filter(_._2 <= 1).keys.toSeq
    val rDirect = Packing.spanCorruption(
        docs.filter(col("id").isin(rIds: _*)), col("id"), col("ids"),
        seed = 7L, blockLen = 10, spanLen = 3, corruptOneIn = 2)
      .select(col("id"), col("span_idx"), col("start_pos"),
        col("span_checksum"), col("kept_checksum"))
    assert(rows(out.filter(col("mode") === "R")
        .select(col("id"), col("span_idx"), col("start_pos"),
          col("span_checksum"), col("kept_checksum"))) ===
      rows(rDirect))
  }

  test("bestOfN: argmax with deterministic ties, margin, floor, singleton groups") {
    val d = Seq(
      (1L, 10L, 0.9), (2L, 10L, 0.7), (3L, 10L, 0.9),  // tie → id 1
      (4L, 20L, 0.2), (5L, 20L, 0.1),                   // winner under floor
      (6L, 30L, 0.5))                                   // singleton
      .toDF("id", "grp", "r")
    val out = Sampling.bestOfN(d, col("id"), col("grp"), col("r"),
        minReward = 0.3)
      .collect().map(x => x.getLong(1) ->
        (x.getLong(0), x.getDouble(2), x.getDouble(3), x.getLong(4)))
      .toMap
    // group 20's winner (0.2) is below the floor → whole group dropped
    assert(out.keySet === Set(10L, 30L))
    // tie at 0.9 breaks to the smaller id; margin vs the runner-up tie = 0
    assert(out(10L) === ((1L, 0.9, 0.0, 3L)))
    // singleton: margin 0 by contract
    assert(out(30L) === ((6L, 0.5, 0.0, 1L)))
    // margin against a strict runner-up
    val d2 = Seq((1L, 1L, 0.9), (2L, 1L, 0.6)).toDF("id", "grp", "r")
    val m = Sampling.bestOfN(d2, col("id"), col("grp"), col("r"))
      .select("margin").as[Double].collect().head
    assert(math.abs(m - 0.3) < 2e-6)
  }

  test("groupRelativeAdvantage: hand-checked standardization, zero-variance and singleton contracts") {
    val rows0 = Seq(
      (1L, 10L, 1.0), (2L, 10L, 2.0), (3L, 10L, 3.0), (4L, 10L, 2.0),
      (5L, 20L, 5.0), (6L, 20L, 5.0), // zero variance
      (7L, 30L, 9.0)) // singleton
      .toDF("id", "grp", "r")
    val out = Sampling.groupRelativeAdvantage(rows0, col("id"),
        col("grp"), col("r"))
      .collect().map(x => x.getLong(0) ->
        (x.getLong(1), x.getDouble(2), x.getLong(3), x.getDouble(4)))
      .toMap
    // group 10: mean 2, population std sqrt(0.5)
    val std = math.sqrt(0.5)
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    assert(out(1L) === ((10L, 1.0, 4L, r6(-1.0 / std))))
    assert(out(2L) === ((10L, 2.0, 4L, 0.0)))
    assert(out(3L) === ((10L, 3.0, 4L, r6(1.0 / std))))
    // zero-variance and singleton groups: advantage 0 by contract
    assert(out(5L)._4 === 0.0 && out(6L)._4 === 0.0)
    assert(out(7L) === ((30L, 9.0, 1L, 0.0)))
    // deterministic under repartitioning (decimal-exact group sums)
    assert(rows(Sampling.groupRelativeAdvantage(rows0.repartition(5),
        col("id"), col("grp"), col("r"))) ===
      rows(Sampling.groupRelativeAdvantage(rows0, col("id"),
        col("grp"), col("r"))))
  }

  test("doremiWeights: lossy domains gain weight, equal losses stay uniform, weights sum to 1") {
    // two domains, loss 1.0 vs 3.0 — round 1 by hand: mix = 2.0,
    // excess = (0, 1), w = (.5, .5·e^0.5), so the lossy domain's
    // weight must strictly exceed the other's and keep growing
    val perDoc = (Seq.fill(10)(("a", 1.0)) ++ Seq.fill(10)(("b", 3.0)))
      .zipWithIndex.map { case ((s0, l), i) => (i.toLong, s0, l) }
      .toDF("id", "src", "nll")
    val out = Sampling.doremiWeights(perDoc, col("src"), col("nll"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(out("a")._1 === 10L && out("b")._1 === 10L)
    assert(out("a")._2 === 1.0 && out("b")._2 === 3.0)
    assert(out("b")._3 > out("a")._3, "lossy domain must gain weight")
    assert(math.abs(out("a")._3 + out("b")._3 - 1.0) < 2e-6,
      "weights must sum to 1 (round6 tolerance)")
    // more rounds → more concentration on the lossy domain
    val more = Sampling.doremiWeights(perDoc, col("src"), col("nll"),
        rounds = 16)
      .filter(col("domain") === "b").select("weight")
      .as[Double].collect().head
    assert(more > out("b")._3)
    // equal losses: uniform stays uniform (excess 0 everywhere)
    val eq = Sampling.doremiWeights(
      perDoc.withColumn("nll", lit(2.0)), col("src"), col("nll"))
      .select("weight").as[Double].collect()
    assert(eq.toSeq === Seq(0.5, 0.5))
    // single domain degenerates to weight 1
    val one = Sampling.doremiWeights(perDoc.filter(col("src") === "a"),
      col("src"), col("nll")).select("weight").as[Double].collect()
    assert(one.toSeq === Seq(1.0))
    // deterministic under repartitioning (decimal-exact tiny sums)
    assert(rows(Sampling.doremiWeights(perDoc.repartition(7),
        col("src"), col("nll"))) ===
      rows(Sampling.doremiWeights(perDoc, col("src"), col("nll"))))
  }

  test("dpoPairPack: hand-checked truncation — prompt evicts left, response survives, masks align") {
    // L = 6:
    // pair 1: p=[1,2,3], c=[10,11], r=[20] → fits: chosen [1,2,3,10,11]
    //   mask [0,0,0,1,1]; rejected [1,2,3,20] mask [0,0,0,1]
    // pair 2: p=[1,2,3,4,5,6,7], c=[10,11,12] → keep_p = 6-3 = 3 →
    //   LAST 3 prompt toks [5,6,7] then [10,11,12]
    // pair 3: c longer than L=[10..17] → keep_p 0, FIRST 6 of c
    // pair 4: empty rejected → dropped
    val pairs = Seq(
      (1L, Seq(1, 2, 3), Seq(10, 11), Seq(20)),
      (2L, Seq(1, 2, 3, 4, 5, 6, 7), Seq(10, 11, 12), Seq(20)),
      (3L, Seq(1, 2), (10 to 17).toSeq, Seq(20)),
      (4L, Seq(1, 2), Seq(10), Seq.empty[Int]))
      .toDF("id", "p", "c", "r")
    val got = Packing.dpoPairPack(pairs, col("id"), col("p"), col("c"),
        col("r"), contextLen = 6, nShards = 1)
      .orderBy("pair_id").collect()
      .map(row => (row.getLong(0), row.getSeq[Int](2), row.getSeq[Int](3),
        row.getSeq[Int](4), row.getSeq[Int](5)))
    assert(got.toSeq === Seq(
      (1L, Seq(1, 2, 3, 10, 11), Seq(0, 0, 0, 1, 1),
        Seq(1, 2, 3, 20), Seq(0, 0, 0, 1)),
      (2L, Seq(5, 6, 7, 10, 11, 12), Seq(0, 0, 0, 1, 1, 1),
        Seq(3, 4, 5, 6, 7, 20), Seq(0, 0, 0, 0, 0, 1)),
      (3L, Seq(10, 11, 12, 13, 14, 15), Seq(1, 1, 1, 1, 1, 1),
        Seq(1, 2, 20), Seq(0, 0, 1))))
  }

  test("dpoPairPack: pair atomicity, mask/ids alignment, null and empty contracts") {
    val pairs = (1L to 60L).map { i =>
      val p = (0 until (i % 7).toInt).map(j => (i * 3 + j).toInt)
      val c = (0 until (i % 4).toInt).map(j => (i * 11 + j).toInt)
      val r = (0 until ((i + 1) % 4).toInt).map(j => (i * 17 + j).toInt)
      (i, p, c, r)
    }.toDF("id", "p", "c", "r")
    val out = Packing.dpoPairPack(pairs, col("id"), col("p"), col("c"),
      col("r"), contextLen = 8, nShards = 4)
    val rows0 = out.collect()
    // kept exactly the pairs with BOTH responses non-empty
    assert(rows0.map(_.getLong(0)).sorted ===
      (1L to 60L).filter(i => i % 4 != 0 && (i + 1) % 4 != 0).toArray)
    rows0.foreach { r =>
      // every plane fits L and masks align positionally
      assert(r.getSeq[Int](2).length <= 8 && r.getSeq[Int](4).length <= 8)
      assert(r.getSeq[Int](2).length === r.getSeq[Int](3).length)
      assert(r.getSeq[Int](4).length === r.getSeq[Int](5).length)
      // mask is 0* then 1* (prompt prefix, response suffix)
      Seq(r.getSeq[Int](3), r.getSeq[Int](5)).foreach { m =>
        assert(m === m.sorted, s"mask not prefix-0 suffix-1: $m") }
    }
    // deterministic
    assert(rows(out) === rows(Packing.dpoPairPack(pairs, col("id"),
      col("p"), col("c"), col("r"), contextLen = 8, nShards = 4)))
    // null prompt or response drops the pair (null-propagation contract)
    val withNulls = spark.sql(
      """SELECT 1L AS id, NULL AS p, array(1) AS c, array(2) AS r
        |UNION ALL SELECT 2L, array(1), NULL, array(2)
        |UNION ALL SELECT 3L, array(), array(1), array(2)""".stripMargin)
    val kept = Packing.dpoPairPack(withNulls, col("id"), col("p"),
      col("c"), col("r"), contextLen = 4, nShards = 1)
      .select("pair_id").as[Long].collect()
    assert(kept.toSeq === Seq(3L), "empty prompt legal; nulls dropped")
  }

  test("inContextOrder: whole clusters per shard, peers adjacent, dense pos, deterministic") {
    val docs = (1L to 200L).map(i => (i, i % 17)).toDF("doc_id", "cl")
    val out = Packing.inContextOrder(docs, col("doc_id"), col("cl"),
      seed = 42L, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.length === 200)
    // a cluster never splits across shards
    val byCluster = out.groupBy(_._4)
    byCluster.foreach { case (c, rs) =>
      assert(rs.map(_._1).distinct.length === 1, s"cluster $c split") }
    // pos dense 0..n-1 per shard
    out.groupBy(_._1).foreach { case (s, rs) =>
      assert(rs.map(_._2).sorted === (0L until rs.length).toSeq,
        s"shard $s pos not dense") }
    // cluster peers occupy a CONTIGUOUS pos range (the whole point)
    byCluster.foreach { case (c, rs) =>
      val ps = rs.map(_._2).sorted
      assert(ps.last - ps.head + 1 === ps.length,
        s"cluster $c not contiguous in its shard") }
    // deterministic artifact of (seed, assignment)
    val again = Packing.inContextOrder(docs, col("doc_id"), col("cl"),
      seed = 42L, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet === again.toSet)
    // a different seed produces a different layout
    val other = Packing.inContextOrder(docs, col("doc_id"), col("cl"),
      seed = 43L, nShards = 4).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(out.toSet !== other.toSet)
  }
}
