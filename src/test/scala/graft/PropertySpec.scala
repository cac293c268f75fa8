package graft

import org.apache.spark.sql.functions._
import java.sql.Timestamp
import scala.util.Random

/** Property tests (SURVEY.md §5 strategy 2) over seeded random inputs:
  * invariants that must hold for ANY data, not just hand fixtures. */
class PropertySpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.{WeightedMean, FillMissing}

  private val rnd = new Random(42)
  private val t0 = Timestamp.valueOf("2021-01-01 00:00:00")

  private def randomCase(nCells: Int, nFeatures: Int, nullFrac: Double) = {
    val cells = (0 until nCells).map(c => (c % 7, c / 7))
    val grid = cells.map { case (i, j) =>
      val v = if (rnd.nextDouble() < nullFrac) None else Some(rnd.nextDouble() * 100 - 50)
      (t0, i, j, v)
    }.toDF("time", "i", "j", "v")
    val weights = (0 until nFeatures).flatMap { f =>
      rnd.shuffle(cells.toList).take(1 + rnd.nextInt(5)).map { case (i, j) =>
        (f.toLong, i, j, 0.05 + rnd.nextDouble())
      }
    }.toDF("fid", "i", "j", "wght")
    (grid, weights)
  }

  test("weighted mean lies within [min, max] of contributing values") {
    for (_ <- 1 to 5) {
      val (grid, weights) = randomCase(35, 8, nullFrac = 0.0)
      val bounds = grid.agg(min("v"), max("v")).as[(Double, Double)].head()
      val out = WeightedMean(grid, weights, Seq("v")).select("v").as[Double].collect()
      out.foreach { v =>
        assert(v >= bounds._1 - 1e-9 && v <= bounds._2 + 1e-9,
          s"$v outside [${bounds._1}, ${bounds._2}]")
      }
    }
  }

  test("masked_mean == mean when no values are missing") {
    for (_ <- 1 to 5) {
      val (grid, weights) = randomCase(35, 8, nullFrac = 0.0)
      val plain = WeightedMean(grid, weights, Seq("v"))
        .select($"fid", $"time", round($"v", 9)).collect().map(_.toSeq).toSet
      val masked = WeightedMean(grid, weights, Seq("v"), masked = true)
        .select($"fid", $"time", round($"v", 9)).collect().map(_.toSeq).toSet
      assert(plain == masked)
    }
  }

  test("preCombine preserves results on random data with nulls") {
    for (_ <- 1 to 5) {
      val (grid, weights) = randomCase(35, 8, nullFrac = 0.3)
      for (masked <- Seq(true, false)) {
        val a = WeightedMean(grid, weights, Seq("v"), masked = masked)
          .select($"fid", $"time", round($"v", 6)).collect().map(_.toSeq).toSet
        val b = WeightedMean(grid, weights, Seq("v"), masked = masked, preCombine = true)
          .select($"fid", $"time", round($"v", 6)).collect().map(_.toSeq).toSet
        assert(a == b, s"masked=$masked")
      }
    }
  }

  test("fill is idempotent: filling an already-filled series changes nothing") {
    val ts = (0 until 60).map { k =>
      val fid = (k % 6).toLong
      val time = new Timestamp(t0.getTime + (k / 6) * 86400000L)
      val v = if (fid == 0) None else Some(rnd.nextDouble() * 10)
      (fid, time, v)
    }.toDF("fid", "time", "v")
    val fids = ts.select("fid").distinct()
    def centroids(df: org.apache.spark.sql.DataFrame) =
      df.select($"fid", $"fid".cast("double").as("lat"), lit(0.0).as("lon"))
    val mapping = FillMissing.nearestMapping(
      centroids(fids.filter($"fid" === 0)), centroids(fids.filter($"fid" =!= 0)))
    val once = FillMissing.fillSeries(ts, mapping, Seq("v"))
    val twice = FillMissing.fillSeries(once, mapping, Seq("v"))
    assert(rows(once) == rows(twice))
    assert(once.filter($"v".isNull).count() == 0)
  }

  test("kelvin→celsius→kelvin roundtrip is exact for representable values") {
    import graft.functions.Physics
    val temps = Seq.fill(50)(200.0 + rnd.nextInt(200)).toDF("k") // integral K
    val back = temps.select((Physics.kelvinToCelsius($"k") + lit(273.15)).as("k2"), $"k")
    assert(back.filter($"k2" =!= $"k").count() == 0)
  }

  test("jaccard is symmetric and within [0,1]; self-jaccard is 1") {
    import graft.functions.TextFunctions
    val words = Seq("alpha", "beta", "gamma", "delta", "eps")
    val docs = (0 until 10).map { i =>
      (i.toLong, Seq.fill(4 + rnd.nextInt(8))(words(rnd.nextInt(words.size))).mkString(" "))
    }.toDF("id", "text")
    val sh = docs.select($"id", TextFunctions.shingles($"text", 2).as("sh"))
      .filter(size($"sh") > 0)
    val a = sh.select($"id".as("ai"), $"sh".as("sa"))
    val b = sh.select($"id".as("bi"), $"sh".as("sb"))
    val pairs = a.crossJoin(b)
      .select($"ai", $"bi", TextFunctions.jaccard($"sa", $"sb").as("j"))
      .collect()
    val m = pairs.map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    m.foreach { case ((x, y), j) =>
      assert(j >= 0.0 && j <= 1.0)
      assert(m((y, x)) == j)
      if (x == y) assert(j == 1.0)
    }
  }

  private def randomDocs(nDocs: Int, vocab: Int, maxLen: Int) =
    (0 until nDocs).map { i =>
      val len = 1 + rnd.nextInt(maxLen)
      (i.toLong, (0 until len).map(_ => s"w${rnd.nextInt(vocab)}").mkString(" "))
    }.toDF("doc_id", "text")

  test("pigeonhole simhash blocking == all-pairs on random corpora") {
    import graft.operators.Dedup
    for (h <- Seq(1, 3, 5)) {
      val docs = randomDocs(60, vocab = 30, maxLen = 20)
      val all = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = h)
        .collect().map(_.toSeq).toSet
      val blocked = Dedup.simhashPairsBlocked(docs, "doc_id", "text", maxHamming = h)
        .collect().map(_.toSeq).toSet
      assert(blocked == all, s"h=$h")
    }
  }

  test("ngram kernel hash sets group documents exactly like string shingles") {
    import graft.functions.NgramHashes.ngram_hashes
    import graft.functions.TextFunctions.shingles
    val docs = randomDocs(80, vocab = 6, maxLen = 6) // small vocab → collisions
    val byHash = docs.select($"doc_id", ngram_hashes($"text", 2).as("k"))
      .groupBy($"k").agg(collect_set($"doc_id").as("g"))
      .select(sort_array($"g")).as[Seq[Long]].collect().toSet
    val byString = docs.select($"doc_id", array_sort(shingles($"text", 2)).as("k"))
      .groupBy($"k").agg(collect_set($"doc_id").as("g"))
      .select(sort_array($"g")).as[Seq[Long]].collect().toSet
    assert(byHash == byString)
  }

  test("positional ngram fingerprints are 1-1 with per-position gram strings") {
    import graft.functions.NgramPosHashes.ngram_pos_hashes
    // small vocab → many REPEATED grams across docs/positions: the
    // 1-1 check has power (a broken hash that merged or split gram
    // classes would show up as a non-bijective mapping)
    val docs = randomDocs(80, vocab = 5, maxLen = 8)
    val byKernel = docs
      .select($"doc_id", posexplode(ngram_pos_hashes($"text", 2)))
      .select($"doc_id", $"pos", $"col.h", $"col.l")
      .as[(Long, Int, Long, Int)].collect()
      .map { case (d, p, h, l) => (d, p) -> ((h, l)) }.toMap
    val byString = docs
      .select($"doc_id", split($"text", " ").as("arr"))
      .filter(size($"arr") >= 2)
      .select($"doc_id", posexplode(expr(
        "transform(sequence(0, size(arr) - 2), " +
          "i -> array_join(slice(arr, i + 1, 2), ' '))")))
      .as[(Long, Int, String)].collect()
      .map { case (d, p, g) => (d, p) -> g }.toMap
    assert(byKernel.keySet == byString.keySet) // same (doc, pos) universe
    // fingerprint equality ≡ gram-string equality, both directions
    val fpOfGram = byString.groupBy(_._2).view
      .mapValues(_.keys.map(byKernel).toSet).toMap
    assert(fpOfGram.values.forall(_.size == 1), "one gram → one fingerprint")
    val gramsOfFp = byKernel.groupBy(_._2).view
      .mapValues(_.keys.map(byString).toSet).toMap
    assert(gramsOfFp.values.forall(_.size == 1), "one fingerprint → one gram")
    assert(fpOfGram.size > 1 && byKernel.nonEmpty)
  }

  test("WKB round-trip: random convex polygons recover bbox and centroid") {
    import graft.functions.WkbGeom.{wkbPolygon, wkbEnvelopeCentroid}
    // random rectangles (centroid/bbox closed-form) built as columns
    val fixtures = (0 until 40).map { i =>
      val x0 = rnd.nextDouble() * 100 - 50
      val y0 = rnd.nextDouble() * 100 - 50
      val w = 0.5 + rnd.nextDouble() * 10
      val h = 0.5 + rnd.nextDouble() * 10
      (i.toLong, x0, y0, w, h)
    }.toDF("id", "x0", "y0", "w", "h")
    val out = fixtures.select($"id", $"x0", $"y0", $"w", $"h",
        wkbEnvelopeCentroid(wkbPolygon(
          array($"x0", $"x0" + $"w", $"x0" + $"w", $"x0"),
          array($"y0", $"y0", $"y0" + $"h", $"y0" + $"h"))).as("e"))
      .as[(Long, Double, Double, Double, Double,
        (Double, Double, Double, Double, Double, Double))].collect()
    out.foreach { case (_, x0, y0, w, h, (minx, miny, maxx, maxy, cx, cy)) =>
      assert(minx == x0 && miny == y0 && maxx == x0 + w && maxy == y0 + h)
      assert(approx(cx, x0 + w / 2, 1e-12) && approx(cy, y0 + h / 2, 1e-12))
    }
  }

  test("session forms agree on random event streams (closed-boundary rule)") {
    import graft.streaming.EventPipeline
    val events = (0 until 300).map { i =>
      val user = rnd.nextInt(8).toLong
      val t = new Timestamp(t0.getTime + rnd.nextInt(6 * 3600) * 1000L)
      (user, t, i.toLong, (rnd.nextInt(10000) / 100.0))
    }.toDF("user_id", "ts", "event_id", "value")
    val lag = EventPipeline.sessionize(events, gapMinutes = 30)
      .groupBy($"user_id").agg(count(lit(1)).as("n"),
        sum($"n_events").as("ev"), round(sum($"sum_value"), 6).as("v"))
    val sw = EventPipeline.sessionWindows(events, gapMinutes = 30)
      .groupBy($"user_id").agg(count(lit(1)).as("n"),
        sum($"n_events").as("ev"), round(sum($"sum_value"), 6).as("v"))
    assert(rows(lag) == rows(sw))
  }

  test("cluster operators match union-find on random graphs") {
    import graft.operators.Dedup
    for (trial <- 0 until 3) {
      val r = new Random(100 + trial)
      val nDocs = 60L
      val edges = (0 until 50).map(_ =>
          (r.nextInt(60).toLong + 1, r.nextInt(60).toLong + 1))
        .filter(p => p._1 != p._2)
      // reference: in-memory union-find
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        var c = x
        while (parent.getOrElse(c, c) != c) { c = parent(c) }
        c
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val canon = (1L to nDocs).map(d => d -> find(d)).toMap
      val sizes = canon.values.groupBy(identity).map { case (c, v) => c -> v.size.toLong }
      val expected = (1L to nDocs).map(d =>
        Seq[Any](d, canon(d), sizes(canon(d)), d == canon(d))).toSet

      val docs = (1L to nDocs).toDF("doc_id")
      val pairs = edges.toDF("a_id", "b_id")
      assert(rows(Dedup.duplicateClusters(docs, "doc_id", pairs, maxIters = 40))
        === expected, s"hash-min trial $trial")
      assert(rows(Dedup.duplicateClustersStar(docs, "doc_id", pairs))
        === expected, s"star trial $trial")
    }
  }

  test("lmScore matches a native bigram-model reference on random corpora") {
    val rnd = new Random(77)
    val vocab = Vector("aa", "bb", "cc", "dd", "ee")
    val docs = (1L to 40L).map(i =>
      (i, Seq.fill(rnd.nextInt(8) + 1)(vocab(rnd.nextInt(vocab.length)))
        .mkString(" ")))
    val got = graft.operators.Corpus.lmScore(
        docs.toDF("doc_id", "text"), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    // native reference: same add-one bigram model, same round6 +
    // order-free sum (here just a sequential sum of rounded terms)
    def r6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toSeq }
    val uni = toks.flatMap(_._2).groupBy(identity).view.mapValues(_.size).toMap
    val bi = toks.flatMap { case (_, ts) => ts.zip(ts.drop(1)) }
      .groupBy(identity).view.mapValues(_.size).toMap
    val v = uni.size
    toks.filter(_._2.length >= 2).foreach { case (id, ts) =>
      val contribs = ts.zip(ts.drop(1)).map { p =>
        r6(-math.log((bi(p) + 1.0) / (uni(p._1) + v).toDouble))
      }
      val want = r6(contribs.map(BigDecimal(_)).sum.toDouble / contribs.length)
      assert(got(id)._1 === contribs.length.toLong, s"doc $id n_pairs")
      assert(approx(got(id)._2, want, 1e-9), s"doc $id nll")
    }
  }

  test("semDedup drop set == naive per-cluster lower-id cosine scan") {
    import graft.operators.Similarity
    val rnd = new Random(41)
    val dim = 8
    // every third vector is an EXACT copy of the previous row (same
    // cluster assignment, cosine 1.0 — guaranteed drops); the rest are
    // fresh random vectors that may or may not collide
    var prev: Array[Double] = Array.fill(dim)(0.5)
    val corpus = (0L until 60L).map { i =>
      val v =
        if (i % 3 == 2) prev
        else { prev = Array.fill(dim)(rnd.nextDouble() - 0.5); prev }
      (i, v.map(_.toFloat).toSeq)
    }
    val df = corpus.toDF("vec_id", "embedding")
    val cents = IndexedSeq(
      (0L, Array.fill(dim)(0.3)), (1L, Array.fill(dim)(-0.3)),
      (2L, (0 until dim).map(d => if (d % 2 == 0) 0.4 else -0.4).toArray))
    val out = Similarity.semDedup(df, cents, threshold = 0.6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getBoolean(2)))
    // naive reference over the SAME assignment the operator reports
    def cos(a: Seq[Float], b: Seq[Float]): Double = {
      val ad = a.map(_.toDouble); val bd = b.map(_.toDouble)
      val dot = ad.zip(bd).map { case (x, y) => x * y }.sum
      math.floor(dot / (math.sqrt(ad.map(x => x * x).sum) *
        math.sqrt(bd.map(x => x * x).sum)) * 1e6 + 0.5) / 1e6
    }
    val byId = corpus.toMap
    val cid = out.map(r => r._1 -> r._2).toMap
    out.foreach { case (id, c, kept) =>
      val expectDrop = corpus.exists { case (j, vj) =>
        j < id && cid(j) == c && cos(vj, byId(id)) >= 0.6
      }
      assert(kept === !expectDrop, s"vec $id")
    }
    // the 20 planted exact copies MUST have been dropped — the test
    // cannot silently degenerate into an all-kept corpus
    assert(out.count(!_._3) >= 20)
  }

  test("piiScrub is idempotent, and zero counts imply the text is unchanged") {
    // random word soup with PII fragments spliced at random positions;
    // the replacement tags (<EMAIL>/<PHONE>/<IP>) contain no '@', '+'
    // or dotted quads, so a second scrub must be a no-op — and a doc
    // whose three counts are all zero must pass through byte-identical
    val words = Seq("alpha", "beta", "gamma", "delta", "x9", "v2.5", "a+b")
    val pii = Seq("u%d@ex.org", "+1-555-%04d", "10.0.0.%d")
    val docs = (0 until 200).map { k =>
      val base = Seq.fill(8)(words(rnd.nextInt(words.length)))
      val withPii =
        if (rnd.nextBoolean()) base
        else rnd.shuffle(base :+ pii(rnd.nextInt(3)).format(k % 100))
      (k.toLong, withPii.mkString(" "))
    }.toDF("doc_id", "text")
    val once = graft.operators.Corpus.piiScrub(docs, "doc_id", "text")
    val twice = graft.operators.Corpus.piiScrub(
      once.withColumnRenamed("clean_text", "text"), "doc_id", "text")
    assert(rows(once.select($"doc_id", $"clean_text")) ==
      rows(twice.select($"doc_id", $"clean_text")))
    // second pass finds nothing (tags are not PII-shaped)
    assert(twice.filter($"n_emails" + $"n_phones" + $"n_ips" > 0).isEmpty)
    // zero-count docs are byte-identical to their input
    val joined = docs.join(once, "doc_id")
      .filter($"n_emails" + $"n_phones" + $"n_ips" === 0)
    assert(joined.filter($"text" =!= $"clean_text").isEmpty)
    assert(joined.count() > 0) // some PII-free docs existed
  }

  test("shuffleShards invariants hold on random corpora (quotas, per-shard mix, density, determinism)") {
    import graft.operators.Packing
    for (trial <- 1 to 3) {
      val nSrc = 2 + rnd.nextInt(3)
      val sources = (0 until nSrc).map(s => s"s$s")
      // uneven random source populations, non-contiguous ids
      val docs = (0 until 300 + rnd.nextInt(200)).map { k =>
        (k.toLong * 7 + rnd.nextInt(3), sources(rnd.nextInt(nSrc)))
      }.distinct.toDF("doc_id", "source")
      // exact-binary proportions over a random subset of sources
      val chosen = rnd.shuffle(sources.toList).take(1 + rnd.nextInt(nSrc))
      val raw = chosen.map(_ -> (1 + rnd.nextInt(4)).toDouble)
      val tot = raw.map(_._2).sum
      val mix = raw.map { case (s, w) => s -> w / tot }.toMap
      val nShards = 2 + rnd.nextInt(4)
      val seed = rnd.nextLong()
      val out = Packing.shuffleShards(docs, "doc_id", "source",
        seed, nShards, mix).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      // quotas: per-source count = floor(N * p) with N = min floor(C/p)
      val counts = docs.groupBy("source").count().collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val n = mix.map { case (s, p) => math.floor(counts(s) / p).toLong }.min
      mix.foreach { case (s, p) =>
        val quota = math.floor(n * p).toLong
        assert(out.count(_._4 == s) === quota, s"trial $trial source $s")
        // round-robin: per-shard count of s is quota/nShards floor/ceil
        (0L until nShards).foreach { sh =>
          val c = out.count(r => r._1 == sh && r._4 == s)
          assert(c == quota / nShards || c == quota / nShards + 1,
            s"trial $trial source $s shard $sh count $c quota $quota")
        }
      }
      // only mixed sources appear; positions dense per shard; ids unique
      assert(out.map(_._4).toSet.subsetOf(mix.keySet))
      assert(out.map(_._3).distinct.length === out.length)
      out.groupBy(_._1).foreach { case (sh, rows0) =>
        assert(rows0.map(_._2).sorted.toSeq ===
          (0L until rows0.length.toLong).toSeq, s"trial $trial shard $sh")
      }
      // same seed reproduces exactly
      val again = Packing.shuffleShards(docs, "doc_id", "source",
        seed, nShards, mix).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      assert(again.sortBy(r => (r._1, r._2)).toSeq ===
        out.sortBy(r => (r._1, r._2)).toSeq)
    }
  }

  test("HashedBow kernel == composed split/hash/count pipeline on messy unicode") {
    // the kernel's byte-level tokenizer must match split(text, ' ') +
    // portable_hash + count/n EXACTLY — including multibyte UTF-8
    // (no 0x20 inside a multibyte sequence, but the hash must fold
    // the same bytes), EMPTY tokens from leading/trailing/double
    // spaces, and the empty string (one empty token).
    import graft.functions.PortableHash.portable_hash
    import org.apache.spark.sql.functions._
    val alphabet = Vector("a", "b", "é", "語", "𐀀", "zz", "", "日本")
    val texts = (1 to 60).map { i =>
      (0 until rnd.nextInt(12)).map(_ =>
        alphabet(rnd.nextInt(alphabet.length))).mkString(" ")
    } ++ Seq("", " ", "  ", "a  b", " lead", "trail ", "é 𐀀 é")
    val df = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val dim = 32
    val kernel = graft.operators.Classifier.hashedFeaturesSparse(
        df, "id", "text", lit(0.0), dim)
      .select(col("id"),
        transform(col("xs"), s => s.getField("j")).as("js"),
        transform(col("xs"), s => s.getField("x")).as("vals"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getSeq[Int](1), r.getSeq[Double](2))))
      .toMap
    val composed = df
      .select(col("id"), split(col("text"), " ").as("t"))
      .select(col("id"), size(col("t")).cast("double").as("n"),
        explode(col("t")).as("tok"))
      .groupBy(col("id"), col("n"),
        pmod(portable_hash(col("tok")), lit(dim)).cast("int").as("j"))
      .agg(count(lit(1)).cast("double").as("c"))
      .collect()
      .map(r => (r.getLong(0), r.getInt(2), r.getDouble(3) / r.getDouble(1)))
      .groupBy(_._1)
      .map { case (id, rs) =>
        id -> rs.sortBy(_._2).map(t => (t._2, t._3)).toSeq }
    assert(kernel.keySet === composed.keySet)
    kernel.foreach { case (id, (js, vals)) =>
      val exp = composed(id)
      assert(js === exp.map(_._1), s"id=$id bucket drift")
      // x values must be BIT-identical (same count/n division)
      assert(vals === exp.map(_._2), s"id=$id value drift")
    }
  }
}
