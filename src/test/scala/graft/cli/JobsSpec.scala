package graft.cli

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.nio.file.Files
import java.sql.Timestamp
import java.time.{ZonedDateTime, ZoneOffset, LocalDate}

/** CLI surface end-to-end: parse → pipeline → contract sink on disk. */
class JobsSpec extends SparkSpec {
  import spark.implicits._

  test("parseArgs: values, boolean flags, errors") {
    val a = Jobs.parseArgs(Seq("--start-date", "2021-01-01", "--partial",
      "--fid", "nhru_v1_1"))
    assert(a("start-date") == "2021-01-01")
    assert(a.has("partial") && !a.has("fill-missing"))
    intercept[RuntimeException](Jobs.parseArgs(Seq("--end-date")))
    intercept[RuntimeException](Jobs.parseArgs(Seq("stray")))
    intercept[Exception](Jobs.validDate("01/02/2021"))
  }

  test("gridmet-etl job: staged grid → contract parquet + attrs sidecar") {
    val dir = Files.createTempDirectory("graft-job").toString
    val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
    // stage inputs
    (for { i <- 0 to 1; j <- 0 to 1 } yield
      (t1, j, i, 40.0 + j, -100.0 + i, 285.0 + i, 275.0 + i, 1.0, 80.0, 40.0, 3.0))
      .toDF("time", "j", "i", "lat", "lon", "tmmx", "tmmn", "pr", "rmax", "rmin", "vs")
      .write.parquet(s"$dir/grid")
    Seq((1L, 40.0, -99.5, -100.0, 40.0, -99.0, 41.0))
      .toDF("nhru_v1_1", "lat", "lon", "minx", "miny", "maxx", "maxy")
      .write.parquet(s"$dir/feats")
    Files.writeString(java.nio.file.Paths.get(dir, "w.csv"),
      "nhru_v1_1,i,j,wght\n1,0,0,0.5\n1,1,0,0.5\n")

    val a = Jobs.parseArgs(Seq(
      "--start-date", "2021-01-01", "--end-date", "2021-01-01",
      "--grid-path", s"$dir/grid", "--target-file", s"$dir/feats",
      "--weights-file", s"$dir/w.csv", "--fid", "nhru_v1_1",
      "--output-path", s"$dir/out"))
    val path = Jobs.runGridmet(spark, a)
    assert(path.endsWith("2021-01-01_converted"))
    val out = spark.read.parquet(path)
    assert(out.columns.toSet ==
      Set("nhru", "time", "tmax", "tmin", "prcp", "rhmax", "rhmin", "ws", "humidity"))
    val tmax = out.select("tmax").as[Double].head()
    assert(approx(tmax, 285.5 - 273.15)) // mean of 285,286 K → °C
    val attrs = Files.readString(java.nio.file.Paths.get(path, "_attrs.json"))
    assert(attrs.contains("CF-1.8") && attrs.contains("degree_Celsius"))
  }

  test("gridmet-etl job: .shp target suffix-dispatches through the shapefile reader") {
    val dir = Files.createTempDirectory("graft-job-shp").toString
    val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
    (for { i <- 0 to 1; j <- 0 to 1 } yield
      (t1, j, i, 40.0 + j, -100.0 + i, 285.0 + i, 275.0 + i, 1.0, 80.0, 40.0, 3.0))
      .toDF("time", "j", "i", "lat", "lon", "tmmx", "tmmn", "pr", "rmax", "rmin", "vs")
      .write.parquet(s"$dir/grid")
    // same rectangle the parquet-feats test stages, but as a real
    // polygon: bbox/centroid are DERIVED from the rings in-engine
    val shpPath = graft.sources.ShpTestData.write(dir, "feats", Seq(
      1L -> Seq(Seq((-100.0, 40.0), (-100.0, 41.0), (-99.0, 41.0),
        (-99.0, 40.0), (-100.0, 40.0)))))
    Files.writeString(java.nio.file.Paths.get(dir, "w.csv"),
      "nhru_v1_1,i,j,wght\n1,0,0,0.5\n1,1,0,0.5\n")
    val a = Jobs.parseArgs(Seq(
      "--start-date", "2021-01-01", "--end-date", "2021-01-01",
      "--grid-path", s"$dir/grid", "--target-file", shpPath,
      "--weights-file", s"$dir/w.csv", "--fid", "nhru_v1_1",
      "--output-path", s"$dir/out"))
    val path = Jobs.runGridmet(spark, a)
    val out = spark.read.parquet(path)
    assert(out.columns.toSet ==
      Set("nhru", "time", "tmax", "tmin", "prcp", "rhmax", "rhmin", "ws", "humidity"))
    assert(approx(out.select("tmax").as[Double].head(), 285.5 - 273.15))
  }

  test("genmap round-trip: --genmap persists the NN mapping; a rerun consumes it") {
    val dir = Files.createTempDirectory("graft-genmap").toString
    val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
    // feature 1 covered by weights, feature 2 NOT → missing, NN-filled from 1
    (for { i <- 0 to 1; j <- 0 to 1 } yield
      (t1, j, i, 40.0 + j, -100.0 + i, 285.0 + i, 275.0 + i, 1.0, 80.0, 40.0, 3.0))
      .toDF("time", "j", "i", "lat", "lon", "tmmx", "tmmn", "pr", "rmax", "rmin", "vs")
      .write.parquet(s"$dir/grid")
    Seq((1L, 40.0, -99.5, -100.0, 40.0, -99.0, 41.0),
        (2L, 40.4, -99.4, -100.0, 40.0, -99.0, 41.0))
      .toDF("nhru_v1_1", "lat", "lon", "minx", "miny", "maxx", "maxy")
      .write.parquet(s"$dir/feats")
    Files.writeString(java.nio.file.Paths.get(dir, "w.csv"),
      "nhru_v1_1,i,j,wght\n1,0,0,0.5\n1,1,0,0.5\n")
    val base = Seq(
      "--start-date", "2021-01-01", "--end-date", "2021-01-01",
      "--grid-path", s"$dir/grid", "--target-file", s"$dir/feats",
      "--weights-file", s"$dir/w.csv", "--fid", "nhru_v1_1",
      "--output-path", s"$dir/out", "--fill-missing")
    // run 1: generate + persist the mapping
    val p1 = Jobs.runGridmet(spark, Jobs.parseArgs(base :+ "--genmap"))
    val csv = spark.read.option("header", "true")
      .csv(s"$dir/out/fill_missing_nearest.csv")
    assert(csv.select("miss_fid", "fill_fid").as[(String, String)]
      .collect().toSeq == Seq(("2", "1")))
    // run 2: consume the persisted mapping (genmap=False, helper.py:79)
    val p2 = Jobs.runGridmet(spark, Jobs.parseArgs(
      base ++ Seq("--mapping-file", "fill_missing_nearest.csv")))
    val r1 = rows(spark.read.parquet(p1))
    val r2 = rows(spark.read.parquet(p2))
    assert(r1 == r2 && r1.nonEmpty)
    // filled: feature 2's series equals feature 1's
    val out = spark.read.parquet(p2)
    val byF = out.select($"nhru", $"tmax").as[(Long, Double)].collect().toMap
    assert(byF(2L) == byF(1L))
  }

  test("dedup-admit job: two-run lifecycle over persisted fingerprint state") {
    val dir = Files.createTempDirectory("graft-dedup-job").toString
    Seq((1L, "alpha"), (2L, "beta"), (3L, "alpha"))
      .toDF("doc_id", "text").write.parquet(s"$dir/batch1")
    Seq((10L, "alpha"), (11L, "gamma"))
      .toDF("doc_id", "text").write.parquet(s"$dir/batch2")
    def run(n: Int) = Jobs.runDedupAdmit(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/batch$n", "--state-path", s"$dir/state",
      "--output-path", s"$dir/out$n")))
    val out1 = spark.read.parquet(run(1))
      .select("doc_id").as[Long].collect().sorted
    assert(out1.toSeq == Seq(1L, 2L))
    // run 2 admits only the state-new text; "alpha" is rejected by the
    // fingerprints run 1 appended
    val out2 = spark.read.parquet(run(2))
      .select("doc_id").as[Long].collect().sorted
    assert(out2.toSeq == Seq(11L))
    assert(spark.read.parquet(s"$dir/state").count() == 3L)
  }

  test("pack-tokens job: documents -> packed shards, token-count preserving") {
    val dir = Files.createTempDirectory("graft-pack-job").toString
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta"),
      (3L, "eta theta iota kappa lambda mu nu xi"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/docs")
    val out = Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/shards",
      "--context-len", "4", "--n-shards", "2")))
    val back = graft.sinks.TokenSink.readPackedTokens(spark, out)
    // every whitespace token of every doc landed in exactly one chunk
    assert(back.selectExpr("sum(size(token_ids))").as[Long].head() === 14L)
    // layout: each shard's non-final chunks are exactly context-len
    val chunks = back.as[(Int, Long, Seq[Int])].collect()
    chunks.groupBy(_._1).foreach { case (sh, cs) =>
      cs.sortBy(_._2).dropRight(1).foreach { c =>
        assert(c._3.length === 4, s"shard $sh chunk ${c._2}") }
    }
  }

  test("pack-sft job: conversations -> twin token/mask GTOK planes with identical geometry") {
    val dir = Files.createTempDirectory("graft-pack-sft").toString
    val convs = Seq(
      (1L, "user asks one thing", "assistant answers with several words"),
      (2L, "short prompt", "a reply"),
      (3L, "another question here", "and its complete answer follows now"))
      .toDF("id", "prompt", "response")
    convs.write.parquet(s"$dir/convs")
    val out = Jobs.runPackSft(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/convs", "--output-path", s"$dir/sft",
      "--context-len", "8", "--n-shards", "2")))
    val toks = graft.sinks.TokenSink.readPackedTokens(spark, s"$out/tokens")
      .as[(Int, Long, Seq[Int])].collect().map(c => (c._1, c._2) -> c._3).toMap
    val masks = graft.sinks.TokenSink.readPackedTokens(spark, s"$out/masks")
      .as[(Int, Long, Seq[Int])].collect().map(c => (c._1, c._2) -> c._3).toMap
    // identical chunk geometry across the two planes
    assert(toks.keySet === masks.keySet)
    toks.foreach { case (k, ids) =>
      assert(masks(k).length === ids.length, s"chunk $k length drift") }
    // the mask plane is 0/1 and counts exactly the response tokens
    val allMask = masks.values.flatten.toSeq
    assert(allMask.forall(m => m == 0 || m == 1))
    val nResp = convs
      .selectExpr("sum(size(filter(split(response, ' '), w -> w <> '')))")
      .as[Long].head()
    assert(allMask.map(_.toLong).sum === nResp)
    // and total stream length = every prompt + response token
    val nAll = convs.selectExpr(
      "sum(size(filter(split(prompt, ' '), w -> w <> '')) + " +
        "size(filter(split(response, ' '), w -> w <> '')))").as[Long].head()
    assert(allMask.length.toLong === nAll)
  }

  test("mix-weights job: DoReMi weight artifact round-trips and matches the operator") {
    val dir = Files.createTempDirectory("graft-mixw").toString
    val docs = (1L to 40L).map { i =>
      val src = if (i % 2 == 0) "web" else "books"
      // give the two sources different bigram surprisal profiles
      val text = if (i % 2 == 0) s"common words common words unique$i token"
        else "common words common words common words"
      (i, text, src)
    }.toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/docs")
    val out = Jobs.runMixWeights(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/w.tsv")))
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(out)), "UTF-8").trim.split("\n")
    assert(lines.length === 2)
    val parsed = lines.map(_.split("\t")).map(a =>
      a(0) -> (a(1).toLong, a(2).toDouble, a(3).toDouble)).toMap
    assert(parsed.keySet === Set("books", "web"))
    // round-trips bit-exactly against the operator
    val expect = graft.operators.Sampling.doremiWeights(
        graft.operators.Corpus.lmScore(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id"),
        col("source"), col("nll"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(parsed === expect)
    // weights sum to 1 within round6 tolerance
    assert(math.abs(parsed.values.map(_._3).sum - 1.0) < 3e-6)
  }

  test("select-corpus --weights-file: TSV-applied mixture equals the in-plan apply") {
    val dir = Files.createTempDirectory("graft-mixapply").toString
    val docs = (1L to 60L).map { i =>
      val src = if (i % 2 == 0) "web" else "books"
      val text = if (i % 2 == 0) s"common words common words unique$i token"
        else "common words common words common words"
      (i, text, src)
    }.toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/docs")
    // fit once, persist the artifact
    val wf = Jobs.runMixWeights(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/w.tsv")))
    // apply via the CLI seam (no budget/dsir stages, no split noise)
    Jobs.runSelectCorpus(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/sel",
      "--weights-file", wf, "--splits", "train=100")))
    val viaTsv = spark.read.parquet(s"$dir/sel")
      .select("doc_id").as[Long].collect().sorted
    // the q172 in-plan apply over the same docs: weights from the
    // operator, shares via the identical decimal-sum derivation
    val w = graft.operators.Sampling.doremiWeights(
        graft.operators.Corpus.lmScore(docs, "doc_id", "text")
          .join(docs.select(col("doc_id"), col("source")), "doc_id"),
        col("source"), col("nll"))
      .select(col("domain"), col("weight")).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toSeq
    val inPlan = graft.operators.Sampling.mixSample(docs, col("doc_id"),
        col("source"), Jobs.mixShares(w))
      .select("doc_id").as[Long].collect().sorted
    assert(viaTsv.nonEmpty && (viaTsv sameElements inPlan))
  }

  test("pack-dpo job: preference pairs -> four aligned GTOK planes keyed by pair_id") {
    val dir = Files.createTempDirectory("graft-pack-dpo").toString
    val pairs = Seq(
      (1L, "please summarize this text", "a good concise summary",
        "a bad long rambling answer"),
      (2L, "what is two plus two", "four", "five maybe"),
      (3L, "translate hello friend", "bonjour mon ami", "je ne sais pas"))
      .toDF("id", "prompt", "chosen", "rejected")
    pairs.write.parquet(s"$dir/pairs")
    val out = Jobs.runPackDpo(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/pairs", "--output-path", s"$dir/dpo",
      "--context-len", "6", "--n-shards", "2")))
    def read(sub: String) =
      graft.sinks.TokenSink.readPackedTokens(spark, s"$out/$sub")
        .as[(Int, Long, Seq[Int])].collect()
        .map(c => (c._1, c._2) -> c._3).toMap
    val ct = read("chosen_tokens"); val cm = read("chosen_masks")
    val rt = read("rejected_tokens"); val rm = read("rejected_masks")
    // identical (shard, pair_id) geometry across all four planes —
    // the invariant a trainer zipping the sidecar indexes relies on
    assert(ct.keySet === cm.keySet && ct.keySet === rt.keySet &&
      ct.keySet === rm.keySet)
    assert(ct.keySet.map(_._2) === Set(1L, 2L, 3L))
    ct.foreach { case (k, ids) =>
      assert(ids.length === cm(k).length && ids.length <= 6) }
    rt.foreach { case (k, ids) =>
      assert(ids.length === rm(k).length && ids.length <= 6) }
    // masks are 0/1 with ≥1 response token per plane (the dpoPairPack
    // drop contract guarantees it), prompt prefix then response suffix
    (cm.values ++ rm.values).foreach { m =>
      assert(m.forall(x => x == 0 || x == 1))
      assert(m.sum >= 1)
      assert(m === m.sorted)
    }
  }

  test("pack-tokens --fim-pct: PSM rearrangement feeds the shards (sentinels counted)") {
    val dir = Files.createTempDirectory("graft-pack-fim").toString
    val docs = Seq((1L, "alpha beta gamma delta"), (2L, "epsilon zeta"),
      (3L, "eta theta iota kappa lambda mu nu xi"))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/docs")
    val out = Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/shards",
      "--context-len", "4", "--n-shards", "2",
      "--fim-pct", "100", "--fim-seed", "7")))
    val back = graft.sinks.TokenSink.readPackedTokens(spark, out)
    // every doc transformed: 14 tokens + 3 sentinels per doc = 23
    assert(back.selectExpr("sum(size(token_ids))").as[Long].head() === 23L)
    // each transformed stream carries exactly one of each sentinel
    // (65533–65535: the top of the 2-byte packing space, which the
    // hash tokenization vacates under --fim-pct)
    val counts = back.selectExpr(
        "sum(size(filter(token_ids, t -> t = 65533)))",
        "sum(size(filter(token_ids, t -> t = 65534)))",
        "sum(size(filter(token_ids, t -> t = 65535)))")
      .as[(Long, Long, Long)].head()
    assert(counts === ((3L, 3L, 3L)))
  }

  test("pack-tokens --shuffle-seed + --mix: seeded training order with per-source quotas") {
    val dir = Files.createTempDirectory("graft-pack-shuf").toString
    val docs = Seq(
      (1L, "alpha beta gamma", "web"), (2L, "delta epsilon", "web"),
      (3L, "zeta eta theta iota", "web"), (4L, "kappa lambda", "web"),
      (5L, "mu nu xi", "book"), (6L, "omicron pi rho sigma", "book"))
      .toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/docs")
    // mix 0.5/0.5 over 4 web + 2 book docs: N = min(8, 4) = 4 →
    // quotas 2 web + 2 book; the shards carry exactly the 4 selected
    // docs' tokens (which 2 web docs is the seeded permutation's pick)
    val out = Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/shards",
      "--context-len", "4", "--n-shards", "2",
      "--shuffle-seed", "42", "--mix", "web=0.5,book=0.5")))
    val assigned = graft.operators.Packing.shuffleShards(
      docs, "doc_id", "source", 42L, 2, Map("web" -> 0.5, "book" -> 0.5))
      .collect().map(r => (r.getLong(2), r.getString(3)))
    assert(assigned.length === 4)
    assert(assigned.count(_._2 == "web") === 2)
    assert(assigned.count(_._2 == "book") === 2)
    val tokCounts = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length).toMap
    val expectedTokens = assigned.map(a => tokCounts(a._1)).sum.toLong
    val back = graft.sinks.TokenSink.readPackedTokens(spark, out)
    assert(back.selectExpr("sum(size(token_ids))").as[Long].head() ===
      expectedTokens)
    // a missing --mix fails loudly rather than silently packing all
    intercept[IllegalArgumentException] {
      Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
        "--input-path", s"$dir/docs", "--output-path", s"$dir/shards2",
        "--shuffle-seed", "42")))
    }
  }

  test("pack-tokens --epochs / --anneal-quality / --boundaries-out: training-order family on the CLI") {
    val dir = Files.createTempDirectory("graft-pack-curr").toString
    val docs = Seq(
      (1L, "alpha beta gamma", "web"), (2L, "delta epsilon", "web"),
      (3L, "zeta eta theta iota", "web"), (4L, "kappa lambda", "web"),
      (5L, "mu nu xi", "book"), (6L, "omicron pi rho sigma", "book"))
      .toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/docs")
    // --epochs 2 doubles the packed stream (same selected docs, two
    // seeded orders); boundaries index agrees with the doubled layout
    val out = Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/shards",
      "--context-len", "4", "--n-shards", "2",
      "--shuffle-seed", "42", "--mix", "web=0.5,book=0.5",
      "--epochs", "2", "--boundaries-out", s"$dir/bounds")))
    val assigned = graft.operators.Packing.shuffleShards(
      docs, "doc_id", "source", 42L, 2, Map("web" -> 0.5, "book" -> 0.5))
      .collect().map(r => r.getLong(2))
    val tokCounts = docs.collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ").length).toMap
    val perEpoch = assigned.map(tokCounts(_)).sum.toLong
    val back = graft.sinks.TokenSink.readPackedTokens(spark, out)
    assert(back.selectExpr("sum(size(token_ids))").as[Long].head() ===
      2L * perEpoch)
    // one boundary row per (doc, epoch) — each selected doc starts
    // twice in the doubled stream
    val bounds = spark.read.parquet(s"$dir/bounds")
    assert(bounds.count() === 2L * assigned.length)
    assert(bounds.groupBy("id").count().collect()
      .forall(_.getLong(1) === 2L))
    // --anneal-quality: a never-true threshold reduces to the plain
    // seeded layout (same total tokens as the single-epoch run)
    val out2 = Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/shards2",
      "--context-len", "4", "--n-shards", "2",
      "--shuffle-seed", "42", "--mix", "web=0.5,book=0.5",
      "--anneal-quality", "9.9")))
    assert(graft.sinks.TokenSink.readPackedTokens(spark, out2)
      .selectExpr("sum(size(token_ids))").as[Long].head() === perEpoch)
    // loud refusals: the combination, and boundaries without a seed
    intercept[IllegalArgumentException] {
      Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
        "--input-path", s"$dir/docs", "--output-path", s"$dir/x",
        "--shuffle-seed", "42", "--mix", "web=0.5,book=0.5",
        "--epochs", "2", "--anneal-quality", "0.5")))
    }
    intercept[IllegalArgumentException] {
      Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
        "--input-path", s"$dir/docs", "--output-path", s"$dir/y",
        "--boundaries-out", s"$dir/z")))
    }
  }

  test("pack-tokens --span-corrupt-out: span table matches the operator over the CLI's own tokenization") {
    val dir = Files.createTempDirectory("graft-pack-span").toString
    // docs long enough to carry ≥2 full 16-token blocks
    val docs = (0L until 30L).map(i =>
      (i, (0 until 40).map(j => s"w${(i * 7 + j) % 90}").mkString(" "),
        "web"))
      .toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/docs")
    Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/shards",
      "--context-len", "8", "--n-shards", "2",
      "--span-corrupt-out", s"$dir/spans", "--span-seed", "11")))
    val spans = spark.read.parquet(s"$dir/spans")
    // the CLI's fallback tokenizer (xxhash64 buckets) — the span table
    // must be computed over exactly these ids
    val tok = docs.select(col("doc_id").as("id"),
      expr("transform(filter(split(text, ' '), w -> w <> ''), " +
        "w -> CAST(pmod(xxhash64(w), 65536L) AS INT))").as("ids"))
    val expect = graft.operators.Packing.spanCorruption(
      tok, col("id"), col("ids"), 11L)
    assert(spans.count() > 0)
    assert(rows(spans) === rows(expect))
  }

  test("pack-tokens --binpack-out: bin assignment matches the operator over the CLI's own tokenization") {
    val dir = Files.createTempDirectory("graft-pack-bin").toString
    val docs = (0L until 30L).map(i =>
      (i, (0 until ((i % 12) + 1).toInt)
        .map(j => s"w${(i * 7 + j) % 90}").mkString(" "), "web"))
      .toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/docs")
    Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/shards",
      "--context-len", "8", "--n-shards", "2",
      "--binpack-out", s"$dir/bins", "--binpack-seed", "11")))
    val bins = spark.read.parquet(s"$dir/bins")
    val tok = docs.select(col("doc_id").as("id"),
      expr("transform(filter(split(text, ' '), w -> w <> ''), " +
        "w -> CAST(pmod(xxhash64(w), 65536L) AS INT))").as("ids"))
    val expect = graft.operators.Packing.binPackByLength(
      tok.select(col("id"), size(col("ids")).cast("long").as("n")),
      col("id"), col("n"), contextLen = 8, nShards = 2, seed = 11L)
    assert(bins.count() > 0)
    assert(rows(bins) === rows(expect))
  }

  test("select-corpus --dsir-target-col: importance resample gates the pool") {
    val dir = Files.createTempDirectory("graft-select-dsir").toString
    // half the pool speaks the target vocabulary, half something else
    val docs = (0L until 40L).map { i =>
      val tgt = i % 4 == 0
      val text = if (tgt || i % 2 == 1) "alpha beta gamma delta alpha beta"
        else "omega psi chi tau omega nu"
      (i, text, tgt)
    }.toDF("doc_id", "text", "is_target")
    docs.write.parquet(s"$dir/docs")
    Jobs.runSelectCorpus(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/out",
      "--dsir-target-col", "is_target", "--dsir-k", "12",
      "--dsir-dim", "64", "--splits", "train=100")))
    val got = spark.read.parquet(s"$dir/out")
    assert(got.count() === 12)
    // the CLI path must equal the operator composition exactly
    val sel = graft.operators.Dsir.resample(docs, "doc_id", "text",
        col("is_target"), dim = 64, k = 12)
      .filter(col("rank").isNotNull)
    assert(got.select("doc_id").collect().map(_.getLong(0)).sorted.toSeq ===
      sel.select("id").collect().map(_.getLong(0)).sorted.toSeq)
  }

  test("select-corpus: budget + cluster-keyed split matches the operator composition") {
    val dir = Files.createTempDirectory("graft-select").toString
    val docs = (0L until 60L).map(i =>
      (i, (0 until ((i % 15) + 2).toInt)
        .map(j => if (j % 3 == 0) "the" else s"w${(i * 7 + j) % 90}")
        .mkString(" ")))
      .toDF("doc_id", "text")
    docs.write.parquet(s"$dir/docs")
    val clusters = graft.operators.Dedup.duplicateClusters(docs, "doc_id",
      Seq((1L, 2L), (2L, 3L), (40L, 41L)).toDF("a_id", "b_id"))
    clusters.write.parquet(s"$dir/clusters")
    Jobs.runSelectCorpus(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/out",
      "--budget", "300", "--clusters", s"$dir/clusters",
      "--splits", "train=90,test=10")))
    val got = spark.read.parquet(s"$dir/out")
    // expected: score+count, budget-select, leakage-safe split
    val st = graft.functions.TextKernels.text_stats(col("text"),
      graft.functions.TextFunctions.LangProfiles("en"))
    val scored = docs.withColumn("quality", st.getField("quality"))
      .withColumn("n_tokens", st.getField("ws_tokens").cast("long"))
    val sel = graft.operators.Sampling.selectByTokenBudget(
      scored, col("doc_id"), col("quality"), col("n_tokens"), 300L)
    val expect = graft.operators.Sampling.leakageSafeSplit(
      scored.join(sel.select(col("id")),
        col("doc_id") === col("id"), "left_semi"),
      col("doc_id"), clusters, Seq(("train", 90), ("test", 10)))
    assert(got.count() > 0 && got.count() < 60)
    assert(rows(got) === rows(expect))
    // split column present and clusters unsplit
    val byCanon = got.select($"canon_id", $"split").distinct().collect()
      .groupBy(_.getLong(0))
    assert(byCanon.values.forall(_.length == 1))
  }

  test("train-bpe: learned artifacts load through Bpe and tokenize with the learned merges") {
    val dir = Files.createTempDirectory("graft-bpe-train").toString
    val docs = Seq(
      "low low low low low lower lower newest newest",
      "newest newest newest newest widest widest widest")
      .toDF("text")
    docs.write.parquet(s"$dir/docs")
    Jobs.runTrainBpe(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/model",
      "--n-merges", "6")))
    // the artifact pair must round-trip through the PUBLIC loader
    val model = graft.functions.Bpe.load(
      s"$dir/model/vocab.json", s"$dir/model/merges.txt")
    val got = docs.limit(1).select(
        graft.functions.Bpe.bpe_tokenize(col("text"), model).as("ids"))
      .collect().head.getSeq[Int](0)
    assert(got.nonEmpty)
    // ids must decode back through the vocab: every id is a real token,
    // and the tokens' concatenation per word reconstructs the text
    val vocab = graft.functions.Bpe
      .parseVocab(s"$dir/model/vocab.json").map(_.swap).toMap
    val text = "low low low low low lower lower newest newest"
    assert(got.forall(vocab.contains))
    assert(got.map(vocab).mkString === text.replace(" ", ""))
    // the learned merges actually merge: far fewer ids than characters
    assert(got.length < text.replace(" ", "").length)
    // e2e composition: pack-tokens consumes the trained artifacts
    docs.withColumn("doc_id", monotonically_increasing_id())
      .write.parquet(s"$dir/docs_id")
    Jobs.runPackTokens(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs_id", "--output-path", s"$dir/shards",
      "--context-len", "8", "--n-shards", "2",
      "--bpe-vocab", s"$dir/model/vocab.json",
      "--bpe-merges", s"$dir/model/merges.txt")))
    assert(new java.io.File(s"$dir/shards").listFiles().nonEmpty)
    // vocab.json well-formedness: unique token keys (the id map is
    // parser-independent) and a contiguous 0..n-1 id space
    val entries = graft.functions.Bpe.parseVocab(s"$dir/model/vocab.json")
    assert(entries.map(_._1).distinct.length === entries.length)
    assert(entries.map(_._2).sorted === entries.indices.toList)
  }

  test("curate job: html extraction -> canonical-URL dedup -> gopher gate") {
    val dir = Files.createTempDirectory("graft-curate").toString
    val good = (("the quick brown fox jumps over the lazy dog to be " +
      "sure of that and it will have done so with ease ") * 3).trim
    def page(body: String) =
      s"<html><head><script>t(1 < 2);</script></head><body><p>$body</p></body></html>"
    Seq(
      (1L, page(good), "HTTP://Ex.COM:80/a?utm_x=1&k=2"),
      (2L, page(good), "http://ex.com/a?k=2"),        // url-dup of 1
      (3L, page(good), "http://ex.com/b"),
      (4L, page("too short"), "http://ex.com/c"))     // fails the gate
      .toDF("doc_id", "text", "url")
      .write.parquet(s"$dir/docs")
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/kept",
      "--html", "true", "--url-col", "url")))
    val kept = spark.read.parquet(s"$dir/kept").orderBy("doc_id").collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L, 3L))
    // extraction ran before the gate: prose only, no markup
    kept.foreach { r =>
      val t = r.getString(1)
      assert(!t.contains("<") && !t.contains("t(1"))
      assert(t.startsWith("the quick brown fox"))
    }
    // audit mode: every row survives, per-rule columns ride along
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/audit",
      "--html", "true", "--keep-all", "true")))
    val audit = spark.read.parquet(s"$dir/audit")
    assert(audit.count() === 4L)
    assert(audit.columns.contains("pass") &&
      audit.columns.contains("n_rules_failed"))
    assert(audit.filter(col("pass")).count() === 3L) // no URL dedup here
    // --line-rules: C4 pass runs before the gate; a lorem-ipsum doc
    // dies there even though its body would pass Gopher
    val sentences = (1 to 10).map(i =>
      s"Sentence number $i of the body keeps the quick brown fox busy " +
        "with the lazy dog to be sure of that and have it done.")
    Seq(
      (10L, sentences.mkString("\n")),
      (11L, (sentences :+ "Some Lorem Ipsum for flavor.").mkString("\n")))
      .toDF("doc_id", "text").write.parquet(s"$dir/docs2")
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs2", "--output-path", s"$dir/kept2",
      "--line-rules", "true")))
    val kept2 = spark.read.parquet(s"$dir/kept2").collect()
    assert(kept2.map(_.getLong(0)).toSeq === Seq(10L))
    assert(kept2.head.getString(1).startsWith("Sentence number 1"))
  }

  test("curate job: blocklist, normalize and paragraph-dedup stages") {
    val dir = Files.createTempDirectory("graft-curate2").toString
    val body = (("the quick brown fox jumps over the lazy dog to be " +
      "sure of that and it will have done so with ease ") * 3).trim
    val banner = "Subscribe to the newsletter for updates on the dog."
    // --blocklist: listed domain kills doc 3 (subdomain) before
    // anything else; --normalize: doc 1 carries a decomposed accent +
    // zero-width that must be gone from the output; --paragraph-dedup:
    // the shared banner survives only in doc 1.
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "blocked.txt"),
      "banned.com\n".getBytes("UTF-8"))
    Seq(
      (1L, s"$body Café​.\n$banner", "http://ok.com/a"),
      (2L, s"$body two.\n$banner", "http://ok.com/b"),
      (3L, s"$body three.\n$banner", "http://a.b.Banned.COM/c"))
      .toDF("doc_id", "text", "url")
      .write.parquet(s"$dir/docs")
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/kept",
      "--url-col", "url", "--blocklist", s"$dir/blocked.txt",
      "--normalize", "true", "--paragraph-dedup", "true")))
    val kept = spark.read.parquet(s"$dir/kept")
      .orderBy("doc_id").collect()
    assert(kept.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    val t1 = kept(0).getString(1)
    val t2 = kept(1).getString(1)
    // normalization: NFC-composed é, zero-width stripped — BEFORE the
    // paragraph fingerprints
    assert(t1.contains("Café.") && !t1.contains("​"))
    // paragraph dedup: banner kept only in the globally-first doc
    assert(t1.contains(banner) && !t2.contains(banner))
  }

  test("dedup-admit --near: near-dup lifecycle across two batches with persisted signatures") {
    val dir = Files.createTempDirectory("graft-admit-near").toString
    val base = "the quick brown fox jumps over the lazy dog every morning"
    Seq((1L, base), (2L, base + " extraword"), (3L, "completely different words in this other document right here"))
      .toDF("doc_id", "text").write.parquet(s"$dir/b1")
    Jobs.runDedupAdmit(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/b1", "--output-path", s"$dir/out1",
      "--state-path", s"$dir/state", "--near")))
    // batch-internal election: 2 is a near-dup of lower-id 1
    assert(spark.read.parquet(s"$dir/out1")
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(1L, 3L))
    Seq((10L, base + " indeed"), (11L, "a totally novel batch two document with its own fresh content"))
      .toDF("doc_id", "text").write.parquet(s"$dir/b2")
    Jobs.runDedupAdmit(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/b2", "--output-path", s"$dir/out2",
      "--state-path", s"$dir/state", "--near")))
    // 10 near-dups the ACCEPTED doc 1 through the persisted signature
    // artifact (never re-shingled); 11 is novel
    assert(spark.read.parquet(s"$dir/out2")
      .collect().map(_.getLong(0)).toSeq === Seq(11L))
    // state carries signatures for exactly the admitted docs
    assert(spark.read.parquet(s"$dir/state")
      .select("id").collect().map(_.getLong(0)).sorted.toSeq ===
      Seq(1L, 3L, 11L))
  }

  test("curate --signals-out: the q153 sheet covers exactly the survivors") {
    val dir = Files.createTempDirectory("graft-curate-signals").toString
    val longDoc = (("the quick brown fox jumps over the lazy dog and " +
      "then runs back home to rest for a while before dinner ") * 5).trim
    Seq((1L, longDoc), (2L, "tiny"))
      .toDF("doc_id", "text").write.parquet(s"$dir/docs")
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/kept",
      "--signals-out", s"$dir/signals")))
    val kept = spark.read.parquet(s"$dir/kept")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val sig = spark.read.parquet(s"$dir/signals")
    assert(sig.select("doc_id").collect().map(_.getLong(0)).toSet === kept)
    assert(Seq("quality", "pred_lang", "dup_ngram_ratio", "gopher_pass")
      .forall(sig.columns.contains))
    assert(sig.filter(col("gopher_pass")).count() === sig.count())
  }

  test("curate --weights-file: persisted DoReMi mixture gates curate without refitting") {
    val dir = Files.createTempDirectory("graft-curate-mix").toString
    val body = (("the quick brown fox jumps over the lazy dog to be " +
      "sure of that and it will have done so with ease ") * 3).trim
    val docs = (1L to 60L).map { i =>
      val src = if (i % 2 == 0) "web" else "books"
      (i, s"$body marker$i", src)
    }.toDF("doc_id", "text", "source")
    docs.write.parquet(s"$dir/docs")
    // fit once, persist the artifact (the mix-weights job)
    val wf = Jobs.runMixWeights(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/w.tsv")))
    // deploy: curate consumes the artifact as its final stage
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/mixed",
      "--weights-file", wf)))
    val viaJob = spark.read.parquet(s"$dir/mixed")
      .select("doc_id").as[Long].collect().sorted
    // reference: the same curate WITHOUT the mixture, then the q172
    // in-plan apply over its survivors — fit-once/apply-later must be
    // indistinguishable from fitting inline
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/plain")))
    val survivors = spark.read.parquet(s"$dir/plain")
    val inPlan = graft.operators.Sampling.mixSample(survivors,
        col("doc_id"), col("source"),
        Jobs.mixShares(Jobs.loadMixWeights(spark, wf)))
      .select("doc_id").as[Long].collect().sorted
    assert(viaJob.nonEmpty && (viaJob sameElements inPlan))
    // the mixture is a SELECTION stage: output ⊆ gate survivors
    val plainIds = survivors.select("doc_id").as[Long].collect().toSet
    assert(viaJob.forall(plainIds.contains))
  }

  test("loadMixWeights validates the artifact at the parse site") {
    val dir = Files.createTempDirectory("graft-mixval").toString
    def write(name: String, content: String): String = {
      val p = java.nio.file.Paths.get(dir, name)
      java.nio.file.Files.write(p, content.getBytes("UTF-8"))
      p.toString
    }
    // duplicated domain line: would inflate the share sum while toMap
    // silently drops one entry — must fail naming the file
    val dup = write("dup.tsv",
      "web\t1\t0.5\t0.6\nweb\t1\t0.5\t0.4\n")
    val e1 = intercept[IllegalArgumentException](
      Jobs.loadMixWeights(spark, dup))
    assert(e1.getMessage.contains("duplicate domain") &&
      e1.getMessage.contains("dup.tsv"))
    // non-positive weight: fail at parse, naming file and line
    val neg = write("neg.tsv", "web\t1\t0.5\t0.6\nbooks\t1\t0.5\t-0.1\n")
    val e2 = intercept[IllegalArgumentException](
      Jobs.loadMixWeights(spark, neg))
    assert(e2.getMessage.contains("non-positive weight") &&
      e2.getMessage.contains("line 2"))
    // malformed field count still names the line
    val bad = write("bad.tsv", "web\t0.6\n")
    val e3 = intercept[IllegalArgumentException](
      Jobs.loadMixWeights(spark, bad))
    assert(e3.getMessage.contains("line 1"))
  }

  test("train-unigram: piece-table artifact matches the operator, scores round-trip") {
    val dir = Files.createTempDirectory("graft-unigram").toString
    (1 to 20).map(_ => "shop shut shed").toDF("text")
      .write.parquet(s"$dir/docs")
    Jobs.runTrainUnigram(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/pieces.tsv",
      "--max-piece-len", "3", "--min-count", "5")))
    val lines = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/pieces.tsv")), "UTF-8")
      .linesIterator.filter(_.nonEmpty).toSeq
    val parsed = lines.map { l =>
      val Array(p, s, u) = l.split("\t")
      (p, s.toDouble, u.toLong)
    }
    val expect = graft.operators.UnigramLm.trainUnigram(
        spark.read.parquet(s"$dir/docs"), "text",
        maxPieceLen = 3, minCount = 5, maxVocab = 1000, iters = 2)
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2)))
    assert(parsed.toSet === expect.toSet)
    // artifact order is (score desc, piece asc) — deterministic
    assert(parsed === parsed.sortBy(t => (-t._2, t._1)))
  }

  test("train-classifier artifact round-trips and gates curate") {
    val dir = Files.createTempDirectory("graft-clf").toString
    val goodBody = (("the quick brown fox jumps over the lazy dog to " +
      "be sure of that and it will have done so with ease ") * 3).trim
    val badBody = (("the omega psi of the chi and delta to sigma in " +
      "theta is kappa epsilon and the zeta eta of iota nu xi tau ") * 3).trim
    Seq((1L, goodBody, true), (2L, badBody, false),
      (3L, goodBody + " indeed.", true), (4L, badBody + " more.", false))
      .toDF("doc_id", "text", "label")
      .write.parquet(s"$dir/docs")
    Jobs.runTrainClassifier(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/weights.txt",
      "--label-col", "label")))
    val w = Jobs.loadClassifierWeights(spark, s"$dir/weights.txt")
    assert(w.length === 17)
    // shortest-repr round trip is exact: training again from the
    // loaded artifact's dims scores identically
    val scores = graft.operators.Classifier.scoreDocs(
        spark.read.parquet(s"$dir/docs"), "doc_id", "text", w)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(scores(1L) > 0.5 && scores(2L) < 0.5)
    // curate --classifier keeps only the docs the learned filter likes
    Jobs.runCurate(spark, Jobs.parseArgs(Seq(
      "--input-path", s"$dir/docs", "--output-path", s"$dir/kept",
      "--classifier", s"$dir/weights.txt")))
    val kept = spark.read.parquet(s"$dir/kept")
      .collect().map(_.getLong(0)).sorted
    assert(kept.toSeq === Seq(1L, 3L))
  }

  test("catalog T/X/Y-name indirection normalizes staged coordinates") {
    import graft.etl.GridmetPipeline
    val g = Seq((Timestamp.valueOf("2021-01-01 00:00:00"), 40.0, -100.0, 1.0))
      .toDF("day", "latitude", "longitude", "pr")
    val cat = Seq(("gridmet", "day", "longitude", "latitude"),
        ("other", "t", "x", "y"))
      .toDF("id", "T_name", "X_name", "Y_name")
    val out = GridmetPipeline.normalizeCoordsFromCatalog(g, cat, "gridmet")
    assert(out.columns.toSet == Set("time", "lat", "lon", "pr"))
    // already-canonical names pass through untouched
    val same = GridmetPipeline.normalizeCoords(out, "time", "lon", "lat")
    assert(same.columns.toSet == out.columns.toSet)
  }

  test("stage-netcdf: gridded .nc → staged parquet → gridmet → contract (full lifecycle)") {
    import graft.sinks.NetcdfClassic
    import graft.sinks.NetcdfClassic._
    val dir = Files.createTempDirectory("graft-stage").toString
    // a gridMET-shaped 3-D file: dims (day, lat, lon) + 1-D coords,
    // tmmx/tmmn/... data vars, one fill-value hole
    val (nT, nY, nX) = (2, 2, 3)
    val fill = graft.model.Model.FillValue
    def cube(f: (Int, Int, Int) => Double): Array[Double] =
      (for { t <- 0 until nT; j <- 0 until nY; i <- 0 until nX }
        yield f(t, j, i)).toArray
    val ncPath = s"$dir/gridmet_day.nc"
    NetcdfClassic.write(ncPath, Nc(
      dims = Seq(Dim("day", nT), Dim("lat", nY), Dim("lon", nX)),
      gatts = Seq(Att("Conventions", AttText("CF-1.8"))),
      vars = Seq(
        Var("day", Seq(0), Seq(Att("units", AttText("days since 1900-01-01 00:00:00"))),
          LongData(Array(44195L, 44196L))), // 2021-01-01, 2021-01-02
        Var("lat", Seq(1), Nil, DoubleData(Array(40.0, 41.0))),
        Var("lon", Seq(2), Nil, DoubleData(Array(-100.0, -99.9, -99.8))),
        Var("tmmx", Seq(0, 1, 2),
          Seq(Att("_FillValue", AttVal(fill))),
          DoubleData(cube((t, j, i) =>
            if (t == 0 && j == 0 && i == 2) fill else 285.0 + t + j + i))),
        Var("pr", Seq(0, 1, 2), Nil, DoubleData(cube((t, j, i) => t + 0.5))))))
    // stage it
    val staged = Jobs.runStageNetcdf(spark, Jobs.parseArgs(Seq(
      "--nc-file", ncPath, "--output-path", s"$dir/staged")))
    val grid = spark.read.parquet(staged)
    assert(grid.columns.toSet ==
      Set("time", "j", "i", "lat", "lon", "tmmx", "pr"))
    assert(grid.count() == nT * nY * nX)
    assert(grid.filter($"tmmx".isNull).count() == 1) // the fill hole
    assert(grid.filter($"j" === 1 && $"i" === 1)
      .select($"lat", $"lon").distinct()
      .as[(Double, Double)].head() == ((41.0, -99.9)))
    // and the staged grid drives the pipeline end-to-end
    val weights = Seq((1L, 0, 0, 0.5), (1L, 1, 0, 0.5))
      .toDF("fid", "i", "j", "wght")
    val features = Seq((1L, 40.0, -99.95, -101.0, 39.0, -99.0, 42.0))
      .toDF("fid", "lat", "lon", "minx", "miny", "maxx", "maxy")
    val out = graft.etl.GridmetPipeline.gridmet(
      grid, weights, features,
      vars = Seq("tmmx", "pr"), start = "2021-01-01", end = "2021-01-02")
    // day 0: cells (i=0,j=0)=285, (i=1,j=0)=286 → weighted mean 285.5 K
    val tmax = out.filter($"time" === Timestamp.valueOf("2021-01-01 00:00:00"))
      .select($"tmax").as[Double].head()
    assert(approx(tmax, 285.5 - 273.15))
  }

  test("cfsv2-etl method 2: ens-partitioned ensemble output") {
    val dir = Files.createTempDirectory("graft-job2").toString
    val t1 = Timestamp.valueOf("2021-02-01 00:00:00")
    (for { e <- 0 to 1; i <- 0 to 1 } yield
      (t1, e, 0, i, 40.0, -100.0 + i, 285.0 + e, 275.0 + e, 1.0, 0.008))
      .toDF("time", "ens", "j", "i", "lat", "lon", "tmmx", "tmmn", "pr", "sph")
      .write.parquet(s"$dir/grid")
    Seq((1L, 40.0, -99.5, -101.0, 39.0, -99.0, 41.0))
      .toDF("nhru_v1_1", "lat", "lon", "minx", "miny", "maxx", "maxy")
      .write.parquet(s"$dir/feats")
    Files.writeString(java.nio.file.Paths.get(dir, "w.csv"),
      "nhru_v1_1,i,j,wght\n1,0,0,1.0\n")
    Files.writeString(java.nio.file.Paths.get(dir, "params"),
      "hru_elev\nx\nnhru\n1\n2\n150.0\n####\n")

    val a = Jobs.parseArgs(Seq(
      "--grid-path", s"$dir/grid", "--target-file", s"$dir/feats",
      "--weights-file", s"$dir/w.csv", "--fid", "nhru_v1_1",
      "--model-param-file", s"$dir/params",
      "--method", "2", "--output-path", s"$dir/out"))
    val path = Jobs.runCfsv2(spark, a)
    assert(path.endsWith("2021-02-01_converted"))
    val out = spark.read.parquet(path)
    assert(out.select("ens").distinct().count() == 2)
    assert(out.columns.contains("humidity"))
    // partitionBy("ens") produced the ensemble directory layout (K4)
    assert(new java.io.File(path).listFiles().exists(_.getName.startsWith("ens=")))
  }

  test("daily-etl job: gated incremental cycles over a day-file drop-box (the Gridmet_current loop)") {
    import graft.operators.WeightedMean
    val dir = Files.createTempDirectory("graft-daily-job").toString
    def plane(d: Int) = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("i", "j")
      .select(lit(f"2021-07-$d%02d").cast("date").as("time"), $"i", $"j",
        (lit(d * 10.0) + $"i" * 2 + $"j").as("pr"))
    (1 to 3).foreach { d =>
      plane(d).coalesce(1).write.parquet(s"$dir/drop/part=$d")
      new java.io.File(s"$dir/drop/part=$d").listFiles()
        .filter(_.getName.endsWith(".parquet"))
        .foreach(_.setLastModified(1700000000000L + d * 60000L))
    }
    val w = Seq((7L, 0, 0, 0.5), (7L, 0, 1, 0.5), (8L, 1, 0, 1.0))
      .toDF("fid", "i", "j", "wght")
    // weights CSV in the Sources.weightsCsv shape (fidCol,i,j,wght)
    val wcsv = s"$dir/w.csv"
    val lines = "nhru_v1_1,i,j,wght" +: w.collect().map(r =>
      s"${r.getLong(0)},${r.getInt(1)},${r.getInt(2)},${r.getDouble(3)}")
    java.nio.file.Files.write(java.nio.file.Paths.get(wcsv),
      lines.mkString("\n").getBytes)
    def run(publishedThrough: Option[String]): Either[Throwable, String] = {
      val args = Seq("--grid-stream-path", s"$dir/drop",
        "--weights-file", wcsv, "--fid", "nhru_v1_1",
        "--output-path", s"$dir/out", "--checkpoint-path", s"$dir/ckpt") ++
        publishedThrough.toSeq.flatMap(p => Seq("--published-through", p))
      try Right(Jobs.runDailyEtl(spark, Jobs.parseArgs(args)))
      catch { case e: org.apache.spark.sql.streaming.StreamingQueryException =>
        Left(e) }
    }
    // cycle 1: upstream published through day 2 — day 3 aborts the run
    val r1 = run(Some("2021-07-02"))
    assert(r1.isLeft && r1.swap.toOption.get.toString.contains("availability gate"))
    val mid = spark.read.parquet(s"$dir/out")
    assert(mid.select(date_format($"time", "yyyy-MM-dd")).distinct()
      .as[String].collect().sorted.toSeq === Seq("2021-07-01", "2021-07-02"))
    // cycle 2 (next cron tick, upstream caught up): resumes at day 3
    assert(run(Some("2021-07-03")).isRight)
    // the drop-box's part=N directories are Hive-partition bookkeeping:
    // variable auto-inference must NOT turn them into a spurious
    // weighted-mean column (round-12 advice — the contract table's
    // columns are exactly coords + real grid variables)
    assert(spark.read.parquet(s"$dir/out").columns.sorted.toSeq ===
      Seq("__day", "fid", "pr", "time"))
    val all = spark.read.parquet(s"$dir/out").drop("__day")
      .select($"fid", $"time", $"pr")
    val batch = WeightedMean(spark.read.parquet(s"$dir/drop"),
      w, Seq("pr")).select($"fid", $"time", $"pr")
    assert(rows(all) == rows(batch))
    assert(all.count() === 6L) // 2 features × 3 days, no day re-appended
  }

  test("--weight-join parses every strategy and rejects junk") {
    import graft.operators.WeightJoin
    assert(Jobs.parseWeightJoin("auto") === WeightJoin.Auto)
    assert(Jobs.parseWeightJoin("broadcast") === WeightJoin.Broadcast)
    assert(Jobs.parseWeightJoin("sort-merge") === WeightJoin.SortMerge)
    assert(Jobs.parseWeightJoin("tiled:64x24") === WeightJoin.SortMergeTiled(64, 24))
    intercept[RuntimeException](Jobs.parseWeightJoin("tiled:64"))
    intercept[RuntimeException](Jobs.parseWeightJoin("hash"))
  }

  test("daily-etl with --weight-join tiled:WxH sets the deployment confs (via WeightedMean, the one place)") {
    val dir = Files.createTempDirectory("graft-daily-tiled").toString
    val plane = Seq((0, 0), (0, 1), (1, 0), (1, 1)).toDF("i", "j")
      .select(lit("2021-08-01").cast("date").as("time"), $"i", $"j",
        (lit(5.0) + $"i" * 2 + $"j").as("pr"))
    plane.coalesce(1).write.parquet(s"$dir/drop")
    val wcsv = s"$dir/w.csv"
    java.nio.file.Files.write(java.nio.file.Paths.get(wcsv),
      "nhru_v1_1,i,j,wght\n7,0,0,0.5\n7,0,1,0.5\n8,1,0,1.0".getBytes)
    val keys = Seq("spark.sql.requireAllClusterKeysForCoPartition",
      "spark.sql.legacy.bucketedTableScan.outputOrdering")
    val prev = keys.map(k => k -> spark.conf.getOption(k))
    try {
      keys.foreach(spark.conf.unset)
      Jobs.runDailyEtl(spark, Jobs.parseArgs(Seq(
        "--grid-stream-path", s"$dir/drop", "--weights-file", wcsv,
        "--fid", "nhru_v1_1", "--output-path", s"$dir/out",
        "--checkpoint-path", s"$dir/ckpt", "--weight-join", "tiled:2x2")))
      // the tiled strategy engaged ⇒ WeightedMean set both confs on the
      // session — the CLI operator needs no extra conf juggling (the
      // cluster-wide equivalent is documented in SCALE.md)
      assert(spark.conf
        .get("spark.sql.requireAllClusterKeysForCoPartition") === "false")
      assert(spark.conf
        .get("spark.sql.legacy.bucketedTableScan.outputOrdering") === "true")
      // and the cadence's output is the strategy-independent aggregate
      val out = spark.read.parquet(s"$dir/out").drop("__day")
        .select($"fid", $"pr").as[(Long, Double)].collect().toSet
      assert(out === Set((7L, 5.5), (8L, 7.0)))
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("availability gate: stale variable blocks the run") {
    // 2021-06-02 01:00 UTC = 2021-06-01 18:00 UTC-7 → yesterday = 05-31
    val now = ZonedDateTime.of(2021, 6, 2, 1, 0, 0, 0, ZoneOffset.UTC)
    assert(AvailabilityGate.yesterday(now) == LocalDate.parse("2021-05-31"))
    val fresh = Map("tmmx" -> "2021-05-31", "pr" -> "2021-06-01")
      .withDefaultValue("2021-05-31")
    assert(AvailabilityGate.isCurrent(now)(v => LocalDate.parse(fresh(v))))
    val stale = fresh.updated("vs", "2021-05-30")
    assert(!AvailabilityGate.isCurrent(now)(v => LocalDate.parse(stale(v))))
  }
}
