package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline surface.
  *
  * Scale design: exact dedup is a single hash aggregation on the text
  * (or a cheap fingerprint of it); near-dup dedup avoids the O(n²)
  * all-pairs comparison via MinHash+LSH — the only shuffles are
  * (a) the explode+groupBy on band keys, whose cardinality is
  * n·bands, and (b) the candidate-pair join, whose size is the number
  * of colliding pairs (≪ n²). Exact-Jaccard verification then runs
  * only on candidates. At 100 TB the signature computation is
  * embarrassingly parallel per document, and the band shuffle is the
  * one data movement — keyed well (band, bkey) so skew only occurs if
  * many docs are near-identical, which is exactly when you want them
  * co-located.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text; returns
    * (keep_id, n_copies). Groups on (xxhash64(text), length(text)) so
    * the exchange carries ~12 bytes per row instead of the document
    * bytes — at 100 TB the shuffle is the whole cost of this operator.
    * A 64-bit-hash+length collision that merges two distinct documents
    * needs ~2^32 same-length docs (birthday bound); the oracle groups
    * on raw text, so any collision surfaces as a q13 mismatch. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(xxhash64(col(textCol)), length(col(textCol)))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** INCREMENTAL exact dedup — the daily-ingestion form: admit from
    * `incoming` only documents whose text exists neither in the
    * already-accepted `corpus` nor earlier (smaller id) in the batch
    * itself. Same (xxhash64, length) content key as [[exact]], so the
    * corpus side shuffles ~12 bytes per row, NOT document bytes —
    * against a 100 TB accepted corpus the anti-join carries two long
    * columns, and at steady state the fingerprint table is the thing
    * a deployment persists and appends to, making each increment's
    * cost proportional to the increment, not the corpus. In-batch
    * survivors are elected with the same min-id rule as [[exact]].
    * Collisions: as with [[exact]], a 64-bit+length collision needs
    * ~2^32 same-length docs; the oracle compares raw text, so any
    * collision surfaces as a hash mismatch.
    * @return the admitted rows of `incoming` (all its columns). */
  def incrementalExact(
      corpus: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String): DataFrame =
    incrementalExactFp(fingerprints(corpus, textCol), incoming, idCol, textCol)

  /** The (h, l) content-fingerprint table of a document set — the
    * 16-byte-per-document artifact an incremental-dedup deployment
    * PERSISTS between ingestion batches (the [[incrementalExact]]
    * corpus side reduced to exactly what admission needs: at 100 TB
    * the accepted corpus is re-read never, its fingerprint table
    * always). */
  def fingerprints(docs: DataFrame, textCol: String): DataFrame =
    docs.select(xxhash64(col(textCol)).as("__h"),
      length(col(textCol)).as("__l"))

  /** [[incrementalExact]] against an already-computed fingerprint
    * table (columns (__h, __l) as produced by [[fingerprints]]) —
    * the steady-state admission path where the corpus side is the
    * persisted artifact, not the documents. */
  def incrementalExactFp(
      seenFp: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String): DataFrame = {
    val key = Seq(xxhash64(col(textCol)).as("__h"),
      length(col(textCol)).as("__l"))
    val firstInBatch = incoming.select((col(idCol) +: key): _*)
      .groupBy(col("__h"), col("__l"))
      .agg(min(col(idCol)).as(idCol))
    incoming.join(
      firstInBatch
        .join(seenFp.select(col("__h"), col("__l")), Seq("__h", "__l"),
          "left_anti")
        .select(col(idCol)),
      Seq(idCol), "left_semi")
  }

  /** The FULL incremental-dedup lifecycle step: admit `incoming`
    * against the fingerprint table persisted at `statePath` (parquet;
    * absent = empty corpus, the bootstrap case), then APPEND the
    * admitted batch's fingerprints so the next increment admits
    * against the grown table. Each step's cost is proportional to the
    * increment plus a ~16-byte-per-accepted-document scan — the
    * accepted documents themselves are never re-read. Admission,
    * output persistence and state append are separate actions, not one
    * transaction, so the ORDER is the crash-safety contract:
    * `persistAdmitted` (the caller's output write) runs BEFORE the
    * fingerprint append. A crash between the two leaves output written
    * but state un-grown — re-running re-admits the same batch
    * identically (admission is deterministic given state + batch) and
    * re-persists it, an at-least-once duplicate the caller's sink can
    * absorb. The reverse order would be unrecoverable: state grown but
    * output never written means a re-run anti-joins against the
    * already-appended fingerprints and silently admits nothing,
    * permanently dropping the batch.
    * @param persistAdmitted the caller's durable write of the admitted
    *        rows; invoked on the checkpointed batch before the state
    *        append (default: no-op, for callers that only consume the
    *        returned frame and accept the weaker contract).
    * @return the admitted rows (materialized BEFORE the state append
    *         so the returned plan does not re-read state it just
    *         modified). */
  def admitIncrement(
      statePath: String, incoming: DataFrame,
      idCol: String, textCol: String,
      persistAdmitted: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = incoming.sparkSession
    // Hadoop FS, not java.io.File: the fingerprint table lives wherever
    // the corpus does (HDFS/S3 on a real cluster), and a local-only
    // existence probe would silently report "bootstrap" there and
    // readmit the whole corpus.
    val hPath = new org.apache.hadoop.fs.Path(statePath)
    val stateExists = hPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(hPath)
    val seen =
      if (stateExists) spark.read.parquet(statePath)
      else spark.emptyDataset(org.apache.spark.sql.Encoders.product[(Long, Int)])
        .toDF("__h", "__l")
    val admitted = incrementalExactFp(seen, incoming, idCol, textCol)
      .localCheckpoint()
    persistAdmitted(admitted)
    // (no post-append crash-rerun guard needed HERE, unlike
    // admitIncrementNear: a re-run's batch fingerprints all match the
    // already-appended state, so it admits nothing and appends
    // nothing — exact admission is naturally idempotent)
    fingerprints(admitted, textCol)
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(statePath)
    admitted
  }

  /** [[admitIncrement]]'s NEAR-dup lifecycle sibling (the q144
    * operator as a durable job): the persisted state is the
    * [[nearSignatures]] artifact — the corpus is never re-shingled —
    * and each cycle admits the batch through [[incrementalNearFp]]
    * (rejected on a verified Jaccard ≥ `threshold` pair against any
    * accepted doc or a lower-id batch doc), persists the survivors
    * FIRST, then appends their signatures: a crash between the two
    * re-runs cleanly (Overwrite), whereas the reverse order could
    * permanently drop a batch. Missing state = bootstrap (the batch
    * still self-elects). @return the admitted incoming rows. */
  def admitIncrementNear(
      statePath: String, incoming: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 100000,
      persistAdmitted: DataFrame => Unit = _ => ()): DataFrame = {
    val spark = incoming.sparkSession
    val hPath = new org.apache.hadoop.fs.Path(statePath)
    val stateExists = hPath
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
      .exists(hPath)
    val seen =
      if (stateExists) spark.read.parquet(statePath)
      else nearSignatures(incoming.limit(0), idCol, textCol, n, k)
    val admitted = incrementalNearFp(seen, incoming, idCol, textCol,
        n, k, bands, threshold, maxBucketSize)
      .localCheckpoint()
    persistAdmitted(admitted)
    // anti-join against the ids already in state: a re-run after a
    // crash that happened post-append would otherwise append the same
    // batch signatures AGAIN — results stay correct (the a<b guard),
    // but state accumulates duplicate (id, h64, sig) rows that inflate
    // candidate generation and the hot-bucket tripwire counts on every
    // later cycle. `seen` is the pre-append read, exactly the id set
    // to exclude.
    nearSignatures(admitted, idCol, textCol, n, k)
      .join(seen.select(col("id")), Seq("id"), "left_anti")
      .write.mode(org.apache.spark.sql.SaveMode.Append).parquet(statePath)
    admitted
  }

  /** The near-dup SIGNATURE artifact of a document set — (id, h64,
    * sig): 64-bit shingle identities (exact-Jaccard verification
    * side) + the k-slot minhash signature (LSH candidate side). This
    * is what an incremental NEAR-dedup deployment persists between
    * batches, the [[fingerprints]] analogue: ~(k + |shingles|)·8 B
    * per accepted document, read instead of ever re-shingling the
    * accepted corpus. Shingle-less documents (< n words) carry no
    * signature and are absent. */
  def nearSignatures(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64): DataFrame = {
    import graft.functions.TextKernels.ngram_portable_hashes
    import graft.functions.NgramHashes.ngram_hashes
    docs.select(
        col(idCol).as("id"),
        ngram_portable_hashes(col(textCol), n).as("hashes"),
        ngram_hashes(col(textCol), n).as("h64"))
      .filter(size(col("hashes")) > 0)
      .select(col("id"), col("h64"),
        minhashSignature(col("hashes"), k).as("sig"))
  }

  /** INCREMENTAL near-dup admission — [[incrementalExact]] lifted to
    * NEAR duplicates (the crawl-refresh gate: a re-rendered page is
    * not byte-identical, so exact admission re-admits it forever): a
    * batch document is REJECTED when an LSH candidate pair
    * (band-signature collision) verifies at exact Jaccard ≥
    * `threshold` against (a) ANY accepted-corpus document or (b) a
    * LOWER-id document of the same batch — the one-pass greedy
    * election ([[minhashLsh]]'s a<b normal form; like all greedy
    * near-dup elections it is order-deterministic, not transitive).
    * Ids must be unique across corpus ∪ batch (incremental ingestion
    * assigns monotone ids). Shingle-less docs (< n words) admit
    * unconditionally, the [[incrementalExact]] length-0 analogue.
    *
    * Scale shape: the corpus side is the persisted [[nearSignatures]]
    * artifact — never re-shingled; the band explode covers corpus AND
    * batch (n·bands narrow rows), but corpus-corpus pairs are pruned
    * IN the bucket-join condition, so candidate volume is ∝ batch
    * collisions, not corpus². Verification joins fetch h64 sets for
    * candidate ids only. The [[minhashLsh]] hot-bucket tripwire
    * applies unchanged (exact-dedup upstream keeps buckets small).
    * @return the admitted rows of `incoming` (all its columns). */
  def incrementalNearFp(
      corpusSig: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 100000): DataFrame = {
    val r = k / bands
    require(bands * r == k, "k must be divisible by bands")
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val batchSig = nearSignatures(incoming, idCol, textCol, n, k)
    // side 0 = accepted corpus, side 1 = batch; one banded self-join
    // with corpus-corpus pairs pruned in the condition.
    val sig = corpusSig.select(col("id"), col("h64"), col("sig"),
        lit(0).as("side"))
      .unionByName(batchSig.select(col("id"), col("h64"), col("sig"),
        lit(1).as("side")))
      .repartition(col("id"))
    val banded = sig.select(col("id"), col("side"),
        explode(bandKeys(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("side"),
        col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val stats = banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L)).as("__mxb"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id") &&
          (col("a.side") === 1 || col("b.side") === 1))
      .select(col("a.id").as("a_id"), col("a.side").as("a_side"),
        col("b.id").as("b_id"), col("b.side").as("b_side"))
      .distinct()
      .crossJoin(broadcast(stats))
      .where(assert_true(col("__mxb") <= lit(maxBucketSize.toLong),
        lit(s"incrementalNearFp: a band bucket exceeds maxBucketSize=" +
          s"$maxBucketSize signatures. Run exact dedup upstream " +
          "(Dedup.exact / incrementalExact) to collapse identical " +
          "texts, or raise maxBucketSize")).isNull)
      .drop("__mxb")
    val hs = sig.select(col("id"), col("h64"), size(col("h64")).as("m"))
    val inter = sorted_intersect_count(col("hs_a"), col("hs_b"))
    val jac = round(inter.cast("double") /
      (col("n_a") + col("n_b") - inter).cast("double"), 6)
    val verified = candidates
      .join(hs.select(col("id").as("a_id"), col("h64").as("hs_a"),
        col("m").as("n_a")), "a_id")
      .join(hs.select(col("id").as("__bk"), col("h64").as("hs_b"),
        col("m").as("n_b")),
        col("b_id") === col("__bk") && jac >= lit(threshold))
      .select(col("a_id"), col("a_side"), col("b_id"), col("b_side"))
    val rejected = verified.select(
        when(col("a_side") === 1 && col("b_side") === 0, col("a_id"))
          .otherwise(col("b_id")).as("__rid"))
      .distinct()
    incoming.join(rejected,
      col(idCol) === col("__rid"), "left_anti")
  }

  /** [[incrementalNearFp]] with the corpus side given as documents —
    * the bootstrap / ad-hoc form; steady state persists
    * [[nearSignatures]] and calls the Fp variant. */
  def incrementalNear(
      corpus: DataFrame, incoming: DataFrame,
      idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 100000): DataFrame =
    incrementalNearFp(nearSignatures(corpus, idCol, textCol, n, k),
      incoming, idCol, textCol, n, k, bands, threshold, maxBucketSize)

  /** PAIR-SET EVALUATION — precision/recall of one near-dup detector
    * against another treated as ground truth (the calibration loop for
    * choosing simhash distance bounds, LSH band counts, or jaccard
    * thresholds before a full-corpus run): both inputs are (a_id,
    * b_id, …) pair tables with a_id < b_id (every pair emitter here
    * produces that normal form). Counts are scalar aggregates and the
    * overlap is one equi-join on the pair key — shuffle-light at any
    * pair-set size; the result is a single row, so the operator
    * composes as a lazy broadcast scalar. Empty truth/prediction sets
    * yield NULL recall/precision (0/0 is undefined, not 0 or 1).
    * @return one row (n_truth, n_pred, n_hit, precision, recall). */
  def pairMetrics(truth: DataFrame, predicted: DataFrame): DataFrame = {
    import graft.functions.TextFunctions.round6
    // persist-with-lineage (the reindex pattern): each input is
    // referenced TWICE below (its count + the overlap join), and the
    // inputs are whole detector pipelines — without materialization
    // each detector would run twice wherever AQE exchange reuse
    // doesn't already dedupe its subplan. Pair lists are tiny
    // (pair-key columns only) next to the pipelines that produce
    // them; the ContextCleaner unpersists when unreferenced.
    val t = truth.select(col("a_id"), col("b_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val p = predicted.select(col("a_id"), col("b_id"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nT = t.agg(count(lit(1)).as("n_truth"))
    val nP = p.agg(count(lit(1)).as("n_pred"))
    val nH = t.join(p, Seq("a_id", "b_id"))
      .agg(count(lit(1)).as("n_hit"))
    nT.crossJoin(nP).crossJoin(nH)
      .select(col("n_truth"), col("n_pred"), col("n_hit"),
        when(col("n_pred") === 0, lit(null).cast("double"))
          .otherwise(round6(col("n_hit").cast("double") /
            col("n_pred").cast("double"))).as("precision"),
        when(col("n_truth") === 0, lit(null).cast("double"))
          .otherwise(round6(col("n_hit").cast("double") /
            col("n_truth").cast("double"))).as("recall"))
  }

  /** MinHash+LSH near-duplicate pairs, verified by exact Jaccard on
    * word n-gram shingles.
    *
    * Skew tripwire: a band bucket of `s` identical signatures yields
    * s·(s−1)/2 candidate pairs, and because the OUTPUT contract is the
    * pair list itself (near-identical docs genuinely produce quadratic
    * pairs), no rewrite can bound it — so the operator carries an
    * ENFORCED `maxBucketSize` guard (default 100k ≈ 5e9 pairs from one
    * bucket): the returned plan fails fast (lazy broadcast-scalar
    * assert, zero construction jobs) when any band bucket exceeds it,
    * naming the fix (exact-dedup upstream — [[exact]] collapses
    * identical texts — or accept the cost by raising the bound).
    * Pipelines that exact-dedup first, as every curation recipe does,
    * never approach the bound.
    *
    * @param n        shingle width (words)
    * @param k        minhash functions (= bands·rowsPerBand)
    * @param bands    LSH bands; P(detect | J) = 1-(1-J^r)^bands
    * @param threshold exact-Jaccard acceptance threshold
    * @param maxBucketSize fail-fast bound on a single band bucket
    * @return (a_id, b_id, jaccard) with a_id < b_id, jaccard rounded 6dp
    */
  def minhashLsh(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8, maxBucketSize: Int = 100000): DataFrame = {
    val r = k / bands
    require(bands * r == k, "k must be divisible by bands")
    require(maxBucketSize >= 1, "maxBucketSize must be >= 1")

    // sorted distinct portable_hash shingle sets in ONE codegen pass
    // (TextKernels) — same VALUE SET the string pipeline fed the
    // signature (minhash takes a min per slot, so sorting and collision
    // dedup are value-neutral for the signature). The ~30-bit portable
    // hash is NOT collision-safe for set cardinalities though, so the
    // verification stage below uses the 64-bit NgramHashes identities.
    import graft.functions.TextKernels.ngram_portable_hashes
    import graft.functions.NgramHashes.ngram_hashes
    // repartition AFTER the kernel projections (the ngramJaccardPairs
    // pattern): the plan references this projection FOUR times — the
    // banded self-join legs, the bucket-stats aggregate, and the two
    // verification legs — and without an exchange boundary each
    // reference re-runs the scan + shingle/minhash kernels (the CPU of
    // this operator). ReuseExchange feeds all four from ONE evaluation;
    // the id partitioning also pre-satisfies the verification joins'
    // a_id/b_id clustering. The signature is computed BELOW the
    // exchange and the intermediate portable hashes are dropped from
    // it, so the exchanged row is (id, h64, sig) — each kernel runs
    // exactly once and only downstream-needed columns cross the wire.
    // Measured on the 250k-doc stress corpus: 26.8 → 11.7 s.
    val sh = docs.select(
      col(idCol).as("id"),
      ngram_portable_hashes(col(textCol), n).as("hashes"),
      ngram_hashes(col(textCol), n).as("h64"))
      .filter(size(col("hashes")) > 0)
      .select(col("id"), col("h64"),
        minhashSignature(col("hashes"), k).as("sig"))
      .repartition(col("id"))
    val sig = sh

    // explode band keys → bucket join
    val banded = sig.select(col("id"),
      explode(bandKeys(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    // hot-bucket tripwire: 1-row broadcast scalar asserted in the plan
    // (lazy, same pattern as cmsHeavyHitters / semDedup guards)
    val stats = banded.groupBy(col("band"), col("bkey"))
      .agg(count(lit(1)).as("n"))
      .agg(coalesce(max(col("n")), lit(0L)).as("__mxb"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()
      .crossJoin(broadcast(stats))
      .where(assert_true(col("__mxb") <= lit(maxBucketSize.toLong),
        lit(s"minhashLsh: a band bucket exceeds maxBucketSize=" +
          s"$maxBucketSize signatures — the candidate join would emit " +
          "~bucket² pairs. Run exact dedup upstream (Dedup.exact) to " +
          "collapse identical texts, or raise maxBucketSize if the " +
          "quadratic output is truly intended")).isNull)
      .drop("__mxb")

    // exact verification on the candidate set only: two-pointer merge
    // over the sorted 64-BIT hash sets (|A∪B| = |A|+|B|−|A∩B|) —
    // hash-equality ≡ string-equality at ~2^-64 per pair, whereas the
    // mod-1e9+7 signature base collides at birthday rates for large
    // shingle sets and would skew the jaccard against the string oracle
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val shA = sh.select(col("id").as("a_id"), col("h64").as("hs_a"),
      size(col("h64")).as("n_a"))
    val shB = sh.select(col("id").as("__b_key"), col("h64").as("hs_b"),
      size(col("h64")).as("n_b"))
    // the (unchanged) jaccard acceptance predicate rides IN the second
    // attach join's condition: a candidate that fails the exact verify
    // is rejected during the probe and never materializes a row
    // carrying both shingle arrays (the bitmapPairsFromShingles
    // relocation, same rationale)
    val inter = sorted_intersect_count(col("hs_a"), col("hs_b"))
    val jac = round(inter.cast("double") /
      (col("n_a") + col("n_b") - inter).cast("double"), 6)
    candidates
      .join(shA, "a_id")
      .join(shB, col("b_id") === col("__b_key") && jac >= threshold)
      .drop("__b_key")
      .withColumn("inter", inter)
      .withColumn("jaccard", jac)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs, ALL-PAIRS form: O(n²) nested-loop
    * theta join. Small-n verifier ONLY — the checked/scale path is
    * [[simhashPairsBlocked]], which produces the identical result set
    * through an equi-join. */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs, idCol, textCol)
    val a = sigs.select(col("id").as("a_id"), col("simhash").as("sh_a"))
    val b = sigs.select(col("id").as("b_id"), col("simhash").as("sh_b"))
    a.join(b, col("a_id") < col("b_id") &&
        hammingDistance(col("sh_a"), col("sh_b")) <= maxHamming)
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")))
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** SimHash near-duplicate pairs via pigeonhole bit-blocking — EXACT
    * (full recall, same result set as [[simhashPairs]]): split the
    * `bits`-wide signature into maxHamming+1 disjoint bit blocks; any
    * pair within Hamming distance maxHamming is bit-identical on at
    * least one block, so equal-(block, key) candidates + a Hamming
    * verify lose nothing. The O(n²) theta join becomes a hash
    * equi-join whose size is the actual collision count.
    *
    * Pruning power is 2^(bits/(maxHamming+1)) buckets per band — real
    * deployments size the signature so blocks are ≥16 bits (e.g.
    * 64-bit simhash, h≤3). At q16's demo config (30 bits, h=8) blocks
    * are 3 bits and the join is candidate-heavy, but the PLAN is the
    * scale plan; widen the signature, not the query, to scale it. */
  def simhashPairsBlocked(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3, bits: Int = 30): DataFrame =
    hammingPairsBlocked(simhashSignatures(docs, idCol, textCol),
      maxHamming, bits)

  /** Pigeonhole-blocked Hamming near-dup pairs over ARBITRARY integer
    * signatures `(id, simhash)` — the blocking core shared by
    * [[simhashPairsBlocked]] (30-bit text simhash) and
    * [[Multimodal.mediaNearDupPairs]] (60-bit perceptual hash): split
    * the signature into maxHamming+1 disjoint bit blocks; any pair
    * within distance maxHamming agrees EXACTLY on ≥1 block
    * (pigeonhole — lossless recall), so candidates come from an
    * equi-join on (block index, block key) and the Hamming verify +
    * first-matching-band dedup ride in the join condition. */
  def hammingPairsBlocked(
      sigs: DataFrame, maxHamming: Int, bits: Int): DataFrame = {
    require(maxHamming >= 0, "maxHamming must be >= 0")
    require(bits >= maxHamming + 1 && bits <= 63,
      "bits must be in [maxHamming+1, 63]")
    val nb = maxHamming + 1
    def blockKey(c: Column, j: Int): Column = {
      val lo = j * bits / nb
      val len = (j + 1) * bits / nb - lo
      shiftright(c, lo).bitwiseAND(lit((1L << len) - 1))
    }
    val banded = sigs.select(col("id"), col("simhash"),
        explode(array((0 until nb).map { j =>
          struct(lit(j).as("band"), blockKey(col("simhash"), j).as("key"))
        }: _*)).as("bk"))
      .select(col("id"), col("simhash"),
        col("bk.band").as("band"), col("bk.key").as("key"))
    // Probe leg spread by the JOIN key at explicit session width (the
    // Par.spreadBy contract): the Hamming verify — the operator's CPU —
    // rides IN the join condition, so it executes in the stage that
    // reads this exchange. Keyed-only, AQE's bytes-only coalescing
    // folded that stage to ONE task at small inputs (q129: 1.9 s of
    // verify CPU single-task over a 286 KB exchange; interleaved A/B
    // this round: q129 2.5-3.1 s → 1.0 s steady). At scale this is the
    // (band, key) posting shuffle the operator's plan already assumes —
    // the one exchange of the whole join — at the deployment's own
    // shuffle width; a doc-id-keyed spread cannot replace it because an
    // upstream same-key exchange satisfies it away (EnsureRequirements
    // elides the narrow exchange; measured plans/r18).
    val a = Par.spreadBy(banded.select(col("band"), col("key"),
      col("id").as("a_id"), col("simhash").as("sh_a")),
      col("band"), col("key"))
    val b = banded.select(col("band").as("band_b"), col("key").as("key_b"),
      col("id").as("b_id"), col("simhash").as("sh_b"))
    // multi-band dedup WITHOUT a distinct shuffle: both signatures ride
    // along each joined row, so "is this the FIRST band where the two
    // signatures agree?" is per-row arithmetic — every qualifying pair
    // is emitted exactly once, and the only exchange in the whole plan
    // is the tiny (band, key) posting shuffle
    val firstMatchingBand = (0 until nb).map { j =>
      val earlier = (0 until j)
        .map(j2 => blockKey(col("sh_a"), j2) === blockKey(col("sh_b"), j2))
        .foldLeft(lit(false))(_ || _)
      col("band") === j && !earlier
    }.reduce(_ || _)
    // band-dedup + Hamming verify ride IN the join condition (same
    // expressions, relocated): a candidate that fails either is
    // rejected during the hash probe and never materializes an
    // output row — with candidate-heavy demo blocks the row copies
    // cost more than the XOR/popcount verify itself
    a.join(b, col("band") === col("band_b") && col("key") === col("key_b") &&
        col("a_id") < col("b_id") && firstMatchingBand &&
        hammingDistance(col("sh_a"), col("sh_b")) <= maxHamming)
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")))
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Per-document 30-bit simhash signatures: (id, simhash). */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), simhash(col(textCol)).as("simhash"))

  /** Exact n-gram-Jaccard near-dup pairs within a blocking key — the
    * all-pairs fallback: |A∩B| via the codegen'd two-pointer merge over
    * sorted shingle arrays. Same values as [[ngramJaccardPairs]].
    * MEASURED at sf0.1: loses to the inverted index 109 s vs 9 s —
    * per-element UTF8String materialization in the merge outweighs the
    * join-row explosion it avoids. Keep only for tiny blocks where
    * block² is small and the shingle shuffle isn't. */
  def ngramJaccardPairsDense(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_sort(shingles(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("blk"), col("id").as("a_id"), col("sh").as("sh_a"),
      size(col("sh")).as("n_a")).repartition(col("a_id"))
    val b = sh.select(col("blk").as("blk_b"), col("id").as("b_id"),
      col("sh").as("sh_b"), size(col("sh")).as("n_b"))
    // acceptance predicate in the join condition (the
    // bitmapPairsFromShingles relocation): a rejected pair never
    // materializes a row carrying both shingle arrays
    val inter = sorted_intersect_count(col("sh_a"), col("sh_b"))
    val jac = round(inter.cast("double") /
      (col("n_a") + col("n_b") - inter).cast("double"), 6)
    a.join(broadcast(b), col("blk") === col("blk_b") &&
        col("a_id") < col("b_id") && jac >= threshold)
      .withColumn("inter", inter)
      .withColumn("jaccard", jac)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact n-gram-Jaccard near-dup pairs within a blocking key (e.g.
    * language), via an inverted index: explode shingles, equi-join on
    * (block, shingle), count matches per pair → |A∩B|, and derive
    * |A∪B| = |A|+|B|−|A∩B|. Identical result set to the all-pairs
    * formulation for threshold > 0 (a positive Jaccard needs ≥1 shared
    * shingle) but the join is keyed on shingles — work scales with
    * actually-overlapping pairs, not block². At 100 TB with a sparse
    * vocabulary this is the default; for DENSE vocabularies use
    * [[ngramJaccardPairsDense]]; when candidate pruning matters more
    * than per-stage overhead, [[ngramJaccardPairsPrefix]]. Hot-shingle
    * skew is guarded in-plan (see hotDf/salts below). */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double,
      hotDf: Int = 4096, salts: Int = 8): DataFrame = {
    // postings keyed by 64-bit shingle hashes computed in ONE codegen
    // pass (graft.functions.NgramHashes) — no per-shingle string
    // materialization, and cheap enough that the three evaluations (two
    // join legs + the hot-key scan) stop mattering. A collision that
    // miscounts one pair's intersection needs two of ITS shingles to
    // collide (~2^-64 · |union|² — below any FP noise floor).
    import graft.functions.NgramHashes.ngram_hashes
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      ngram_hashes(col(textCol), n).as("hs")).filter(size(col("hs")) > 0)
    // repartition AFTER the hash computation: the exchange's child now
    // contains the scan+shingle work, so ReuseExchange evaluates it
    // ONCE and both self-join legs read the same shuffle output (and
    // arrive pre-partitioned on the join keys — no further exchange)
    val inv = sh.select(col("id"), col("blk"), size(col("hs")).as("n_sh"),
        explode(col("hs")).as("h"))
      .repartition(col("blk"), col("h"))
    // HOT-SHINGLE GUARD: a stock phrase with document frequency d makes
    // the join emit d² rows under ONE key — a single pinned reducer at
    // 100 TB. Keys with df > hotDf form a list bounded by
    // |postings|/hotDf, so it is ALWAYS driver-collectable — it rides
    // into the plan as a literal InSet (the bounded-plan-parameter
    // pattern, like IVF's centroids); a DataFrame hot-list would
    // re-execute its aggregation once per join leg. Hot keys get
    // salted: the left leg replicates its postings over `salts`
    // sub-keys, the right leg routes by pmod(id, salts) — every (a,b)
    // co-occurrence appears exactly once, but a hot key's d² work
    // spreads over `salts` reducers. No hot keys (the common case) →
    // the plain two-leg equi-join, zero overhead.
    // detection runs on a deterministic 1-in-8 doc sample (textbook
    // heavy-hitter estimation: a key at the hotDf scale appears in the
    // sample with overwhelming probability; the threshold is halved on
    // top of the expected-value scaling so borderline keys are salted
    // rather than missed — salting a non-hot key costs almost nothing,
    // missing a hot one pins a reducer)
    val sampleMod = 8
    val hotSet = sh
      .filter(pmod(col("id"), lit(sampleMod.toLong)) === 0)
      .select(explode(col("hs")).as("h"))
      .groupBy(col("h")).agg(count(lit(1)).as("df"))
      .filter(col("df") > hotDf / sampleMod / 2).select(col("h"))
      .collect().map(_.getLong(0)).toSeq
    val (a, b, joinCond) =
      if (hotSet.isEmpty) (
        inv.select(col("blk"), col("h"),
          col("id").as("a_id"), col("n_sh").as("n_a")),
        inv.select(col("blk").as("blk_b"), col("h").as("h_b"),
          col("id").as("b_id"), col("n_sh").as("n_b")),
        col("blk") === col("blk_b") && col("h") === col("h_b") &&
          col("a_id") < col("b_id"))
      else {
        // the legs MUST re-shuffle on (blk, h, salt): the inherited
        // (blk, h) partitioning already satisfies the join's clustering
        // requirement (partition keys ⊆ join keys), so without this
        // explicit exchange Spark would happily co-partition on
        // (blk, h) alone and every salt of a hot key would land back in
        // ONE reducer — silently defeating the whole guard
        val isHot = col("h").isInCollection(hotSet)
        (inv.select(col("blk"), col("h"),
            col("id").as("a_id"), col("n_sh").as("n_a"),
            explode(sequence(lit(0),
              when(isHot, salts - 1).otherwise(0))).as("salt"))
            .repartition(col("blk"), col("h"), col("salt")),
          inv.select(col("blk").as("blk_b"), col("h").as("h_b"),
            col("id").as("b_id"), col("n_sh").as("n_b"),
            when(isHot, pmod(col("id"), lit(salts.toLong)))
              .otherwise(lit(0L)).cast("int").as("salt_b"))
            .repartition(col("blk_b"), col("h_b"), col("salt_b")),
          col("blk") === col("blk_b") && col("h") === col("h_b") &&
            col("salt") === col("salt_b") && col("a_id") < col("b_id"))
      }
    a.join(b, joinCond)
      .groupBy(col("a_id"), col("b_id"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact n-gram-Jaccard pairs with PREFIX FILTERING (PPJoin-style) —
    * the skew-hardened scale path, same result set as
    * [[ngramJaccardPairs]].
    *
    * Shingles are globally ordered by (document frequency asc, shingle)
    * within each block; each document indexes only its first
    * |d| − ⌈t·|d|⌉ + 1 shingles in that order. If J(a,b) ≥ t the two
    * prefixes must share a shingle (pigeonhole on the ≥ t/(1+t)·(|a|+|b|)
    * required overlap), so candidate generation is lossless while
    * (a) the join carries only prefix postings, and (b) HOT shingles —
    * stock phrases with huge df, the reducer-pinning skew case — sort
    * to the END of the canonical order and fall OUT of most prefixes,
    * which caps their posting lists structurally instead of by salting.
    * Verification recomputes |A∩B| with the codegen'd two-pointer merge
    * on the candidate set only. */
  def ngramJaccardPairsPrefix(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_sort(shingles(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)
    val inv = sh.select(col("id"), col("blk"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    val df = inv.groupBy(col("blk").as("blk_d"), col("shingle").as("shingle_d"))
      .agg(count(lit(1)).as("df"))
    // canonical (df asc, shingle asc) rank within each document
    val byDoc = Window.partitionBy(col("id"))
      .orderBy(col("df").asc, col("shingle").asc)
    val prefix = inv
      .join(df, col("blk") === col("blk_d") && col("shingle") === col("shingle_d"))
      .withColumn("rn", row_number().over(byDoc))
      // threshold backed off by 1e-6: the output filter compares the
      // 6dp-ROUNDED jaccard, so true J ∈ [t−5e-7, t) can round up to t
      // and must still be generated as a candidate
      .filter(col("rn") <=
        col("n_sh") - ceil(lit(threshold - 1e-6) * col("n_sh")) + 1)
      .select(col("blk"), col("shingle"), col("id"))
    val a = prefix.select(col("blk"), col("shingle"), col("id").as("a_id"))
    val b = prefix.select(col("blk").as("blk_b"),
      col("shingle").as("shingle_b"), col("id").as("b_id"))
    val cand = a.join(b, col("blk") === col("blk_b") &&
        col("shingle") === col("shingle_b") && col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id")).distinct()
    val shA = sh.select(col("id").as("a_id"), col("sh").as("sh_a"),
      size(col("sh")).as("n_a"))
    val shB = sh.select(col("id").as("__b_key"), col("sh").as("sh_b"),
      size(col("sh")).as("n_b"))
    // acceptance predicate in the second attach join's condition (the
    // bitmapPairsFromShingles relocation): a rejected candidate never
    // materializes a row carrying both shingle arrays
    val inter = sorted_intersect_count(col("sh_a"), col("sh_b"))
    val jac = round(inter.cast("double") /
      (col("n_a") + col("n_b") - inter).cast("double"), 6)
    cand.join(shA, "a_id")
      .join(shB, col("b_id") === col("__b_key") && jac >= threshold)
      .withColumn("inter", inter)
      .withColumn("jaccard", jac)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact n-gram-Jaccard pairs via DENSE BITMAPS — the
    * small-vocabulary fast path, same result set as
    * [[ngramJaccardPairs]]. When the shingle vocabulary is
    * driver-collectable (≤ `maxVocab`), every document becomes a V-bit
    * bitmap (vocab rides in the plan as a sorted long[] reference —
    * the bounded-plan-parameter pattern) and each candidate pair costs
    * ~V/64 AND+popcount longs in codegen, with NO postings explode and
    * NO pair hash-aggregation — the two costs that dominate the
    * inverted index. Within-block all-pairs is intended for
    * bounded-size blocks (languages, domains, shards); the inverted
    * index remains the path for unbounded vocabularies/blocks.
    * MEASURED at sf0.1 (931-term vocab, blocks ≤ 2.1k docs): 1.1 s vs
    * 3.6-4.7 s for the inverted index. */
  def ngramJaccardPairsBitmap(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double, maxVocab: Int = 1 << 20): DataFrame = {
    import graft.functions.NgramHashes.ngram_hashes
    // lazy localCheckpoint: the vocab collect below materializes the
    // scan+shingle-hash work ONCE and the join job reads it back —
    // without it the expensive projection would run for the vocab job
    // AND once per join leg (no cross-branch reuse)
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
        ngram_hashes(col(textCol), n).as("hs")).filter(size(col("hs")) > 0)
      .localCheckpoint(eager = false)
    // guard BEFORE materializing the vocabulary on the driver: the
    // bounded collect (limit maxVocab+1) returns the complete distinct
    // set iff it is within bounds — an unbounded-vocabulary corpus
    // fails fast without the driver ever holding more than the limit
    val probe = boundedVocab(sh, maxVocab)
    require(probe.length <= maxVocab,
      s"vocabulary exceeds maxVocab=$maxVocab — " +
        "use ngramJaccardPairs (inverted index) for unbounded vocabularies")
    bitmapPairsFromShingles(sh, probe.sorted, threshold)
  }

  /** One bounded probe job: the complete distinct shingle-hash set iff
    * it has ≤ maxVocab entries, otherwise maxVocab+1 entries (the
    * overflow sentinel the callers branch on). */
  private def boundedVocab(sh: DataFrame, maxVocab: Int): Array[Long] =
    sh.select(explode(col("hs")).as("h")).distinct()
      .limit(maxVocab + 1).collect().map(_.getLong(0))

  /** Dense-bitmap pair kernel over pre-shingled rows and a collected
    * vocabulary (shared tail of [[ngramJaccardPairsBitmap]] and
    * [[ngramJaccardPairsAdaptive]] — the vocabulary is collected ONCE
    * by whichever entry ran the probe).
    *
    * PARALLELISM: a plain (blk == blk) self-join runs each block's
    * quadratic AND/popcount work in the ONE partition owning the
    * block key — with a handful of language blocks that pins the
    * whole kernel to |blocks| cores. The a-leg therefore salts on
    * pmod(id, salts) and the b-leg replicates each row to every salt:
    * each (a, b) pair still meets exactly once (a has ONE salt), but
    * a block's pair grid spreads over `salts` partitions. The
    * replicated leg is |docs|·salts bitmap rows — bounded by the same
    * block-size contract the all-pairs form already carries. */
  private def bitmapPairsFromShingles(
      sh: DataFrame, vocab: Array[Long], threshold: Double,
      salts: Int = 8): DataFrame = {
    import graft.functions.BitmapOps.{bitmap_and_count, bitmap_from_hashes}
    val bm = sh.select(col("id"), col("blk"), size(col("hs")).as("n_sh"),
      bitmap_from_hashes(col("hs"), vocab).as("bits"))
    val a = bm.select(col("blk"), col("id").as("a_id"),
        col("n_sh").as("n_a"), col("bits").as("bits_a"),
        pmod(col("id"), lit(salts.toLong)).cast("int").as("salt"))
      .repartition(col("blk"), col("salt"))
    val b = bm.select(col("blk").as("blk_b"), col("id").as("b_id"),
        col("n_sh").as("n_b"), col("bits").as("bits_b"),
        explode(sequence(lit(0), lit(salts - 1))).as("salt_b"))
      .repartition(col("blk_b"), col("salt_b"))
    // The threshold rides IN the join condition, not a post-join
    // filter — BYTE-IDENTICAL predicate (round-6 jaccard ≥ t, same
    // expression the projection re-derives for survivors), just
    // relocated so a non-qualifying pair is rejected during the hash
    // probe and never materializes a 2-bitmap output row (measured
    // 3.6× on the pair stage at sf0.1; the output-row copies were the
    // cost, not the popcounts). Ahead of it, the PPJoin length bound:
    // J ≤ min/max, so min < (t−ε)·max cannot qualify — the ε=1e-6
    // slack conservatively covers the round-6 acceptance edge
    // (round(J,6) ≥ t admits J ≥ t−5e-7), so the bound only ever
    // skips the popcount for pairs the exact predicate would reject.
    val inter = bitmap_and_count(col("bits_a"), col("bits_b"))
    val jac = round(inter.cast("double") /
      (col("n_a") + col("n_b") - inter).cast("double"), 6)
    a.join(b, col("blk") === col("blk_b") && col("salt") === col("salt_b") &&
        col("a_id") < col("b_id") &&
        least(col("n_a"), col("n_b")).cast("double") >=
          greatest(col("n_a"), col("n_b")).cast("double") * (threshold - 1e-6) &&
        jac >= threshold)
      .withColumn("inter", inter)
      .withColumn("jaccard", jac)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Path-choosing entry for n-gram-Jaccard pairs: the dense-bitmap
    * kernel when the vocabulary is bounded, the inverted index
    * otherwise — same result set either way, so a driver contract
    * pinned to this stays TOTAL as the corpus grows (a bare bitmap
    * call would abort the run where the old path would have degraded
    * gracefully). ONE bounded probe job collects the vocabulary and
    * decides the path — the bitmap path reuses the collected set
    * rather than re-deriving it with a second distinct pass. */
  def ngramJaccardPairsAdaptive(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double, maxVocab: Int = 1 << 20): DataFrame = {
    import graft.functions.NgramHashes.ngram_hashes
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
        ngram_hashes(col(textCol), n).as("hs")).filter(size(col("hs")) > 0)
      .localCheckpoint(eager = false)
    val probe = boundedVocab(sh, maxVocab)
    if (probe.length <= maxVocab)
      bitmapPairsFromShingles(sh, probe.sorted, threshold)
    else
      ngramJaccardPairs(docs, idCol, textCol, blockCol, n, threshold)
  }

  /** EDIT-DISTANCE verification of a candidate pair list: attach both
    * texts and keep pairs with Levenshtein distance ≤ `maxDist` —
    * the character-exact confirmation pass layered on any cheap
    * candidate generator (simhash blocks, minhash buckets). Runs the
    * O(len²) DP only on candidates, never all pairs; the two text
    * joins are keyed on the ids, so the quadratic work is bounded by
    * the generator's output size. Built-in `levenshtein` stays inside
    * whole-stage codegen. */
  def editDistanceVerify(
      docs: DataFrame, idCol: String, textCol: String,
      pairs: DataFrame, maxDist: Int): DataFrame = {
    val ta = docs.select(col(idCol).as("a_id"), col(textCol).as("__ta"))
    val tb = docs.select(col(idCol).as("__b_key"), col(textCol).as("__tb"))
    // the distance bound rides IN the second attach join's condition:
    // a rejected candidate never materializes a row carrying both
    // texts (the bitmapPairsFromShingles relocation, same rationale)
    pairs.select(col("a_id"), col("b_id"))
      .join(ta, "a_id")
      .join(tb, col("b_id") === col("__b_key") &&
        levenshtein(col("__ta"), col("__tb")) <= maxDist)
      .withColumn("dist", levenshtein(col("__ta"), col("__tb")))
      .select(col("a_id"), col("b_id"), col("dist"))
  }

  /** Near-duplicate CLUSTERS: connected components over a pair list
    * (e.g. [[minhashLsh]] output), plus canonical-document election —
    * the step that turns pairwise dedup into an actual training-set
    * dedup policy ("keep one doc per duplicate group"). Returns one
    * row per document: (doc_id, canon_id = min id in its component,
    * cluster_size, is_canonical); documents in no pair are their own
    * singleton cluster.
    *
    * Scale design: hash-min label propagation. State is O(vertices)
    * (only docs that appear in a pair), each round is one
    * edges⋈labels hash join + a min-aggregate — no per-component
    * driver state, no full-graph materialization. Rounds needed =
    * component diameter, which for near-dup clusters is tiny (dup
    * groups are cliques or near-cliques from LSH, diameter ≤ ~2); the
    * O(log n)-round large-star/small-star variant is the drop-in
    * upgrade if components with long chains ever appear. Labels are
    * `localCheckpoint`ed each round so the plan does not grow with
    * iterations, and min-label is order-independent, so the fixpoint
    * is exact and oracle-checkable (recursive-CTE closure).
    *
    * The convergence test costs one count per round on the O(V)
    * label table — the driver reads one scalar, never the data. */
  def duplicateClusters(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 20): DataFrame = {
    // both directions via ONE explode, not a self-union: a union's two
    // branches would each contain the full upstream pair-generation
    // plan (e.g. the entire minhashLsh pipeline) and execute it twice
    // in the materialization job
    val edges = pairs
      .select(explode(array(
        struct(col("a_id").cast("long").as("src"), col("b_id").cast("long").as("dst")),
        struct(col("b_id").cast("long").as("src"), col("a_id").cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // try/finally: a non-convergence require (or any job failure inside
    // the loop) must not leak the session-lifetime cached edge set
    val labels = try {
      // seed with min(self, neighbors) rather than self: costs the same
      // one shuffle a distinct() would (every vertex appears as dst —
      // edges are bidirectional), and LSH dup groups — near-cliques —
      // then converge in a single confirming round instead of two
      var labs = edges.groupBy(col("dst")).agg(min(col("src")).as("nmin"))
        .select(col("dst").as("id"), least(col("dst"), col("nmin")).as("lab"))
        .localCheckpoint()
      var changed = 1L
      var it = 0
      while (changed > 0 && it < maxIters) {
        val prop = edges.join(labs, edges("src") === labs("id"))
          .groupBy(col("dst")).agg(min(col("lab")).as("nlab"))
          .withColumnRenamed("dst", "id")
        val merged = labs.join(prop, Seq("id"), "left")
          .select(col("id"), col("lab"),
            least(col("lab"), coalesce(col("nlab"), col("lab"))).as("lab2"))
          .localCheckpoint()
        changed = merged.filter(col("lab2") < col("lab")).count()
        labs = merged.select(col("id"), col("lab2").as("lab"))
        it += 1
      }
      require(changed == 0, s"label propagation did not converge in $maxIters rounds")
      labs
    } finally edges.unpersist(blocking = false)
    clustersOutput(docs, idCol, labels)
  }

  /** (doc_id, canon_id) labels → the cluster output contract. */
  private def clustersOutput(
      docs: DataFrame, idCol: String, labels: DataFrame): DataFrame = {
    val lab = docs.select(col(idCol).cast("long").as("doc_id"))
      .join(labels.withColumnRenamed("id", "doc_id"), Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("lab"), col("doc_id")).as("canon_id"))
    val sizes = lab.groupBy(col("canon_id")).agg(count(lit(1)).as("cluster_size"))
    lab.join(sizes, "canon_id")
      .select(col("doc_id"), col("canon_id"), col("cluster_size"),
        (col("doc_id") === col("canon_id")).as("is_canonical"))
  }

  /** [[duplicateClusters]] via alternating LARGE-STAR / SMALL-STAR
    * (Kiveris et al., "Connected Components in MapReduce and Beyond")
    * — identical output, O(log n) rounds instead of O(diameter), for
    * graphs with long chains (hash-min needs a round per hop; the star
    * operations halve path lengths). Each half-round is two shuffles
    * (a per-node min aggregate + an emission join) over the CURRENT
    * edge multiset; no node ever buffers its neighborhood, so hub
    * vertices cost no more than leaves.
    *
    *  - large-star(u): neighbors v > u re-attach to m = min(Γ(u)∪{u})
    *  - small-star(u): neighbors v < u, and u itself, attach to
    *    m = min of the smaller neighborhood
    *
    * Both preserve connectivity; the fixpoint is a star per component
    * centered at its minimum, read off as the label map. Convergence
    * is an exact edge-set comparison (two exceptAll probes). */
  def duplicateClustersStar(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      maxIters: Int = 30): DataFrame = {
    def sym(df: DataFrame, a: String, b: String): DataFrame = df
      .select(explode(array(
        struct(col(a).cast("long").as("u"), col(b).cast("long").as("v")),
        struct(col(b).cast("long").as("u"), col(a).cast("long").as("v"))))
        .as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .filter(col("u") =!= col("v")).distinct()

    var edges = sym(pairs, "a_id", "b_id").localCheckpoint()
    var stable = edges.isEmpty
    var it = 0
    while (!stable && it < maxIters) {
      // large-star: m over the FULL neighborhood ∪ self
      val mL = edges.groupBy(col("u")).agg(min(col("v")).as("mv"))
        .select(col("u"), least(col("u"), col("mv")).as("m"))
      val ls = sym(edges.filter(col("v") > col("u")).join(mL, "u")
        .select(col("v").as("a_id"), col("m").as("b_id")), "a_id", "b_id")
        .localCheckpoint()
      // small-star: m over the smaller neighborhood ∪ self (mv < u
      // whenever the group exists, so m = mv); u itself re-attaches too
      val mS = ls.filter(col("v") < col("u"))
        .groupBy(col("u")).agg(min(col("v")).as("m")).localCheckpoint()
      val ss = sym(ls.filter(col("v") < col("u")).join(mS, "u")
        .select(col("v").as("a_id"), col("m").as("b_id"))
        .union(mS.select(col("u").as("a_id"), col("m").as("b_id"))),
        "a_id", "b_id")
        .localCheckpoint()
      // both sides are distinct() sets, so equal counts plus one empty
      // one-directional difference imply set equality — no need to pay
      // the second exceptAll shuffle
      stable = ss.count() == edges.count() && ss.exceptAll(edges).isEmpty
      edges = ss
      it += 1
    }
    require(stable, s"star contraction did not converge in $maxIters rounds")
    // at the fixpoint every non-root has exactly one neighbor: its root
    val labels = edges.filter(col("v") < col("u"))
      .groupBy(col("u")).agg(min(col("v")).as("lab"))
      .withColumnRenamed("u", "id")
    clustersOutput(docs, idCol, labels)
  }

  /** SUBSTRING-LEVEL dedup — cross-document REPEATED-SPAN detection
    * (the Lee et al. 2022 "Deduplicating Training Data" operator
    * family, which removes repeated SPANS rather than whole
    * documents): every token `n`-gram occurring in ≥ `minDocs`
    * DISTINCT documents marks its start position; marked positions
    * within a document merge into spans when they are ≤ n tokens
    * apart (overlapping or exactly adjacent repeats coalesce).
    * Returns (doc_id, start_tok, end_tok, marked_grams) with
    * [start_tok, end_tok) a token-offset range and marked_grams the
    * number of marked n-gram starts inside it — the cut list a
    * span-removal pass consumes.
    *
    * Scale shape: the hot-gram detection groups on
    * (xxhash64(gram), length(gram)) — ~12 bytes per n-gram cross the
    * wire, never the gram text (the [[exact]] fingerprint precedent;
    * the oracle groups on the raw gram string, so any 64-bit+length
    * collision surfaces as a q81 hash mismatch). One shuffle keys the
    * position stream by gram fingerprint for the marking semi-join;
    * span assembly is a per-document window over MARKED positions
    * only (repeated-content-sized, not corpus-sized). Deterministic
    * end to end. */
  def repeatedSpans(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int, minDocs: Int = 2): DataFrame = {
    require(n >= 1, "n must be >= 1")
    require(minDocs >= 2, "minDocs must be >= 2 (a cross-document test)")
    // one codegen pass per document: element pos = (64-bit hash, byte
    // length) of the gram at that token position (NgramPosHashes) —
    // replaces the round-9 string pipeline that materialized every
    // gram as a UTF8String through interpreted HOFs before hashing
    // (O(tokens·n·wordLen) allocations; the gram stage dominated the
    // stress run). Fingerprint values changed with the swap (mixed-FNV
    // + byte length vs xxhash64 + char length) but both detector
    // stages key on the SAME fingerprints, so the span output — and
    // the raw-gram-string oracle — are unchanged modulo ~2^-64
    // collisions, exactly as before.
    import graft.functions.NgramPosHashes.ngram_pos_hashes
    val grams = docs
      .select(col(idCol).cast("long").as("doc_id"),
        posexplode(ngram_pos_hashes(col(textCol), n)))
      .select(col("doc_id"), col("pos"),
        col("col.h").as("gh"), col("col.l").as("gl"))
    val hot = grams.select(col("gh"), col("gl"), col("doc_id")).distinct()
      .groupBy(col("gh"), col("gl")).agg(count(lit(1)).as("nd"))
      .filter(col("nd") >= minDocs)
      .select(col("gh"), col("gl"))
    val marked = grams.join(hot, Seq("gh", "gl"), "left_semi")
      .select(col("doc_id"), col("pos"))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    marked
      .withColumn("newspan",
        when(col("pos") - lag(col("pos"), 1).over(w) > n, 1).otherwise(0))
      .withColumn("span", sum(col("newspan"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("doc_id"), col("span"))
      .agg(min(col("pos")).cast("long").as("start_tok"),
        (max(col("pos")) + lit(n)).cast("long").as("end_tok"),
        count(lit(1)).as("marked_grams"))
      .select(col("doc_id"), col("start_tok"), col("end_tok"),
        col("marked_grams"))
  }

  /** Apply a [[repeatedSpans]] cut list: drop every token whose
    * position falls inside any of its document's [start_tok, end_tok)
    * spans and rebuild the text — the REMOVAL half of substring-level
    * dedup (what Lee et al. actually do with the matches). Returns
    * (doc_id, text_cut, removed_tokens); documents without spans pass
    * through verbatim, a fully-covered document becomes "".
    *
    * Scale shape: the span filter is a hash anti-join on doc_id with
    * the range test as a residual predicate (spans per document are
    * few); the rebuild is one exchange keyed by doc_id whose
    * collect_list state is bounded by document length — output-sized
    * work, same class as any per-document reconstruction. */
  def applySpanCuts(
      docs: DataFrame, idCol: String, textCol: String,
      spans: DataFrame): DataFrame = {
    val toks = docs.select(col(idCol).cast("long").as("doc_id"),
      posexplode(split(col(textCol), " ")))
    val sp = spans.select(col("doc_id").as("s_doc"),
      col("start_tok"), col("end_tok"))
    val kept = toks.join(sp,
      col("doc_id") === col("s_doc") &&
        col("pos") >= col("start_tok") && col("pos") < col("end_tok"),
      "left_anti")
    val rebuilt = kept.groupBy(col("doc_id"))
      .agg(array_join(transform(
          array_sort(collect_list(struct(col("pos"), col("col")))),
          p => p.getField("col")), " ").as("text_cut"),
        count(lit(1)).as("__nk"))
    docs.select(col(idCol).cast("long").as("doc_id"),
        size(split(col(textCol), " ")).cast("long").as("__n"))
      .join(rebuilt, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("text_cut"), lit("")).as("text_cut"),
        (col("__n") - coalesce(col("__nk"), lit(0L))).as("removed_tokens"))
  }

  /** INTER-SOURCE DUPLICATION MATRIX — the provenance view of a
    * near-dup pass (public practice: corpus reports break duplication
    * down BY SOURCE PAIR — which crawls/snapshots/feeds copy each
    * other — before deciding what to drop; cross-source rates flag
    * mirror sites and snapshot overlap, the within-source diagonal
    * flags template farms): near-dup pairs (any detector's (a_id,
    * b_id) output, e.g. [[minhashLsh]]) roll up to UNDIRECTED source
    * pairs with a normalized rate — n_pairs / (n_a·n_b) across
    * sources, n_pairs / (n·(n−1)/2) on the diagonal — so rates
    * compare across differently-sized sources. Only observed source
    * pairs emit (sparse matrix).
    *
    * Scale shape: two id-keyed joins attach sources to the pair list
    * (pair-list-sized, both sides narrow), ONE aggregate to the
    * ≤|sources|² matrix; the per-source counts join back broadcast.
    * @return (source_a, source_b, n_pairs, n_docs_a, n_docs_b,
    *         dup_rate) — source_a ≤ source_b, dup_rate round6. */
  def sourceDupMatrix(
      pairs: DataFrame, docs: DataFrame, idCol: Column,
      sourceCol: Column): DataFrame = {
    val src = docs.select(idCol.cast("long").as("__id"),
      sourceCol.cast("string").as("__src"))
    val m = pairs
      .join(src.select(col("__id").as("a_id"), col("__src").as("__sa")),
        "a_id")
      .join(src.select(col("__id").as("b_id"), col("__src").as("__sb")),
        "b_id")
      .select(least(col("__sa"), col("__sb")).as("source_a"),
        greatest(col("__sa"), col("__sb")).as("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(count(lit(1)).as("n_pairs"))
    val counts = src.groupBy(col("__src")).agg(count(lit(1)).as("__n"))
    m.join(broadcast(counts.select(col("__src").as("source_a"),
        col("__n").as("n_docs_a"))), "source_a")
      .join(broadcast(counts.select(col("__src").as("source_b"),
        col("__n").as("n_docs_b"))), "source_b")
      .withColumn("__max", when(col("source_a") === col("source_b"),
          expr("n_docs_a * (n_docs_a - 1) DIV 2"))
        .otherwise(col("n_docs_a") * col("n_docs_b")))
      .select(col("source_a"), col("source_b"), col("n_pairs"),
        col("n_docs_a"), col("n_docs_b"),
        round6(col("n_pairs").cast("double") /
          col("__max").cast("double")).as("dup_rate"))
  }
}
