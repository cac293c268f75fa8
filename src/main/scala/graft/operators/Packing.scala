package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.portable_hash

/** Sequence PACKING — the concat-and-chunk layout LLM pretraining
  * feeds on (no reference analog; extension surface): documents are
  * concatenated in a deterministic order into a token stream that is
  * cut into fixed context-length windows, and each document learns its
  * stream offset plus the chunk range it spans (the metadata a loader
  * needs to materialize any chunk, and a curation pipeline needs to
  * audit document→window provenance).
  *
  * Scale design: ONE global stream would serialize into a single
  * window sort — instead ids hash into `nShards` independent streams
  * (exactly the per-worker sharding a distributed pretraining job
  * does), so the window sort runs per shard in parallel and the only
  * exchange is the hash shuffle on the shard key. Everything is
  * integer arithmetic over a deterministic (shard, id) order —
  * exactly oracle-reproducible. */
object Packing {

  /** @param contextLen tokens per training window
    * @param nShards    independent packing streams
    * @return (id, shard, tokens, start_off, chunk_id, n_chunks):
    *         stream offset of the doc's first token, the chunk that
    *         token lands in, and how many chunks the doc touches
    *         (0 for empty docs). */
  def concatChunks(
      docs: DataFrame, idCol: Column, tokensCol: Column,
      contextLen: Int, nShards: Int): DataFrame = {
    require(contextLen > 0 && nShards > 0,
      "contextLen and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .select(idCol.cast("long").as("id"), tokensCol.cast("long").as("tokens"))
      .withColumn("shard",
        pmod(portable_hash(col("id").cast("string")), lit(nShards.toLong)))
      .withColumn("cum", sum(col("tokens")).over(w))
      .withColumn("start_off", col("cum") - col("tokens"))
      .withColumn("chunk_id", expr(s"start_off DIV ${contextLen}L"))
      .withColumn("n_chunks", when(col("tokens") === 0, lit(0L))
        .otherwise(expr(s"(cum - 1) DIV ${contextLen}L") - col("chunk_id") + 1L))
      .select(col("id"), col("shard"), col("tokens"),
        col("start_off"), col("chunk_id"), col("n_chunks"))
  }

  /** SEEDED GLOBAL SHUFFLE + SOURCE-MIX SHARDING (q115) — the
    * training-ORDER half of the packing surface (round-11 verdict ask
    * #6): [[concatChunks]]/[[packTokenChunks]] lay documents out in
    * corpus (id) order, but a real pretraining run draws a SEEDED
    * pseudo-random permutation with an ENFORCED source mix (the
    * Pile/Dolma recipe: subsample each source to a target proportion,
    * then interleave) — q84's mix stats are measurement; this is
    * enforcement.
    *
    * Deterministic construction, fully oracle-expressible:
    *  1. permutation key `h = portable_hash(repeat("<seed>:<id>;", 3))`
    *     — changing the seed permutes everything, the same seed
    *     reproduces the run bit-for-bit. The REPEAT matters: the
    *     31-ary polynomial hash is order-preserving until its
    *     accumulator wraps the modulus, so a single short "<seed>:<id>"
    *     would sort almost BY ID and a seed change would shift every
    *     key by a constant (no permutation at all); tripling the input
    *     wraps the modulus every few characters (measured: inversions
    *     vs id order ≈ n²/4, the uniform-permutation expectation);
    *  2. per-source rank `r` by (h, id) — the seeded order WITHIN each
    *     source;
    *  3. quotas: with target proportions p_s and per-source corpus
    *     counts C_s, the largest mix-respecting total is
    *     N = min_s floor(C_s / p_s); source s contributes its first
    *     n_s = floor(N · p_s) docs by rank (plain double arithmetic —
    *     DuckDB replays the identical IEEE ops);
    *  4. shard = r mod nShards — each shard receives n_s/nShards (±1)
    *     docs of every source: the mix holds PER SHARD, not just
    *     globally;
    *  5. training position within the shard = rank by (h, id) across
    *     sources — sources interleave uniformly through the shard
    *     (h is uniform), not in blocks.
    *
    * Scale shape: one bounded collect (per-source counts, |sources|
    * rows), then two window sorts over narrow (id, source, h) rows —
    * the exchanges carry doc METADATA, never text/tokens; the payload
    * joins back by id downstream ([[packTokenChunksAssigned]]).
    *
    * @param mix source → target proportion (use exactly-representable
    *            doubles, e.g. 0.5/0.25, if bit-replay by an external
    *            oracle matters); sources absent from `mix` are
    *            excluded (proportion 0)
    * @return (shard, pos, id, source) — `pos` is the training order
    *         within the shard. */
  def shuffleShards(
      docs: DataFrame, idCol: String, sourceCol: String,
      seed: Long, nShards: Int, mix: Map[String, Double]): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    require(mix.nonEmpty && mix.values.forall(_ > 0),
      "mix needs at least one source with a positive proportion")
    // one-shot deterministic side action: AQE-off (Par.withoutAqe)
    val counts = Par.withoutAqe(docs.sparkSession)(
        docs.filter(col(sourceCol).isin(mix.keys.toSeq: _*))
        .groupBy(col(sourceCol)).count().collect())
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mix.keys.foreach(s =>
      require(counts.contains(s), s"no documents of source '$s'"))
    val total = mix.map { case (s, p) =>
      math.floor(counts(s) / p).toLong }.min
    val quotas = mix.map { case (s, p) =>
      s -> math.floor(total * p).toLong }
    val h = portable_hash(repeat(
      concat(lit(s"$seed:"), col("id").cast("string"), lit(";")), 3))
    val ranked = rankByHash(
      docs
        .select(col(idCol).cast("long").as("id"), col(sourceCol).as("source"))
        .filter(col("source").isin(mix.keys.toSeq: _*))
        .withColumn("__h", h),
      "source", "__r", blocksHint = Some(FewGroupBlocks))
    rankByHash(
      ranked
        .filter(col("__r") < element_at(typedLit(quotas), col("source")))
        .withColumn("shard", col("__r") % nShards),
      "shard", "pos")
      .select(col("shard"), col("pos"), col("id"), col("source"))
  }

  /** Rank blocks for [[rankByHash]]: the portable-hash range
    * [0, 1_000_000_007) splits into this many equal-width ordered
    * blocks. |groups|·RankBlocks concurrent sorts replace |groups|
    * single-reducer sorts; the offsets side table is
    * |groups|·RankBlocks rows — broadcast-sized for any corpus.
    * Overridable (spark.graft.pack.rankBlocks) so the spec can force
    * many-block layouts on small corpora; the value does not affect
    * results, only parallelism. */
  private val RankBlocks = 1024L
  private val HashMod = 1000000007L

  /** Block count for rank sites whose groups are FEW and UNEVEN (the
    * source-keyed ranks: shuffleShards' 5:2:1-style mixes): with the
    * default 1024 blocks, a heavy group's cells are proportionally
    * heavy and a reducer that draws several of them reads 1.8× mean
    * bytes (measured isolated+warm on the 50M-doc training_order row,
    * with CPU skew 2.1 following the bytes). Spending the binpack
    * convention's ~2M-row offsets budget on MORE, SMALLER cells
    * (budget / |groups| blocks per group) concentrates per-reducer
    * sums by the law of large numbers at zero extra passes; block
    * count never affects rank values. TWO measured ceilings bound the
    * budget from above (both found by sweep on the 50M-doc
    * training_order row): (1) the offsets side must stay BROADCAST —
    * at 2M rows AQE tipped the offsets join to sort-merge and the
    * corpus-side sort spilled 1.8 GB; (2) the offsets prefix-sum
    * window must stay under WindowExec's in-memory buffer bound
    * (spark.sql.windowExec.buffer.spill.threshold, 4096 rows per
    * partition = per GROUP here) — at 43k blocks/group the ~18 MB
    * offsets stage spilled 575 MB through the external row buffer.
    * 4000 blocks/group is the largest window-safe budget: cells are
    * 7.5× smaller than the 1024 default while every side structure
    * stays in memory. */
  private[operators] val FewGroupBlocks: Long = 4000L

  /** Adaptive cut-over for [[rankByHash]]: inputs whose Catalyst
    * size estimate is below this run the naive single window (the
    * two-level form's extra scan + broadcast cost more than they
    * save), at or above it the two-level form (a single-reducer sort
    * of a ≥256 MB group slice is where spill/serialization start to
    * dominate). Purely a plan choice — both forms produce
    * bit-identical ranks. */
  private val TwoLevelThresholdBytes = 256L * 1024 * 1024

  /** 0-based rank within `groupCol` by the strict total order
    * (__h, id) — the seeded-permutation rank every training-order
    * operator sorts by — computed TWO-LEVEL so it scales.
    *
    * A `row_number() OVER (PARTITION BY source ...)` funnels the whole
    * corpus through |sources| reducer tasks: at 10¹⁰ docs that is a
    * ~100 GB single-task sort — the one non-scalable shape in this
    * family's round-12 form. Because the order key `__h` is uniform on
    * [0, HashMod), range-blocking it is monotone in the sort order:
    * rank = (rows of the group in EARLIER blocks) + (local rank within
    * this block). Local ranks run per (group, block) — parallelism
    * |groups|·[[RankBlocks]] instead of |groups| — and the block row
    * counts prefix-sum into offsets in a side table small enough to
    * broadcast at any corpus size. Both exchanges hash on the same
    * (group, block) key, so AQE's exchange reuse dedupes the scan.
    *
    * Bit-identical to the naive window (same strict total order; ties
    * impossible — id is unique), so the q115/q119–q122 oracles see no
    * difference — which makes the CHOICE of form a pure plan
    * decision, taken ADAPTIVELY like Spark's own broadcast threshold:
    * the two-level form's extra stages (a second input scan for the
    * block counts, the offsets broadcast) are pure overhead on a
    * small corpus (measured 2.5–4× on the sf0.1 bench rows), so it
    * engages only when the input's Catalyst size estimate exceeds
    * [[TwoLevelThresholdBytes]] (conf
    * `spark.graft.pack.twoLevelRankThresholdBytes`). Explicit
    * `spark.graft.pack.twoLevelRank=true|false` forces either form
    * (the stress suite pins the two head-to-head:
    * `training_order[_flat]`). Input must carry `__h` and `id`.
    * Shared with [[Sampling.temperatureSample]], which ranks by the
    * same key shape. */
  /** The adaptive two-level decision shared by [[rankByHash]] and
    * [[assignedOffsets]]: an explicit
    * `spark.graft.pack.twoLevelRank=true|false` wins; otherwise the
    * blocked form engages when the input's Catalyst size estimate
    * reaches the threshold. Plan choice only — results identical. */
  private def useTwoLevel(df: DataFrame, callerDefault: Boolean = false): Boolean =
    df.sparkSession.conf.getOption("spark.graft.pack.twoLevelRank") match {
      // an EXPLICIT conf always wins — including over a caller's
      // forceTwoLevel default — so the documented "forces either form"
      // contract holds for every rank site
      case Some(s) => s.toBoolean
      case None if callerDefault => true
      case None =>
        val threshold = df.sparkSession.conf
          .getOption("spark.graft.pack.twoLevelRankThresholdBytes")
          .map(_.toLong).getOrElse(TwoLevelThresholdBytes)
        df.queryExecution.optimizedPlan.stats.sizeInBytes >= threshold
    }

  private[operators] def rankByHash(df: DataFrame, groupCol: String,
      rankName: String, blocksHint: Option[Long] = None,
      forceTwoLevel: Boolean = false): DataFrame = {
    // forceTwoLevel: for callers whose GROUP distribution, not input
    // size, is the risk — inContextOrder's megacluster pins a naive
    // per-group window regardless of how small the size estimate says
    // the input is (the round-16 stress re-run: the 10M-row synthetic
    // sat under the byte threshold, took the naive branch, and kept
    // the 4× skew the blocked form exists to remove). It is a caller
    // DEFAULT, not an override: explicit twoLevelRank conf still wins.
    val twoLevel = useTwoLevel(df, callerDefault = forceTwoLevel)
    if (!twoLevel) {
      val w = Window.partitionBy(col(groupCol))
        .orderBy(col("__h"), col("id"))
      return df.withColumn(rankName,
        row_number().over(w).cast("long") - 1)
    }
    // block-count resolution: explicit conf > caller's hint > default.
    // The hint exists for callers that KNOW their group cardinality
    // (binPackByLength's nShards·ctx length classes): the offsets
    // table is O(groups × blocks), and at the default 1024 blocks a
    // many-small-groups caller turns the offsets aggregate into a
    // corpus-sized hash-agg (measured: 4.6 GB deterministic map-side
    // fallback spill at the 50M-doc binpack envelope). Rank values do
    // not depend on the block count — any choice is bit-identical.
    val nBlocks = df.sparkSession.conf
      .getOption("spark.graft.pack.rankBlocks")
      .map(_.toLong).orElse(blocksHint).getOrElse(RankBlocks)
    val width = (HashMod + nBlocks - 1) / nBlocks
    val withB = df.withColumn("__rb",
      (col("__h") / width).cast("long"))
    val wOff = Window.partitionBy(col(groupCol)).orderBy(col("__rb"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = withB.groupBy(col(groupCol), col("__rb"))
      .agg(count(lit(1)).as("__rc"))
      .withColumn("__roff", coalesce(sum(col("__rc")).over(wOff), lit(0L)))
      .select(col(groupCol), col("__rb"), col("__roff"))
    val wLoc = Window.partitionBy(col(groupCol), col("__rb"))
      .orderBy(col("__h"), col("id"))
    // NO broadcast hint on the offsets side: its row count is the
    // number of DISTINCT (group, block) pairs present — tiny for few
    // large groups (the q115/q117 shape), but approaching the corpus
    // size for many small groups (q124's nShards×lengths classes,
    // where ~every group touches ~every block). A forced broadcast of
    // that table spills every task (measured: 4.6 GB spill / 3.3 GB
    // peak task mem at the 50M-doc binpack envelope); left to AQE it
    // broadcasts exactly when small and sort-merge-joins otherwise —
    // both sides already hash-partition on (group, block).
    withB.join(offs, Seq(groupCol, "__rb"))
      .withColumn(rankName,
        col("__roff") + row_number().over(wLoc).cast("long") - 1)
      .drop("__rb", "__roff")
  }

  /** MULTI-EPOCH training order — the data-constrained recipe
    * (public result: repeating a fixed corpus for a handful of epochs
    * is near-as-good as fresh data — Muennighoff et al. 2023, "Scaling
    * Data-Constrained Language Models"; every practical pretraining
    * loader implements "reshuffle each epoch"): the SAME
    * quota-selected corpus trains `epochs` times, each epoch in its
    * own independently-seeded order, so no document ordering repeats
    * across epochs and the whole multi-epoch stream is one
    * deterministic artifact.
    *
    *  - **selection is epoch-invariant**: the doc set is
    *    [[shuffleShards]]'s quota rule under the BASE seed — every
    *    epoch trains exactly that set (epoch 0 IS the q115 layout);
    *  - **epoch e > 0** re-ranks the selected docs per source under
    *    the derived key `"<seed>~epoch<e>:"`, round-robins shards by
    *    that rank (so the per-shard source mix holds in EVERY epoch),
    *    and interleaves within the shard by the epoch's own key;
    *  - **positions continue across epochs**: round-robin assignment
    *    makes per-shard counts permutation-INVARIANT (the count of
    *    ranks r < quota with r mod nShards = k does not depend on
    *    which doc got which rank), so epoch e's positions offset by
    *    e·n0(shard) with n0 computed once — dense 0..(epochs·n0−1)
    *    per shard.
    *
    * Same narrow metadata wire as [[shuffleShards]], one extra
    * per-source + per-shard window pair per epoch; the nShards-row
    * count table joins back as a broadcast.
    *
    * @return (shard, pos, id, source, epoch) — `pos` is the training
    *         order within the shard across ALL epochs. */
  def epochOrder(
      docs: DataFrame, idCol: String, sourceCol: String,
      seed: Long, nShards: Int, mix: Map[String, Double],
      epochs: Int): DataFrame = {
    require(epochs > 0, "epochs must be positive")
    val base = shuffleShards(docs, idCol, sourceCol, seed, nShards, mix)
      .withColumn("epoch", lit(0L))
    if (epochs == 1) return base
    val n0 = base.groupBy(col("shard")).agg(count(lit(1)).as("__n0"))
    val sel = base.select(col("id"), col("source"))
    val later = (1 until epochs).map { e =>
      val he = portable_hash(repeat(
        concat(lit(s"$seed~epoch$e:"), col("id").cast("string"), lit(";")),
        3))
      rankByHash(
        // source groups are UNEVEN (the mix) → small cells; shard
        // groups are uniform by construction (__r % nShards) and
        // stay on the default block count
        rankByHash(sel.withColumn("__h", he), "source", "__r",
          blocksHint = Some(FewGroupBlocks))
          .withColumn("shard", col("__r") % nShards),
        "shard", "__p")
        .join(broadcast(n0), Seq("shard"))
        .select(col("shard"), (col("__n0") * e + col("__p")).as("pos"),
          col("id"), col("source"), lit(e.toLong).as("epoch"))
    }
    later.foldLeft(base)(_ unionByName _)
  }

  /** TWO-PHASE CURRICULUM training order — the ANNEAL schedule
    * (public recipe: train the bulk of the run on the broad source
    * mix, then finish on a held-out high-quality subset; the
    * mid-training "annealing" phase of recent open pipelines, e.g.
    * MiniCPM's two-stage WSD data schedule and OLMo 2's late-stage
    * high-quality anneal):
    *
    *  - **phase 0 (bulk)**: [[shuffleShards]] semantics — seeded
    *    permutation + enforced source mix — over every eligible doc
    *    the anneal predicate does NOT select (quotas computed on that
    *    remaining pool);
    *  - **phase 1 (anneal tail)**: the predicate-selected docs
    *    (restricted to `mix` sources; mix NOT enforced — the anneal
    *    set is quality-chosen, which is the point), appended AFTER
    *    phase 0 within each shard, in their own seeded order.
    *
    * Anneal docs are HELD OUT of phase 0 (each doc trains once); the
    * repeat-in-bulk variant is the union of plain [[shuffleShards]]
    * with this tail. A null predicate value means "not anneal".
    *
    * Scale shape — deliberately different from phase 0's round-robin:
    * the tail's shard is `h mod nShards` (hash assignment, balanced in
    * expectation) and its rank is computed PER SHARD, so no stage
    * needs a global (single-partition) window at any corpus size; the
    * per-shard phase-0 counts join back as an nShards-row broadcast.
    * Everything is the same narrow (id, source, h) metadata wire as
    * [[shuffleShards]] — the payload never rides these exchanges.
    *
    * Determinism: the tail's permutation key derives from
    * `"<seed>~anneal:"` — disjoint from phase 0's `"<seed>:"` prefix
    * by construction (`~` cannot appear in a decimal seed), so the
    * two phases draw independent orders from one seed, and the whole
    * layout replays bit-for-bit (q120 oracle).
    *
    * @param annealWhen boolean Column over `docs`' columns selecting
    *                   the anneal set (e.g. a quality-score threshold)
    * @return (shard, pos, id, source, phase): `pos` is the training
    *         order within the shard across BOTH phases (phase-1
    *         positions continue after phase 0); `phase` ∈ {0, 1}. */
  def curriculumOrder(
      docs: DataFrame, idCol: String, sourceCol: String,
      seed: Long, nShards: Int, mix: Map[String, Double],
      annealWhen: Column): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val isAnneal = coalesce(annealWhen, lit(false))
    val bulk = shuffleShards(docs.filter(!isAnneal), idCol, sourceCol,
      seed, nShards, mix)
    val bulkCounts = bulk.groupBy(col("shard"))
      .agg(count(lit(1)).as("__n0"))
    val h1 = portable_hash(repeat(
      concat(lit(s"$seed~anneal:"), col("id").cast("string"), lit(";")), 3))
    val tail = rankByHash(
      docs
        .filter(isAnneal && col(sourceCol).isin(mix.keys.toSeq: _*))
        .select(col(idCol).cast("long").as("id"),
          col(sourceCol).as("source"))
        .withColumn("__h", h1)
        .withColumn("shard", pmod(col("__h"), lit(nShards.toLong))),
      "shard", "__r")
      .join(broadcast(bulkCounts), Seq("shard"), "left")
      .select(col("shard"),
        (coalesce(col("__n0"), lit(0L)) + col("__r")).as("pos"),
        col("id"), col("source"), lit(1L).as("phase"))
    bulk.select(col("shard"), col("pos"), col("id"), col("source"),
        lit(0L).as("phase"))
      .unionByName(tail)
  }

  /** [[packTokenChunks]] under an EXTERNAL shard assignment + order —
    * pairs with [[shuffleShards]]: the chunk layout follows the seeded
    * training order instead of the id order. `assigned` carries
    * (shard, pos, id); token arrays join in by id (co-hashed join, the
    * payload's only exchange). Same slice/reassembly machinery as
    * [[packTokenChunks]], so the two layouts cannot drift.
    * @return (shard, chunk_id, token_ids). */
  def packTokenChunksAssigned(
      assigned: DataFrame, docs: DataFrame, idCol: Column,
      tokenIdsCol: Column, contextLen: Int): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    sliceAndReassemble(assignedOffsets(assigned, docs, idCol, tokenIdsCol),
      contextLen)
  }

  /** Block length for the two-level per-shard cumulative sum in
    * [[assignedOffsets]]: `pos` is dense per shard (0..n−1 from
    * [[shuffleShards]]; 0..epochs·n0−1 from [[epochOrder]]), so
    * fixed-width pos blocks are balanced and monotone in the stream
    * order; the block-totals side table is docs/PosBlock rows —
    * broadcast-sized at any corpus size (10¹⁰ docs → 10⁴ rows).
    * Overridable (spark.graft.pack.posBlock) so the spec can force
    * multi-block layouts on small corpora; results are invariant. */
  private val PosBlock = 1L << 20

  /** Shared head of the assigned-order paths: join token arrays onto
    * the (shard, pos, id) assignment and derive each doc's stream
    * offset via the per-shard cumulative token sum. Like [[rankByHash]]
    * the sum is TWO-LEVEL (local running sum per (shard, pos-block) +
    * broadcast block offsets) — a running sum `OVER (PARTITION BY
    * shard)` alone would funnel the corpus through nShards reducer
    * tasks. Bit-identical to the naive window (same order, integer
    * sums); [[useTwoLevel]] picks the form adaptively (explicit
    * `spark.graft.pack.twoLevelRank` overrides). Zero-token docs
    * occupy no stream space and are excluded. */
  private def assignedOffsets(
      assigned: DataFrame, docs: DataFrame, idCol: Column,
      tokenIdsCol: Column): DataFrame = {
    val toks = docs.select(idCol.cast("long").as("id"),
      tokenIdsCol.cast("array<int>").as("ids"))
    val joined = assigned.select(col("shard"), col("pos"), col("id"))
      .join(toks, "id")
      .withColumn("__t", size(col("ids")).cast("long"))
    val cum = if (!useTwoLevel(joined)) {
      val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      joined.withColumn("cum", sum(col("__t")).over(w))
    } else {
      val posBlock = assigned.sparkSession.conf
        .getOption("spark.graft.pack.posBlock")
        .map(_.toLong).getOrElse(PosBlock)
      val withB = joined.withColumn("__pb", expr(s"pos DIV ${posBlock}L"))
      val wOff = Window.partitionBy(col("shard")).orderBy(col("__pb"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = withB.groupBy(col("shard"), col("__pb"))
        .agg(sum(col("__t")).as("__bs"))
        .withColumn("__boff",
          coalesce(sum(col("__bs")).over(wOff), lit(0L)))
        .select(col("shard"), col("__pb"), col("__boff"))
      val wLoc = Window.partitionBy(col("shard"), col("__pb"))
        .orderBy(col("pos"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      withB.join(broadcast(offs), Seq("shard", "__pb"))
        .withColumn("cum", col("__boff") + sum(col("__t")).over(wLoc))
        .drop("__pb", "__boff")
    }
    cum
      .withColumn("start_off", col("cum") - col("__t"))
      .filter(size(col("ids")) > 0)
      .drop("__t")
  }

  /** DOCUMENT-BOUNDARY INDEX of the assigned-order packed layout —
    * the per-chunk sample index a training loader needs to reset
    * attention (and loss masking) at document starts inside each
    * packed context window (the Megatron-LM `sample_idx`/document
    * index shape): one row per document, locating where it begins in
    * the chunk grid. A chunk that appears in no row is a CONTINUATION
    * (its whole window belongs to a doc begun earlier); `boundary` is
    * the 0-based offset of the doc's first token within its first
    * chunk. Derives from [[assignedOffsets]] — the SAME cumulative-sum
    * derivation [[packTokenChunksAssigned]] slices by, so the index
    * and the chunk contents cannot drift — and is a pure narrow map
    * after that window: no exchange of its own, no per-token rows.
    * Zero-token docs occupy no stream space and are excluded.
    * @return (shard, chunk_id, boundary, id). */
  def chunkDocBoundaries(
      assigned: DataFrame, docs: DataFrame, idCol: Column,
      tokenIdsCol: Column, contextLen: Int): DataFrame = {
    require(contextLen > 0, "contextLen must be positive")
    val L = contextLen.toLong
    assignedOffsets(assigned, docs, idCol, tokenIdsCol)
      .select(col("shard"), expr(s"start_off DIV $L").as("chunk_id"),
        (col("start_off") % L).cast("int").as("boundary"), col("id"))
  }

  /** Shared tail of the materialized-packing paths: split each doc's
    * contiguous token run into per-chunk slices and reassemble chunks
    * by stream position. `offs` must carry (shard, ids, start_off). */
  private def sliceAndReassemble(
      offs: DataFrame, contextLen: Int): DataFrame = {
    val L = contextLen.toLong
    val slices = offs.select(col("shard"),
      explode(expr(
        s"""transform(
           |  sequence(start_off DIV $L, (start_off + size(ids) - 1) DIV $L),
           |  c -> struct(
           |    c AS chunk_id,
           |    greatest(c * $L, start_off) AS pos,
           |    slice(ids,
           |      CAST(greatest(c * $L - start_off, 0) AS INT) + 1,
           |      CAST(least((c + 1) * $L, start_off + size(ids))
           |           - greatest(c * $L, start_off) AS INT)) AS part))"""
          .stripMargin)).as("e"))
      .select(col("shard"), col("e.chunk_id").as("chunk_id"),
        col("e.pos").as("pos"), col("e.part").as("part"))
    slices.groupBy(col("shard"), col("chunk_id"))
      .agg(flatten(transform(
        array_sort(collect_list(struct(col("pos"), col("part")))),
        s => s("part"))).as("token_ids"))
  }

  /** MATERIALIZED packing — the [[concatChunks]] layout with the
    * actual token ids per (shard, chunk): exactly the table
    * [[graft.sinks.TokenSink.writePackedTokens]] persists, closing
    * the corpus→pretraining-shards pipeline.
    *
    * Scale shape: a document's tokens are CONTIGUOUS in its shard
    * stream, so each doc narrowly splits its id array into at most
    * n_chunks slices (integer window arithmetic + `slice`, no
    * per-token rows) and the one exchange groups SLICES by
    * (shard, chunk_id) — the wire carries the token bytes exactly
    * once in document-bounded rows, never a row per token. Within a
    * chunk, slices reassemble by stream position (array_sort on the
    * (pos, part) struct — deterministic, oracle-mirrorable ordering).
    * The per-doc offsets reuse [[concatChunks]]'s cumulative-sum
    * derivation, so the two views of the layout can never drift.
    * @return (shard, chunk_id, token_ids). */
  def packTokenChunks(
      docs: DataFrame, idCol: Column, tokenIdsCol: Column,
      contextLen: Int, nShards: Int): DataFrame = {
    require(contextLen > 0 && nShards > 0,
      "contextLen and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = docs
      .select(idCol.cast("long").as("id"),
        tokenIdsCol.cast("array<int>").as("ids"))
      .withColumn("shard",
        pmod(portable_hash(col("id").cast("string")), lit(nShards.toLong)))
      .withColumn("cum", sum(size(col("ids")).cast("long")).over(w))
      .withColumn("start_off", col("cum") - size(col("ids")))
      .filter(size(col("ids")) > 0)
    sliceAndReassemble(offs, contextLen)
  }

  /** SFT LOSS-MASKED PACKING — the supervised-fine-tuning assembly
    * step every instruction-tuning pipeline runs (public recipe:
    * concatenate (prompt, response) conversations into fixed context
    * windows and train with the loss masked to RESPONSE tokens only —
    * prompt tokens get label −100 in the standard collators): each
    * conversation contributes its prompt ids (mask 0) then response
    * ids (mask 1); conversations pack id-major into `contextLen`
    * windows per shard exactly like [[packTokenChunks]] (same shard
    * hash, same cumulative-offset slicing — a masked stream and an
    * unmasked stream of the same ids are POSITIONALLY IDENTICAL,
    * spec-pinned), and the mask travels WITH each token through the
    * one exchange as a (tok, m) struct — never a separate join, so
    * ids and mask cannot drift.
    *
    * Scale shape: identical to [[packTokenChunks]] — document-bounded
    * slice rows through one (shard, chunk) exchange, no per-token
    * rows; the mask adds 4 B/token to the wire.
    *
    * Null contract (the [[packTokenChunks]] convention): a NULL
    * prompt or response array null-propagates through the concat and
    * the conversation is dropped with the empty ones — a caller whose
    * schema means "absent side = no tokens" passes empty arrays, not
    * nulls.
    * @return (shard, chunk_id, token_ids, loss_mask). */
  def sftMaskedPack(
      convs: DataFrame, idCol: Column,
      promptIdsCol: Column, responseIdsCol: Column,
      contextLen: Int, nShards: Int): DataFrame = {
    require(contextLen > 0 && nShards > 0,
      "contextLen and nShards must be positive")
    val w = Window.partitionBy(col("shard")).orderBy(col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val offs = convs
      .select(idCol.cast("long").as("id"),
        concat(
          transform(promptIdsCol.cast("array<int>"),
            t => struct(t.as("tok"), lit(0).as("m"))),
          transform(responseIdsCol.cast("array<int>"),
            t => struct(t.as("tok"), lit(1).as("m")))).as("ids"))
      .withColumn("shard",
        pmod(portable_hash(col("id").cast("string")), lit(nShards.toLong)))
      .withColumn("cum", sum(size(col("ids")).cast("long")).over(w))
      .withColumn("start_off", col("cum") - size(col("ids")))
      .filter(size(col("ids")) > 0)
    sliceAndReassemble(offs, contextLen)
      .select(col("shard"), col("chunk_id"),
        transform(col("token_ids"), s => s.getField("tok")).as("token_ids"),
        transform(col("token_ids"), s => s.getField("m")).as("loss_mask"))
  }

  /** IN-CONTEXT-PRETRAINING ORDER — the related-documents-adjacent
    * training layout (public recipe: order the pretraining stream so
    * semantically related documents share context windows instead of
    * being i.i.d.-shuffled — Shi et al. 2023, "In-Context Pretraining:
    * Language Modeling Beyond Document Boundaries"; clusters come from
    * any assignment, e.g. the frozen-IVF lists of
    * [[Similarity.ivfAssign]]): a cluster lands WHOLE in one shard
    * (shard = hash of the cluster key), clusters within a shard appear
    * in seeded-hash order, documents within a cluster in their own
    * seeded-hash order — so every document keeps `pos`-adjacency to
    * its cluster peers and the whole layout is one deterministic
    * artifact of (seed, assignment).
    *
    * Scale shape — two nested two-level ranks: clusters are the
    * natural blocks of the per-shard order (per-cluster counts + one
    * cluster-sized prefix window give each cluster its shard offset),
    * and WITHIN a cluster the doc rank goes through [[rankByHash]]'s
    * hash-blocked form — so a MEGACLUSTER no longer pins one reducer
    * at its own size (the round-15 stress finding: one 2M-doc cluster
    * held task skew at 4.69/byte skew 4.03; blocked, its sort spreads
    * over RankBlocks ranges like any other skewed group). The offsets
    * tables are cluster-sized and (cluster × present-blocks)-sized
    * respectively; both join back broadcast-or-hash under AQE.
    * `cluster` determines `shard`, so the within-cluster rank can
    * group by cluster alone and ride the shared helper unchanged.
    * @return (shard, pos, id, cluster) — pos dense 0.. per shard. */
  def inContextOrder(
      docs: DataFrame, idCol: Column, clusterCol: Column,
      seed: Long, nShards: Int): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val base = docs.select(idCol.cast("long").as("id"),
        clusterCol.cast("long").as("cluster"))
      .withColumn("shard",
        pmod(portable_hash(repeat(concat(lit(s"$seed~icps:"),
          col("cluster").cast("string"), lit(";")), 3)),
          lit(nShards.toLong)))
      .withColumn("__hc", portable_hash(repeat(concat(lit(s"$seed~icpc:"),
        col("cluster").cast("string"), lit(";")), 3)))
      // "__h": rankByHash's input contract (the within-cluster sort key)
      .withColumn("__h", portable_hash(repeat(concat(lit(s"$seed~icpd:"),
        col("id").cast("string"), lit(";")), 3)))
    val wOff = Window.partitionBy(col("shard"))
      .orderBy(col("__hc"), col("cluster"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy(col("shard"), col("cluster"), col("__hc"))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__coff", coalesce(sum(col("__n")).over(wOff), lit(0L)))
      .select(col("shard"), col("cluster"), col("__coff"))
    rankByHash(base, "cluster", "__lr", forceTwoLevel = true)
      .join(offs, Seq("shard", "cluster"))
      .withColumn("pos", col("__coff") + col("__lr"))
      .select(col("shard"), col("pos"), col("id"), col("cluster"))
  }

  /** SLIDING-WINDOW CHUNKING — the RAG/embedding-pipeline splitter
    * (overlapping windows WITHIN each document, vs [[concatChunks]]'s
    * cross-document stream): each doc yields windows of `chunkTokens`
    * whitespace tokens starting every `stride` tokens, the last
    * window clamped to the doc end (a doc of ≤ `chunkTokens` tokens
    * yields exactly one chunk). All-integer window arithmetic over
    * the token array — a pure narrow per-row explode: zero shuffle,
    * zero state, chunk count per doc is
    * 1 + ceil(max(0, n − chunk) / stride).
    * @return (id, chunk_id, start_tok, n_tok, chunk_text). */
  def slidingChunks(
      docs: DataFrame, idCol: Column, textCol: Column,
      chunkTokens: Int, stride: Int): DataFrame = {
    require(chunkTokens >= 1, "chunkTokens must be >= 1")
    require(stride >= 1 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens]")
    val c = chunkTokens.toLong
    docs
      .select(idCol.cast("long").as("id"),
        split(textCol, " ").as("__toks"))
      .withColumn("__n", size(col("__toks")).cast("long"))
      // integer ceil((n - c) / stride) via (n - c + stride - 1) div s
      .withColumn("__nchunks",
        when(col("__n") <= c, lit(1L))
          .otherwise(expr(s"(__n - ${c}L + ${stride - 1}L) DIV ${stride}L")
            + lit(1L)))
      .select(col("id"), col("__toks"), col("__n"),
        explode(sequence(lit(0L), col("__nchunks") - 1)).as("chunk_id"))
      .withColumn("start_tok", col("chunk_id") * stride)
      .select(col("id"), col("chunk_id"), col("start_tok"),
        least(lit(c), col("__n") - col("start_tok")).as("n_tok"),
        array_join(slice(col("__toks"),
          (col("start_tok") + 1).cast("int"), lit(chunkTokens)), " ")
          .as("chunk_text"))
  }

  /** SPAN CORRUPTION — the denoising-objective assembly step of
    * T5-style pretraining (public recipe: replace ~15% of tokens with
    * sentinel-marked noise spans and train to reconstruct them —
    * Raffel et al. 2020 §3.1.4; the UL2 denoiser mixture generalizes
    * span length/rate — Tay et al. 2022), made BLOCK-DETERMINISTIC so
    * the exact corruption pattern of a run is a replayable artifact
    * instead of an RNG trace:
    *
    *  - each document's token stream splits into fixed blocks of
    *    `blockLen`; the tail partial block is never corrupted;
    *  - block b of doc d corrupts iff
    *    `portable_hash(repeat("<seed>~sc:<d>:<b>;", 3)) mod
    *    corruptOneIn == 0` (the repeat-3 key-decorrelation convention
    *    of [[shuffleShards]]), giving a 1/corruptOneIn block rate;
    *  - a corrupted block hides ONE span of exactly `spanLen` tokens
    *    at offset `(h div corruptOneIn) mod (blockLen − spanLen + 1)`
    *    — spans cannot overlap (one per block) and cannot cross block
    *    bounds, which is what makes the construction closed-form: no
    *    sequential overlap-suppression scan, every block decides
    *    independently. Expected noise fraction =
    *    spanLen / (blockLen · corruptOneIn) — the defaults
    *    (16, 5, 2) give 15.6%, T5's operating point.
    *
    * Output is one row per span, pinning BOTH sides of the objective
    * without materializing per-token rows: `span_checksum`
    * (Σ tokenᵢ·i over the span, 1-based span-relative — the target
    * side) and `kept_checksum` (Σ tokenᵢ·i over all NON-noise tokens
    * at their 1-based absolute positions, identical on every row of a
    * doc — the input side; the q99 position-weighted convention, so
    * any drift in pattern or content fails the oracle hash). Docs
    * shorter than one block (or with no block selected) emit no rows.
    *
    * Scale shape: a pure per-row narrow map — integer hash arithmetic
    * and array slices inside higher-order functions, zero shuffle,
    * zero state; 100 TB of documents corrupt embarrassingly parallel.
    *
    * @return (id, span_idx, start_pos, span_checksum, kept_checksum):
    *         `span_idx` 0-based in block order, `start_pos` the
    *         0-based token index of the span's first token. */
  def spanCorruption(
      docs: DataFrame, idCol: Column, tokenIdsCol: Column, seed: Long,
      blockLen: Int = 16, spanLen: Int = 5,
      corruptOneIn: Int = 2): DataFrame = {
    require(blockLen > 0 && spanLen > 0 && spanLen <= blockLen,
      "need 0 < spanLen <= blockLen")
    require(corruptOneIn >= 1, "corruptOneIn must be >= 1")
    val B = blockLen.toLong; val L = spanLen; val m = corruptOneIn.toLong
    val offs = (blockLen - spanLen + 1).toLong
    // per-block corruption decision + span start, one struct per block
    // (h and h div m stay exact: h < 1e9 is far inside double range,
    // so floor(h / m) is the integer quotient)
    val marked = transform(sequence(lit(0L), col("__nb") - 1),
      b => {
        val h = portable_hash(repeat(concat(
          lit(s"$seed~sc:"), col("id").cast("string"),
          lit(":"), b.cast("string"), lit(";")), 3))
        struct(
          (h % m === 0).as("hit"),
          (b * B + pmod(floor(h / m).cast("long"), lit(offs)))
            .as("start"))
      })
    val posW = (ids: Column, from1: Column, len: Int, weightFrom: Column) =>
      aggregate(
        zip_with(
          slice(ids, from1.cast("int"), lit(len)),
          transform(sequence(lit(0), lit(len - 1)),
            j => weightFrom + j.cast("long")),
          (t, w) => t.cast("long") * w),
        lit(0L), (a, x) => a + x)
    docs
      .select(idCol.cast("long").as("id"),
        tokenIdsCol.cast("array<int>").as("ids"))
      .withColumn("__n", size(col("ids")).cast("long"))
      .withColumn("__nb", expr(s"__n DIV ${B}L"))
      .filter(col("__nb") > 0)
      .withColumn("__spans",
        filter(marked, s => s("hit")))
      .withColumn("__total",
        aggregate(
          zip_with(col("ids"), sequence(lit(1), size(col("ids"))),
            (t, i) => t.cast("long") * i.cast("long")),
          lit(0L), (a, x) => a + x))
      .withColumn("kept_checksum",
        col("__total") - aggregate(col("__spans"), lit(0L),
          (a, s) => a + posW(col("ids"), s("start") + 1, L,
            s("start") + 1)))
      .select(col("id"), col("ids"), col("kept_checksum"),
        posexplode(col("__spans")).as(Seq("span_idx", "s")))
      .select(col("id"), col("span_idx").cast("long").as("span_idx"),
        col("s.start").as("start_pos"),
        posW(col("ids"), col("s.start") + 1, L, lit(1L))
          .as("span_checksum"),
        col("kept_checksum"))
  }

  /** NEEDLE-IN-A-HAYSTACK EVAL BUILDER — the long-context retrieval
    * eval's data-construction step (public recipe: insert a known
    * "needle" span into each haystack document at a grid of depth
    * percentages, one eval example per (document, depth) cell —
    * Kamradt's NIAH grid, the standard long-context probe): needle
    * tokens insert BEFORE the original token at index
    * ⌊n·depth/100⌋ (depth 0 = prepend, 100 = append).
    *
    * The rearranged stream is pinned WITHOUT materializing it (the
    * q152 FIM convention) by the position-weighted checksum over NEW
    * positions, in closed form: prefix keeps its positions, the
    * needle contributes Σ needle_j·(pos+j), the suffix shifts by
    * |needle| — so checksum = Σ idᵢ·i + |needle|·(suffix sum) +
    * needle constants + pos·Σ needle_j, two integer folds per row.
    *
    * Scale shape: a pure narrow map × |depths| rows per doc — zero
    * shuffle; the needle constants are plan-time literals.
    * @return (id, depth_pct, insert_pos, out_len, out_checksum). */
  def needleInsert(
      docs: DataFrame, idCol: Column, tokenIdsCol: Column,
      needleIds: Seq[Int], depths: Seq[Int]): DataFrame = {
    require(needleIds.nonEmpty, "needleIds must be non-empty")
    require(depths.nonEmpty && depths.forall(d => d >= 0 && d <= 100),
      "depths must be percentages in [0, 100]")
    val L = needleIds.length.toLong
    val needleS = needleIds.map(_.toLong).sum
    val needleW = needleIds.zipWithIndex
      .map { case (t, j) => t.toLong * (j + 1) }.sum
    docs
      .select(idCol.cast("long").as("id"),
        tokenIdsCol.cast("array<int>").as("ids"))
      .withColumn("__n", size(col("ids")).cast("long"))
      .filter(col("__n") >= 1)
      .withColumn("__total",
        aggregate(
          zip_with(col("ids"), sequence(lit(1), size(col("ids"))),
            (t, i) => t.cast("long") * i.cast("long")),
          lit(0L), (a, x) => a + x))
      .select(col("id"), col("ids"), col("__n"), col("__total"),
        explode(array(depths.map(d => lit(d).cast("long")): _*))
          .as("depth_pct"))
      .withColumn("insert_pos", expr("(__n * depth_pct) DIV 100L"))
      .withColumn("__suf",
        aggregate(
          slice(col("ids"), (col("insert_pos") + 1).cast("int"),
            (col("__n") - col("insert_pos")).cast("int")),
          lit(0L), (a, t) => a + t.cast("long")))
      .select(col("id"), col("depth_pct"), col("insert_pos"),
        (col("__n") + lit(L)).as("out_len"),
        (col("__total") + lit(L) * col("__suf") + lit(needleW) +
          col("insert_pos") * lit(needleS)).as("out_checksum"))
  }

  /** UL2 MIXTURE-OF-DENOISERS — the multi-objective corruption mix of
    * UL2 pretraining (public recipe: Tay et al. 2022, "UL2: Unifying
    * Language Learning Paradigms" — each example trains under one of
    * three denoiser families, R-heavy: R = regular T5-style short
    * spans at ~15% noise, X = extreme long-span/high-rate corruption,
    * S = sequential prefix-LM where the target is the document
    * suffix), made replayable the [[spanCorruption]] way — the mode
    * draw and every span position are pure functions of (seed, id):
    *
    *  - mode = `portable_hash(repeat("<seed>~ul2:<id>;", 3)) mod 4`:
    *    0,1 → R (half the corpus — the paper's R-heavy weighting),
    *    2 → X, 3 → S;
    *  - R runs [[spanCorruption]] at (blockLen 10, spanLen 3,
    *    corruptOneIn 2) = 15% expected noise, T5's operating point;
    *  - X runs it at (12, 12, 2) = 50% noise in 12-token spans (the
    *    extreme-rate corner of the paper's X family);
    *  - S draws ONE split uniformly in [1, n−1] from the `~ul2s` key
    *    (both sides non-empty; docs of <2 tokens emit nothing, like
    *    R/X docs with no selected block) — the span is the whole
    *    suffix, `kept_checksum` covers the prefix at absolute
    *    positions, exactly the prefix-LM objective's input/target cut.
    *
    * Output pins both sides of every objective without materializing
    * per-token rows (the q99 position-weighted convention):
    * span checksums are span-relative, kept checksums absolute.
    *
    * Scale shape: three disjoint narrow branches over one base scan —
    * the mode filter is a pure predicate, R/X reuse the closed-form
    * block construction, S is array arithmetic; ZERO shuffle at any
    * corpus size (the union is a no-exchange operator).
    * @return (id, mode, span_idx, start_pos, span_len, span_checksum,
    *         kept_checksum). */
  def ul2Mix(
      docs: DataFrame, idCol: Column, tokenIdsCol: Column,
      seed: Long): DataFrame = {
    val base = docs.select(idCol.cast("long").as("id"),
        tokenIdsCol.cast("array<int>").as("ids"))
      .withColumn("__mode",
        pmod(portable_hash(repeat(concat(lit(s"$seed~ul2:"),
          col("id").cast("string"), lit(";")), 3)), lit(4L)))
    def corrupted(modeFilter: Column, tag: String,
        blockLen: Int, spanLen: Int): DataFrame =
      spanCorruption(base.filter(modeFilter), col("id"), col("ids"),
          seed, blockLen = blockLen, spanLen = spanLen, corruptOneIn = 2)
        .select(col("id"), lit(tag).as("mode"), col("span_idx"),
          col("start_pos"), lit(spanLen.toLong).as("span_len"),
          col("span_checksum"), col("kept_checksum"))
    val r = corrupted(col("__mode") <= 1, "R", blockLen = 10, spanLen = 3)
    val x = corrupted(col("__mode") === 2, "X", blockLen = 12, spanLen = 12)
    def posW(from1: Column, len: Column, weightFrom: Column): Column =
      aggregate(
        zip_with(slice(col("ids"), from1.cast("int"), len.cast("int")),
          sequence(weightFrom, weightFrom + len - 1),
          (t, w) => t.cast("long") * w.cast("long")),
        lit(0L), (a, z) => a + z)
    val sOut = base.filter(col("__mode") === 3)
      .withColumn("__n", size(col("ids")).cast("long"))
      .filter(col("__n") >= 2)
      .withColumn("__split",
        pmod(portable_hash(repeat(concat(lit(s"$seed~ul2s:"),
          col("id").cast("string"), lit(";")), 3)), col("__n") - 1) + 1)
      .select(col("id"), lit("S").as("mode"), lit(0L).as("span_idx"),
        col("__split").as("start_pos"),
        (col("__n") - col("__split")).as("span_len"),
        posW(col("__split") + 1, col("__n") - col("__split"), lit(1L))
          .as("span_checksum"),
        posW(lit(1L), col("__split"), lit(1L)).as("kept_checksum"))
    r.unionByName(x).unionByName(sOut)
  }

  /** FILL-IN-THE-MIDDLE transformation (Bavarian et al. 2022 — the
    * infilling objective code models train on): a seeded fraction of
    * documents is rearranged into the PSM layout
    * `[PRE] prefix [SUF] suffix [MID] middle`, teaching the model to
    * infill; the rest pass through untouched (the paper's joint
    * FIM+AR recipe).
    *
    * Deterministic construction (replayed by the q152 oracle):
    *  - doc transforms iff `portable_hash(repeat("<seed>~fim:<id>;",
    *    3)) mod 100 < fimPct` (the repeat-3 key-decorrelation
    *    convention);
    *  - two independent cut points `pmod(h, n+1)` from `~f1`/`~f2`
    *    keys, lo/hi ordered — prefix = tokens[1..lo], middle =
    *    (lo..hi], suffix = (hi..n] (any may be empty);
    *  - the transformed stream is pinned WITHOUT materializing it by
    *    the q99 position-weighted checksum over the REORDERED
    *    positions: token p's new position is p+1 (prefix),
    *    p−hi+lo+2 (suffix) or p+3+(n−hi) (middle), plus the three
    *    sentinel contributions at positions 1, lo+2 and lo+3+(n−hi);
    *    untransformed docs carry the plain Σ tokenᵢ·i. All integer —
    *    exact on any engine.
    *
    * Scale shape: a pure per-row narrow map — one zip_with over the
    * token array with a conditional weight, zero shuffle, zero state.
    * Token-less docs emit no row (nothing to transform).
    *
    * @return (id, fim, cut1, cut2, out_len, out_checksum); out_len =
    *         n+3 for transformed docs (three sentinels). */
  def fimTransform(
      docs: DataFrame, idCol: Column, tokenIdsCol: Column, seed: Long,
      fimPct: Int = 50, preTok: Int = 65536, sufTok: Int = 65537,
      midTok: Int = 65538): DataFrame = {
    require(fimPct >= 0 && fimPct <= 100, "fimPct must be in [0, 100]")
    def key(tag: String): Column = portable_hash(repeat(concat(
      lit(s"$seed~$tag:"), col("id").cast("string"), lit(";")), 3))
    docs
      .select(idCol.cast("long").as("id"),
        tokenIdsCol.cast("array<int>").as("ids"))
      .withColumn("__n", size(col("ids")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("fim", pmod(key("fim"), lit(100L)) < fimPct)
      .withColumn("cut1",
        when(col("fim"), least(pmod(key("f1"), col("__n") + 1),
          pmod(key("f2"), col("__n") + 1))))
      .withColumn("cut2",
        when(col("fim"), greatest(pmod(key("f1"), col("__n") + 1),
          pmod(key("f2"), col("__n") + 1))))
      .withColumn("out_len",
        when(col("fim"), col("__n") + 3).otherwise(col("__n")))
      .withColumn("out_checksum", {
        val lo = col("cut1"); val hi = col("cut2"); val n = col("__n")
        val newPos = (p: Column) => when(!col("fim"), p)
          .when(p <= lo, p + 1)
          .when(p > hi, p - hi + lo + 2)
          .otherwise(p + 3 + (n - hi))
        val toks = aggregate(
          zip_with(col("ids"), sequence(lit(1L), n),
            (t, p) => t.cast("long") * newPos(p)),
          lit(0L), (a, x) => a + x)
        toks + when(col("fim"),
          lit(preTok.toLong) + lit(sufTok.toLong) * (lo + 2) +
            lit(midTok.toLong) * (lo + 3 + (n - hi))).otherwise(lit(0L))
      })
      .select(col("id"), col("fim"), col("cut1"), col("cut2"),
        col("out_len"), col("out_checksum"))
  }

  /** [[fimTransform]]'s MATERIALIZING sibling for the packing path:
    * the same gate/cut construction, but emitting the actual
    * rearranged token arrays (sentinels inline) so the result feeds
    * [[packTokenChunks]]/`pack-tokens --fim-pct` directly. Kept
    * separate from the checksum form on purpose: the audit query
    * (q152) never pays array materialization, the packing path never
    * pays a second pass. PackingSpec pins the two agree checksum-for-
    * checksum. @return (id, ids) with ids rearranged where selected. */
  def fimApply(
      docs: DataFrame, idCol: Column, tokenIdsCol: Column, seed: Long,
      fimPct: Int = 50, preTok: Int = 65536, sufTok: Int = 65537,
      midTok: Int = 65538): DataFrame = {
    require(fimPct >= 0 && fimPct <= 100, "fimPct must be in [0, 100]")
    def key(tag: String): Column = portable_hash(repeat(concat(
      lit(s"$seed~$tag:"), col("id").cast("string"), lit(";")), 3))
    docs
      .select(idCol.cast("long").as("id"),
        tokenIdsCol.cast("array<int>").as("ids"))
      .withColumn("__n", size(col("ids")).cast("long"))
      .filter(col("__n") > 0)
      .withColumn("__fim", pmod(key("fim"), lit(100L)) < fimPct)
      .withColumn("__lo", least(pmod(key("f1"), col("__n") + 1),
        pmod(key("f2"), col("__n") + 1)).cast("int"))
      .withColumn("__hi", greatest(pmod(key("f1"), col("__n") + 1),
        pmod(key("f2"), col("__n") + 1)).cast("int"))
      .select(col("id"),
        when(!col("__fim"), col("ids")).otherwise(concat(
          array(lit(preTok)),
          slice(col("ids"), lit(1), col("__lo")),
          array(lit(sufTok)),
          slice(col("ids"), col("__hi") + 1,
            col("__n").cast("int") - col("__hi")),
          array(lit(midTok)),
          slice(col("ids"), col("__lo") + 1, col("__hi") - col("__lo"))))
          .as("ids"))
  }

  /** CONTEXT-LENGTH CALIBRATION SWEEP — the tuning curve a fine-tuning
    * pipeline reads before committing to a context length (the
    * [[Corpus.thresholdSweep]] shape, applied to [[binPackByLength]]'s
    * layout): per candidate length L, the CLOSED-FORM cost of packing
    * whole docs length-homogeneously — docs truncate to
    * len = min(n, L), each bin holds k = ⌊L/len⌋ same-length docs, a
    * length class of cnt docs fills ⌈cnt/k⌉ bins — so per candidate:
    * total bins, padding tokens (bins·L − cnt·len summed over
    * classes), truncated tokens (Σ n − len), and utilization =
    * round6(kept tokens / (bins·L)).
    *
    * Scale shape: ONE map-side-combined aggregate to the LENGTH
    * HISTOGRAM (≤ max-doc-length rows — thousands, not corpus-sized),
    * then the whole sweep is arithmetic on that bounded table cross
    * the candidate list. Never a per-candidate scan, never a doc-row
    * shuffle; the actual pack (q124) runs once, after this curve
    * picks L. @return (context_len, n_docs, n_bins, kept_tokens,
    * pad_tokens, trunc_tokens, utilization) — one row per candidate. */
  def contextLengthSweep(
      docs: DataFrame, lenCol: Column,
      candidates: Seq[Int]): DataFrame = {
    require(candidates.nonEmpty, "need at least one candidate length")
    require(candidates.forall(_ >= 1), "candidate lengths must be >= 1")
    val hist = docs.select(lenCol.cast("long").as("n"))
      .filter(col("n") >= 1)
      .groupBy(col("n")).agg(count(lit(1)).as("cnt"))
    val cand = docs.sparkSession
      .createDataFrame(candidates.distinct.sorted.map(Tuple1(_)))
      .toDF("context_len")
    val L = col("context_len").cast("long")
    val len = least(col("n"), L)
    val k = floor(L / len).cast("long") // ≥ 1 since len ≤ L
    val bins = ceil(col("cnt").cast("double") / k.cast("double")).cast("long")
    hist.crossJoin(broadcast(cand))
      .select(col("context_len"), col("cnt"), col("n"),
        bins.as("__bins"),
        (col("cnt") * len).as("__kept"),
        (bins * L - col("cnt") * len).as("__pad"),
        (col("cnt") * (col("n") - len)).as("__trunc"))
      .groupBy(col("context_len"))
      .agg(sum(col("cnt")).as("n_docs"),
        sum(col("__bins")).as("n_bins"),
        sum(col("__kept")).as("kept_tokens"),
        sum(col("__pad")).as("pad_tokens"),
        sum(col("__trunc")).as("trunc_tokens"))
      .select(col("context_len"), col("n_docs"), col("n_bins"),
        col("kept_tokens"), col("pad_tokens"), col("trunc_tokens"),
        graft.functions.TextFunctions.round6(
          col("kept_tokens").cast("double") /
            (col("n_bins") * col("context_len")).cast("double"))
          .as("utilization"))
  }

  /** LENGTH-HOMOGENEOUS BIN PACKING (q124) — the padding-minimizing
    * layout FINE-TUNING pipelines feed on (no reference analog;
    * extension surface). Unlike [[concatChunks]], which splits
    * documents across window boundaries (fine for pretraining,
    * wrong for SFT where an example must stay whole), each context
    * window ("bin") here holds only WHOLE documents — all of the same
    * truncated length L, `contextLen DIV L` of them per bin — so no
    * example is ever cut and the per-bin padding is the fixed
    * `contextLen mod (cap·L)` remainder plus the one partially-filled
    * last bin per (shard, L). Homogeneous-length binning is the
    * deterministic, exchange-free-to-verify member of the packing
    * family (first-fit variants chase the last few padding points
    * with a sequential scan that neither distributes nor
    * oracle-replays; the histogram-driven strategies in the packing
    * literature start from exactly this length-grouped layout).
    *
    * Construction (every step integer/window arithmetic, fully
    * oracle-expressible):
    *  1. length L = min(n_tokens, contextLen), truncation flagged;
    *     empty docs are excluded (they occupy no window);
    *  2. shard = hash(id) mod nShards ([[concatChunks]]'s rule), the
    *     independent-stream parallelism unit;
    *  3. seeded rank r within (shard, L) by the q115 permutation key
    *     — computed via [[rankByHash]], so no (shard, L) group ever
    *     funnels through one reducer;
    *  4. cap = contextLen DIV L; local bin = r DIV cap,
    *     slot = r mod cap, offset = slot·L;
    *  5. bins number densely per shard across lengths (ascending L):
    *     the per-(shard, L) bin counts aggregate to ≤ nShards·
    *     contextLen rows — broadcast-sized at any corpus — and
    *     prefix-sum into offsets.
    *
    * Scale shape: the corpus-sized exchanges are the rankByHash
    * blocks over narrow (id, len, h) metadata rows; the bin-offset
    * side table is bounded by nShards·contextLen regardless of
    * corpus size. Padding efficiency per shard is derivable from the
    * output: sum(len) / ((max(bin)+1)·contextLen).
    *
    * @return (id, shard, len, truncated, bin, slot, bin_off) — `bin`
    *         is the shard-global window index, `slot` the doc's
    *         position within it, `bin_off = slot·len` its token
    *         offset. */
  def binPackByLength(
      docs: DataFrame, idCol: Column, nTokensCol: Column,
      contextLen: Int, nShards: Int, seed: Long): DataFrame = {
    require(contextLen > 0 && nShards > 0,
      "contextLen and nShards must be positive")
    val ctx = contextLen.toLong
    val h = portable_hash(repeat(
      concat(lit(s"$seed:"), col("id").cast("string"), lit(";")), 3))
    val base = docs
      .select(idCol.cast("long").as("id"),
        nTokensCol.cast("long").as("__n"))
      .filter(col("__n") > 0)
      .withColumn("len", least(col("__n"), lit(ctx)))
      .withColumn("truncated", col("__n") > ctx)
      .withColumn("shard",
        pmod(portable_hash(col("id").cast("string")), lit(nShards.toLong)))
      .withColumn("__h", h)
      .withColumn("__g", concat(col("shard").cast("string"), lit("~"),
        col("len").cast("string")))
    // block hint: the rank's group cardinality is KNOWN here
    // (≤ nShards·ctx length classes), so size the hash-block count to
    // keep the offsets table ≈ 2M rows — still splitting a hot class
    // (the len == ctx truncation bucket) across blocks, without the
    // default 1024 blocks turning the offsets aggregate corpus-sized
    val blocks = math.max(8L,
      math.min(RankBlocks, 2000000L / math.max(1L, nShards.toLong * ctx)))
    val ranked = rankByHash(base, "__g", "__r", blocksHint = Some(blocks))
      .withColumn("cap", expr(s"${ctx}L DIV len"))
    // dense per-shard bin numbering: nbins per (shard, len) is a
    // <= nShards*contextLen-row aggregate; prefix-sum by ascending len
    val wOff = Window.partitionBy(col("shard")).orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = ranked.groupBy(col("shard"), col("len"))
      .agg(max(col("__r")).as("__mr"))
      .withColumn("__nbins",
        expr(s"__mr DIV (${ctx}L DIV len) + 1"))
      .withColumn("__boff",
        coalesce(sum(col("__nbins")).over(wOff), lit(0L)))
      .select(col("shard"), col("len"), col("__boff"))
    ranked.join(broadcast(offs), Seq("shard", "len"))
      .withColumn("bin", col("__boff") + expr("__r DIV cap"))
      .withColumn("slot", col("__r") % col("cap"))
      .select(col("id"), col("shard"), col("len"), col("truncated"),
        col("bin"), col("slot"), (col("slot") * col("len")).as("bin_off"))
  }

  /** DPO PREFERENCE-PAIR PACKING — the twin-plane assembly step of
    * direct-preference-optimization training (public recipe: each
    * example is (prompt, chosen, rejected); the collator builds TWO
    * sequences sharing the prompt — prompt+chosen and prompt+rejected
    * — with the loss masked to response tokens, and both sequences of
    * a pair MUST travel together because the DPO loss is computed on
    * their log-prob difference — Rafailov et al. 2023; the HF
    * `DPOTrainer` truncation contract: the prompt truncates from the
    * LEFT (keep the end nearest the response), then each sequence
    * truncates from the RIGHT to the context length):
    *
    *  - per plane, `keep_p = min(|p|, max(0, L − |r|))` prompt tokens
    *    survive (the LAST keep_p), then `keep_r = min(|r|, L − keep_p)`
    *    response tokens (the FIRST keep_r) — so a long response evicts
    *    prompt before it loses its own tokens, and a response longer
    *    than L right-truncates with no prompt at all;
    *  - the loss mask is 0 on surviving prompt positions, 1 on
    *    surviving response positions — per plane, because the two
    *    planes keep DIFFERENT prompt lengths when |chosen| ≠ |rejected|;
    *  - pair atomicity is by CONSTRUCTION: both planes live in one
    *    output row, so no layout step can ever separate them (the
    *    failure mode a naive "pack both sequences into the stream"
    *    design has).
    *
    * Scale shape: a pure per-row narrow map — array slices and
    * higher-order functions, ZERO shuffle (the shard column is a hash
    * label for downstream writers, not an exchange); 100 TB of pairs
    * pack embarrassingly parallel.
    *
    * Null/empty contract (the [[sftMaskedPack]] convention): a NULL
    * prompt or response null-propagates and drops the pair; a pair
    * whose chosen OR rejected response is EMPTY is dropped too — the
    * DPO loss is undefined with a zero-token plane ("no response" is
    * not a preference). Pass empty prompts freely; they are legal.
    *
    * @return (pair_id, shard, chosen_ids, chosen_mask, rejected_ids,
    *         rejected_mask) — masks positionally aligned with their
    *         ids arrays. */
  def dpoPairPack(
      pairs: DataFrame, idCol: Column, promptIdsCol: Column,
      chosenIdsCol: Column, rejectedIdsCol: Column,
      contextLen: Int, nShards: Int): DataFrame = {
    require(contextLen > 0 && nShards > 0,
      "contextLen and nShards must be positive")
    val ctx = lit(contextLen)
    // one plane: left-truncated prompt ++ right-truncated response,
    // mask aligned by the same keep counts
    def plane(p: Column, r: Column): (Column, Column) = {
      val keepP = least(size(p), greatest(lit(0), ctx - size(r)))
      val keepR = least(size(r), ctx - keepP)
      val ids = concat(
        slice(p, size(p) - keepP + 1, keepP),
        slice(r, lit(1), keepR))
      val mask = concat(
        transform(slice(p, size(p) - keepP + 1, keepP), _ => lit(0)),
        transform(slice(r, lit(1), keepR), _ => lit(1)))
      (ids, mask)
    }
    // Generate barrier: the three arrays become REAL attributes before
    // the plane arithmetic references them ~a dozen times each — in a
    // single fused Project, Catalyst inlines alias trees per use, so a
    // caller whose p/c/r derive from per-token hashing would pay the
    // tokenize once per REFERENCE (measured 4.3× on q166 before this;
    // explode(array(struct)) evaluates the inputs exactly once per row
    // and costs no exchange)
    val base = pairs.select(idCol.cast("long").as("pair_id"),
        explode(array(struct(
          promptIdsCol.cast("array<int>").as("p"),
          chosenIdsCol.cast("array<int>").as("c"),
          rejectedIdsCol.cast("array<int>").as("r")))).as("__t"))
      .select(col("pair_id"), col("__t.p").as("__p"),
        col("__t.c").as("__c"), col("__t.r").as("__r"))
    val (cIds, cMask) = plane(col("__p"), col("__c"))
    val (rIds, rMask) = plane(col("__p"), col("__r"))
    base
      .withColumn("shard",
        pmod(portable_hash(col("pair_id").cast("string")),
          lit(nShards.toLong)))
      .select(col("pair_id"), col("shard"),
        cIds.as("chosen_ids"), cMask.as("chosen_mask"),
        rIds.as("rejected_ids"), rMask.as("rejected_mask"))
      // null planes null-propagate the aggregate → filter drops them;
      // a zero mask sum means the response lost every token
      .filter(aggregate(col("chosen_mask"), lit(0), (a, m) => a + m) > 0 &&
        aggregate(col("rejected_mask"), lit(0), (a, m) => a + m) > 0)
  }
}
