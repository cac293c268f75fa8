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
    val counts = docs.filter(col(sourceCol).isin(mix.keys.toSeq: _*))
      .groupBy(col(sourceCol)).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    mix.keys.foreach(s =>
      require(counts.contains(s), s"no documents of source '$s'"))
    val total = mix.map { case (s, p) =>
      math.floor(counts(s) / p).toLong }.min
    val quotas = mix.map { case (s, p) =>
      s -> math.floor(total * p).toLong }
    val h = portable_hash(repeat(
      concat(lit(s"$seed:"), col("id").cast("string"), lit(";")), 3))
    val bySource = Window.partitionBy(col("source"))
      .orderBy(col("__h"), col("id"))
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col("id"))
    docs
      .select(col(idCol).cast("long").as("id"), col(sourceCol).as("source"))
      .filter(col("source").isin(mix.keys.toSeq: _*))
      .withColumn("__h", h)
      .withColumn("__r", row_number().over(bySource).cast("long") - 1)
      .filter(col("__r") < element_at(typedLit(quotas), col("source")))
      .withColumn("shard", col("__r") % nShards)
      .withColumn("pos", row_number().over(byShard).cast("long") - 1)
      .select(col("shard"), col("pos"), col("id"), col("source"))
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
      val bySource = Window.partitionBy(col("source"))
        .orderBy(col("__h"), col("id"))
      val byShard = Window.partitionBy(col("shard"))
        .orderBy(col("__h"), col("id"))
      sel
        .withColumn("__h", he)
        .withColumn("__r", row_number().over(bySource).cast("long") - 1)
        .withColumn("shard", col("__r") % nShards)
        .withColumn("__p", row_number().over(byShard).cast("long") - 1)
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
    val byShard = Window.partitionBy(col("shard"))
      .orderBy(col("__h"), col("id"))
    val tail = docs
      .filter(isAnneal && col(sourceCol).isin(mix.keys.toSeq: _*))
      .select(col(idCol).cast("long").as("id"), col(sourceCol).as("source"))
      .withColumn("__h", h1)
      .withColumn("shard", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("__r", row_number().over(byShard).cast("long") - 1)
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

  /** Shared head of the assigned-order paths: join token arrays onto
    * the (shard, pos, id) assignment and derive each doc's stream
    * offset via the per-shard cumulative sum. Zero-token docs occupy
    * no stream space and are excluded. */
  private def assignedOffsets(
      assigned: DataFrame, docs: DataFrame, idCol: Column,
      tokenIdsCol: Column): DataFrame = {
    val w = Window.partitionBy(col("shard")).orderBy(col("pos"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val toks = docs.select(idCol.cast("long").as("id"),
      tokenIdsCol.cast("array<int>").as("ids"))
    assigned.select(col("shard"), col("pos"), col("id"))
      .join(toks, "id")
      .withColumn("cum", sum(size(col("ids")).cast("long")).over(w))
      .withColumn("start_off", col("cum") - size(col("ids")))
      .filter(size(col("ids")) > 0)
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
}
