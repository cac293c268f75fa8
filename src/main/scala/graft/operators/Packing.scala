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
