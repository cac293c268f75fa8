package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.{PortableHash, TextFunctions}
import graft.functions.TextFunctions.round6
import graft.functions.PortableHash.portable_hash

/** DSIR — Data Selection via Importance Resampling (Xie et al.,
  * NeurIPS 2023): pick raw-corpus documents whose hashed n-gram
  * distribution looks like a trusted TARGET corpus, by resampling
  * proportionally to the importance ratio p_target/p_raw estimated
  * over hashed token buckets. The selection step GPT-3/PaLM-style
  * pipelines run between the crawl and training ("keep what looks
  * like Wikipedia/books"), and the principled cousin of [[Classifier]]
  * (DSIR needs no labels beyond membership of the target set).
  *
  * Determinism contract (replayed op-for-op by the q148 oracle):
  *  - bucket j = portable_hash(token) mod `dim` (the q147 feature
  *    hash); per-doc bucket counts are exact longs;
  *  - bucket log-probs lt_j = round6(ln((ct_j+1)/(Tt+dim))) and
  *    lr_j = round6(ln((cr_j+1)/(Tr+dim))) — add-one smoothing, each
  *    ln's INPUT an exact IEEE division of integer-valued doubles and
  *    its output re-rounded to the 6dp grid (the q75 ln discipline);
  *    λ_j = lt_j − lr_j is a difference ON the grid — exact;
  *  - per-doc log-weight logw = Σ_j c_j·λ_j: integer × 6dp products
  *    are exact 6dp values, summed as DECIMAL(28,6) — order-free at
  *    any partitioning;
  *  - Gumbel-max resampling: u = (portable_hash(id)+1)/(Mod+2)
  *    ∈ (0,1) strictly (Mod+2, not A-ES's Mod+1: u=1 would send the
  *    nested log to −∞), d1 = max(round6(−ln u), 10⁻⁶) (the floor
  *    keeps the second ln finite when −ln u rounds to 0; both engines
  *    clamp identically), g = round6(−ln d1) — d1 is ON the grid so
  *    the second ln sees bit-identical input cross-engine; key =
  *    logw + g (grid + grid = exact). Top-k keys win: exactly a
  *    weighted sample ∝ exp(logw) without replacement (the Gumbel-max
  *    trick — [[Sampling.weightedSample]]'s A-ES form in log domain,
  *    safe for log-weights of either sign where exp(logw) would
  *    under/overflow).
  *
  * Scale shape: TWO tokenize passes over the corpus, neither caching
  * anything (caching the exploded token rows at 100 TB would pin
  * corpus-scale storage against execution memory — measured OOM at
  * the 240M-token stress point; re-tokenizing is a cheap scan-side
  * map). Pass 1 reduces tokens straight to the `dim`-row bucket
  * table (perfect map-side combine — the aggregate state is dim
  * entries per task, never per-doc); its totals stay lazy as a
  * cross-joined scalar and λ is a dim-row BROADCAST. Pass 2 joins
  * each token's λ map-side and feeds ONE hash aggregation on the doc
  * id whose DECIMAL partials collapse per partition — summing λ
  * once per token is exactly Σ c·λ on the 6dp grid, so no per-doc
  * bucket-count table (per-(doc,bucket) cardinality!) ever exists.
  * Selection is the bounded-heap [[graft.functions.TopKBy]]
  * aggregate: O(k) state, map-side partials, no global sort. At
  * 100 TB: one dim-row exchange + one doc-id exchange of partial
  * sums, nothing proportional to text bytes.
  */
object Dsir {

  /** Per-document hashed-unigram log importance weights against the
    * target subset selected by `targetCol` (DSIR's "raw = the pool,
    * target = the trusted corpus"; a physically separate target table
    * is the union of the two with `targetCol` as the side marker).
    * Token-less docs are excluded (no evidence either way).
    * @return (id, logw) */
  def importanceWeights(
      docs: DataFrame, idCol: String, textCol: String, targetCol: Column,
      dim: Int): DataFrame = {
    require(dim >= 2, "dim must be >= 2")
    def tokd = docs.select(col(idCol).cast("long").as("id"),
        targetCol.cast("boolean").as("tgt"),
        explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .select(col("id"), col("tgt"),
        pmod(portable_hash(col("tok")), lit(dim)).as("j"))
    val b = tokd.groupBy(col("j"))
      .agg(sum(when(col("tgt"), lit(1L)).otherwise(lit(0L))).as("ct"),
        count(lit(1)).as("cr"))
    val t = b.agg(sum(col("ct")).as("tt"), sum(col("cr")).as("tr"))
    val lam = b.crossJoin(t).select(col("j"),
      (round6(log((col("ct") + lit(1L)).cast("double") /
          (col("tt") + lit(dim.toLong)).cast("double"))) -
        round6(log((col("cr") + lit(1L)).cast("double") /
          (col("tr") + lit(dim.toLong)).cast("double")))).as("lam"))
    tokd.join(broadcast(lam), Seq("j"))
      .groupBy(col("id"))
      .agg(sum(col("lam").cast("decimal(28,6)")).as("s"))
      .select(col("id"), col("s").cast("double").as("logw"))
  }

  /** Importance-resample `k` docs ∝ exp(logw) (Gumbel-max top-k over
    * hash-derived uniforms), annotated on the full weight table.
    * @return (id, logw, key, rank) — key/rank NULL for unsampled docs,
    * rank 1 = first drawn. */
  def resample(
      docs: DataFrame, idCol: String, textCol: String, targetCol: Column,
      dim: Int, k: Int): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    require(k >= 1, "k must be >= 1")
    val w = importanceWeights(docs, idCol, textCol, targetCol, dim)
    val u = (portable_hash(col("id").cast("string")) + lit(1L))
      .cast("double") / lit((PortableHash.Mod + 2).toDouble)
    val d1 = greatest(round6(-log(u)), lit(1e-6))
    val key = col("logw") + round6(-log(d1))
    val winners = w.select(key.as("p"), col("id"))
      .agg(top_k_by(col("p"), col("id"), k).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("s.id").as("id"), col("s.v").as("key"),
        (col("pos") + 1).cast("int").as("rank"))
    w.join(winners, Seq("id"), "left")
  }
}
