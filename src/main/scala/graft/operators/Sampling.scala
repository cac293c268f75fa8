package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.portable_hash

/** Deterministic sampling for training-data pipelines.
  *
  * Hash-based, not `rand()`-based: the keep/drop decision is a pure
  * function of the row's id, so a sample is (a) reproducible across
  * runs, engines and cluster layouts — an external oracle can verify
  * it row-for-row, and a re-run after a failure selects the SAME
  * training set; (b) a pure narrow filter — no shuffle, no state, it
  * pushes into the scan like any predicate; (c) stable under
  * repartitioning, unlike `df.sample` whose output depends on
  * partition boundaries and seed plumbing.
  *
  * Stratified form: per-stratum percentage rates (e.g. downsample the
  * dominant language, keep all of a rare one) — the standard knob for
  * rebalancing a web corpus before training. */
object Sampling {

  /** Keep rows whose id-hash lands under `pct` % — a deterministic
    * `pct`-percent sample. `idCol` is stringified, so any key type
    * works and the oracle's rendering is byte-identical. */
  def hashSample(df: DataFrame, idCol: Column, pct: Int): DataFrame =
    df.filter(pmod(portable_hash(idCol.cast("string")), lit(100L)) < pct)

  /** Deterministic per-group cap ("keep at most k rows per domain" —
    * the standard anti-overrepresentation knob): the k survivors per
    * group are those with the SMALLEST id-hash, i.e. a uniform
    * priority sample that is stable across runs and engines. Built on
    * [[graft.functions.TopKBy]], so it is one hash aggregation with
    * O(k) state per group and map-side partials — no per-group sort,
    * no window. Returns group columns + id + rank (1 = smallest hash). */
  def perGroupCap(
      df: DataFrame, groupCols: Seq[String], idCol: Column, k: Int): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    val gs = groupCols.map(col)
    // the hash rides on the STRINGIFIED source id (hashSample's
    // any-key-type contract); the long form is only the output carrier.
    // A non-numeric id would cast to null and be SILENTLY dropped by
    // the aggregate's null guard — fail loudly instead.
    df.select(gs ++ Seq(idCol.cast("long").as("__id"),
        when(idCol.isNotNull && idCol.cast("long").isNull,
            raise_error(concat(lit("perGroupCap: id not castable to long: "),
              idCol.cast("string"))))
          .otherwise(-portable_hash(idCol.cast("string")).cast("double"))
          .as("__p")): _*)
      .groupBy(gs: _*)
      .agg(top_k_by(col("__p"), col("__id"), k).as("tk"))
      .select(gs ++ Seq(posexplode(col("tk")).as(Seq("pos", "p"))): _*)
      .select(gs ++ Seq(col("p.id").as("id"),
        (col("pos") + 1).cast("int").as("rank")): _*)
  }

  /** Per-stratum deterministic sampling: `rates` maps stratum value →
    * keep percentage; strata not listed use `defaultPct`. */
  def stratifiedHashSample(
      df: DataFrame, idCol: Column, stratumCol: Column,
      rates: Map[String, Int], defaultPct: Int): DataFrame = {
    val rateCol = rates.foldLeft(lit(defaultPct)) { case (acc, (s, r)) =>
      when(stratumCol === lit(s), lit(r)).otherwise(acc)
    }
    df.filter(pmod(portable_hash(idCol.cast("string")), lit(100L)) < rateCol)
  }

  /** WEIGHTED sampling without replacement (k winners, probability ∝
    * weight), deterministic: the Efraimidis–Spirakis A-ES scheme with
    * HASH-derived uniforms — each row gets u = (portable_hash(id)+1) /
    * (Mod+1) ∈ (0,1] and priority ln(u)/w (the log-domain form of
    * u^(1/w), monotone-equivalent and better conditioned), and the k
    * highest priorities win. Same inputs → same sample on any engine
    * or partitioning, and the selection is a bounded-heap aggregate
    * ([[graft.functions.TopKBy]]): O(k) state, map-side partials, no
    * global sort — the scale form of weighted reservoir sampling.
    * Priorities are rounded to 6dp before ranking (id breaks ties), so
    * the choice is robust to ln() ulp differences across engines.
    * Rows with weight ≤ 0 are excluded (zero mass cannot win).
    * @return (id, priority, rank) best-first. */
  def weightedSample(
      df: DataFrame, idCol: Column, weightCol: Column, k: Int): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    import graft.functions.{PortableHash, TextFunctions}
    require(k >= 1, "k must be >= 1")
    val u = (portable_hash(idCol.cast("string")) + lit(1L)).cast("double") /
      lit((PortableHash.Mod + 1).toDouble)
    val pr = TextFunctions.round6(log(u) / weightCol.cast("double"))
    df.filter(weightCol.cast("double") > 0)
      .select(pr.as("p"), idCol.cast("long").as("id"))
      .agg(top_k_by(col("p"), col("id"), k).as("tk"))
      .select(posexplode(col("tk")).as(Seq("pos", "s")))
      .select(col("s.id").as("id"), col("s.v").as("priority"),
        (col("pos") + 1).cast("int").as("rank"))
  }

  /** Per-GROUP weighted sampling without replacement — the per-domain
    * curation pick ("k best-weighted docs from EACH source"): the same
    * Efraimidis–Spirakis hash-derived priorities as [[weightedSample]],
    * selected by a bounded-heap aggregate PER GROUP — O(k) state per
    * group, map-side partials, one hash-agg exchange on the group key,
    * no windows, no per-group sort. Rows with weight ≤ 0 are excluded.
    * @return group columns + (id, priority, rank) best-first. */
  def weightedSamplePerGroup(
      df: DataFrame, groupCols: Seq[String], idCol: Column,
      weightCol: Column, k: Int): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    import graft.functions.{PortableHash, TextFunctions}
    require(k >= 1, "k must be >= 1")
    require(groupCols.nonEmpty, "groupCols must be non-empty")
    val gs = groupCols.map(col)
    val u = (portable_hash(idCol.cast("string")) + lit(1L)).cast("double") /
      lit((PortableHash.Mod + 1).toDouble)
    val pr = TextFunctions.round6(log(u) / weightCol.cast("double"))
    df.filter(weightCol.cast("double") > 0)
      .select(gs ++ Seq(pr.as("__p"), idCol.cast("long").as("__id")): _*)
      .groupBy(gs: _*)
      .agg(top_k_by(col("__p"), col("__id"), k).as("tk"))
      .select(gs ++ Seq(posexplode(col("tk")).as(Seq("pos", "s"))): _*)
      .select(gs ++ Seq(col("s.id").as("id"), col("s.v").as("priority"),
        (col("pos") + 1).cast("int").as("rank")): _*)
  }

  /** SOURCE-MIX REBALANCING — downsample each group so the output's
    * group proportions hit `targetShares` (the corpus-assembly step
    * that turns "whatever the crawl yielded" into "40% en, 20% zh, …"
    * before training). Sampling can only REMOVE rows, so the output is
    * the largest corpus achievable at exactly the target mix: the
    * binding group (smallest n_g/s_g) is kept ~fully and every other
    * group is thinned to match. Selection is the same deterministic
    * hash predicate as [[hashSample]] at 1/`resolution` granularity —
    * reproducible across runs/engines/partitionings, and exactly
    * oracle-mirrorable.
    *
    * Scale shape: pass 1 computes per-group counts — a column-pruned
    * scan reading ONLY the group column into a map-side-combined hash
    * agg whose output is |groups| rows; the feasibility scalar
    * (min n/s) and per-group thresholds stay lazy as 1-row/tiny
    * DataFrames cross-joined in. Pass 2 is the output scan: a
    * BROADCAST join against the |groups|-row threshold table plus a
    * narrow hash filter — no wide shuffle of data rows anywhere, at
    * any corpus size.
    *
    * Contract: groups not in `targetShares` are dropped; a share group
    * absent from the data is ignored by feasibility (the target mix is
    * then unreachable for that group — it contributes zero rows).
    * Thresholds use floor, so the binding group may shed up to 1 row
    * in `resolution` to FP rounding — deterministic and mirrored. */
  def mixSample(
      df: DataFrame, idCol: Column, groupCol: Column,
      targetShares: Map[String, Double],
      resolution: Long = 1000000L): DataFrame = {
    require(targetShares.nonEmpty, "targetShares must be non-empty")
    require(targetShares.values.forall(_ > 0), "target shares must be positive")
    require(math.abs(targetShares.values.sum - 1.0) < 1e-9,
      s"target shares must sum to 1, got ${targetShares.values.sum}")
    val shareMap = typedLit(targetShares)
    val cnt = df.select(groupCol.cast("string").as("__g"))
      .filter(element_at(shareMap, col("__g")).isNotNull)
      .groupBy(col("__g"))
      .agg(count(lit(1)).cast("double").as("__n"))
      .withColumn("__s", element_at(shareMap, col("__g")))
    val nOut = cnt.agg(min(col("__n") / col("__s")).as("__nout"))
    val thr = cnt.crossJoin(broadcast(nOut))
      .select(col("__g"),
        floor(lit(resolution.toDouble) * col("__s") * col("__nout") / col("__n"))
          .cast("long").as("__thr"))
    // The raw base-31 fold is SMALL for short ids (a 4-char id hashes
    // below ~2e6), so at fine granularity its value is not uniform —
    // scramble exactly as KmvDistinct does (g = A·(h+1) mod M) before
    // taking the bucket. portable_hash is non-negative, so plain % is
    // safe and mirrors the oracle's % directly.
    val bucket =
      (lit(graft.functions.KmvDistinct.Scramble) *
        (portable_hash(idCol.cast("string")) + lit(1L))) %
        lit(graft.functions.PortableHash.Mod) % lit(resolution)
    df.join(broadcast(thr), groupCol.cast("string") === col("__g"))
      .filter(bucket < col("__thr"))
      .drop("__g", "__thr")
  }

  /** TEMPERATURE (power-law) source sampling — the multilingual-
    * pretraining reweighting (mT5/XLM-R): draw from source s in
    * proportion to C_s^α; α < 1 flattens source imbalance, so
    * low-population sources are RELATIVELY upsampled (at α → 0 every
    * source contributes equally, at α = 1 sampling is proportional).
    * Formulated with an explicit per-unit budget instead of a
    * normalized probability: source s contributes its first
    * ⌊unitBudget · C_s^α⌋ docs in the SEEDED permutation order (the
    * same 3×-repeated-string portable-hash key as
    * [[Packing.shuffleShards]], and the same reason). No cross-source
    * FP sum anywhere, so the quota arithmetic is bit-mirrorable by an
    * external oracle — at α = 0.5 the power is `sqrt`, correctly
    * rounded IEEE in every engine (q117); other α go through `pow`,
    * whose last-ulp behavior is engine-specific — keep those off
    * hash-compared surfaces.
    *
    * Scale: the counts collect is |sources|-bounded; the selection is
    * one per-source rank ([[Packing.rankByHash]] — adaptively
    * blocked at volume, so the |sources|-reducer funnel never appears
    * at scale) over narrow (id, source, hash) rows — document
    * payloads join back by id downstream.
    * @return (id, source, pos) — pos is the doc's seeded rank within
    *         its source (0-based, dense over the selected set). */
  def temperatureSample(
      docs: DataFrame, idCol: String, sourceCol: String,
      alpha: Double, unitBudget: Double, seed: Long): DataFrame = {
    require(alpha > 0 && alpha <= 1, "alpha must be in (0, 1]")
    require(unitBudget > 0, "unitBudget must be positive")
    // one-shot deterministic side action: AQE-off (Par.withoutAqe)
    val counts = Par.withoutAqe(docs.sparkSession)(
        docs.groupBy(col(sourceCol)).count().collect())
      .map(r => r.get(0).toString -> r.getLong(1)).toMap
    val quotas = counts.map { case (s, c) =>
      val powered =
        if (alpha == 0.5) math.sqrt(c.toDouble)
        else if (alpha == 1.0) c.toDouble
        else math.pow(c.toDouble, alpha)
      s -> math.floor(unitBudget * powered).toLong
    }
    val h = portable_hash(repeat(
      concat(lit(s"$seed:"), col("id").cast("string"), lit(";")), 3))
    // per-source rank via Packing's adaptive form: a plain per-source
    // window funnels the corpus through |sources| reducer tasks at
    // scale, so big inputs take the hash-range-blocked two-level path
    Packing.rankByHash(
      docs
        .select(col(idCol).cast("long").as("id"),
          col(sourceCol).cast("string").as("source"))
        .withColumn("__h", h),
      "source", "pos")
      .filter(col("pos") < element_at(typedLit(quotas), col("source")))
      .select(col("id"), col("source"), col("pos"))
  }

  /** GROUP-RELATIVE ADVANTAGE — the reward-normalization step of
    * GRPO-style RLHF training data (public recipe: sample a GROUP of
    * responses per prompt, score each with the reward model, and use
    * the within-group standardized reward as the advantage —
    * Shao et al. 2024, DeepSeekMath; no value model, the group IS the
    * baseline): advantage = (r − mean_group) / std_group, population
    * std; a zero-variance group (all rewards equal — nothing to
    * prefer) gets advantage 0 by contract.
    *
    * Float discipline: group Σr and Σr² accumulate as exact decimals
    * (rewards are round6 values, so DECIMAL(18,6) casts are lossless
    * and the (36,12) products exact — the q24 money-sum pattern), so
    * mean/std are order-free; the final advantage is round6.
    *
    * Scale shape: ONE map-side-combined groupBy to |groups| stat rows
    * joined back group-keyed (AQE broadcasts when groups are few;
    * co-partitioned hash otherwise) — rewards never sort, nothing
    * corpus-scale beyond the one aggregate + join.
    * @return (id, group_id, reward, n, advantage). */
  def groupRelativeAdvantage(
      df: DataFrame, idCol: Column, groupCol: Column,
      rewardCol: Column): DataFrame = {
    import graft.functions.TextFunctions.round6
    val dec = "decimal(18,6)"
    val base = df.select(idCol.cast("long").as("id"),
      groupCol.cast("long").as("grp"),
      rewardCol.cast("double").as("reward"))
    val stats = base.groupBy(col("grp")).agg(
      count(lit(1)).as("n"),
      sum(col("reward").cast(dec)).cast("double").as("__sr"),
      sum(col("reward").cast(dec) * col("reward").cast(dec))
        .cast("double").as("__sr2"))
    base.join(stats, "grp")
      .withColumn("__mean", col("__sr") / col("n"))
      .withColumn("__std", sqrt(greatest(lit(0.0),
        col("__sr2") / col("n") - col("__mean") * col("__mean"))))
      .select(col("id"), col("grp").as("group_id"), col("reward"),
        col("n"),
        when(col("__std") > 0.0,
          round6((col("reward") - col("__mean")) / col("__std")))
          .otherwise(lit(0.0)).as("advantage"))
  }

  /** REJECTION-SAMPLING (BEST-OF-N) DATASET BUILDER — the
    * RFT/Llama-2 data recipe (public: sample N responses per prompt,
    * score with the reward model, keep the reward-argmax — optionally
    * only when it clears a floor — and fine-tune on the winners;
    * Yuan et al. 2023 RFT, Touvron et al. 2023 §3.2.2): per group the
    * winner is the (reward DESC, id ASC) argmax — deterministic ties —
    * with `margin` = winner − runner-up (0 for singleton groups and
    * exact ties: the "how confidently best" audit column), emitted
    * only when the winner's reward ≥ `minReward`.
    *
    * Scale shape: ONE map-side-combined aggregate using the
    * [[graft.functions.TopKBy]] bounded-heap (O(2) state per group —
    * no per-group sort, no window over the corpus); everything after
    * is |groups|-sized.
    * @return (id, group_id, reward, margin, n_candidates). */
  def bestOfN(
      df: DataFrame, idCol: Column, groupCol: Column, rewardCol: Column,
      minReward: Double = Double.NegativeInfinity): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    import graft.functions.TextFunctions.round6
    df.select(idCol.cast("long").as("id"),
        groupCol.cast("long").as("group_id"),
        rewardCol.cast("double").as("reward"))
      .groupBy(col("group_id"))
      .agg(count(lit(1)).as("n_candidates"),
        top_k_by(col("reward"), col("id"), 2).as("__tk"))
      .select(col("group_id"), col("n_candidates"),
        // get() (0-based, null on missing index): a singleton group
        // has no runner-up — ANSI array apply would throw
        get(col("__tk"), lit(0)).getField("id").as("id"),
        get(col("__tk"), lit(0)).getField("v").as("reward"),
        round6(get(col("__tk"), lit(0)).getField("v") -
          coalesce(get(col("__tk"), lit(1)).getField("v"),
            get(col("__tk"), lit(0)).getField("v"))).as("margin"))
      .filter(col("reward") >= minReward)
      .select(col("id"), col("group_id"), col("reward"), col("margin"),
        col("n_candidates"))
  }

  /** DoReMi-SHAPE DOMAIN REWEIGHTING — the mixture-weight tuning step
    * of multi-source pretraining (public recipe: Xie et al. 2023,
    * "DoReMi: Optimizing Data Mixtures Speeds Up Language Model
    * Pretraining" — Group-DRO exponentiated-gradient updates over
    * per-domain EXCESS loss, then smoothing toward uniform; the
    * excess-loss reference here is the α-weighted mixture loss itself,
    * re-centered each round, with the per-domain losses held static —
    * the proxy/reference model pair of the paper is out of scope for a
    * data engine, the update DYNAMICS are the published ones):
    *
    *  - per-domain loss `L_d` = mean of `lossCol` over the domain's
    *    docs (DECIMAL(28,6) exact sum — order-free, the q24 money-sum
    *    pattern);
    *  - α₀ uniform; each round t: mix = Σ_d α·L_d, excess_d =
    *    max(0, L_d − mix), α ∝ α·exp(η·excess_d), renormalized —
    *    every scalar step rounded to 6 decimals (the q147 classifier
    *    convention) so the whole trajectory replays bit-exactly in an
    *    unrolled SQL oracle;
    *  - final weight = (1−c)·α_T + c/|D| (the paper's uniform
    *    smoothing).
    *
    * Scale shape: ONE corpus-scale aggregate (the per-domain loss
    * groupBy — map-side combined, |D| output rows), then `rounds`
    * iterations of |D|-row arithmetic: tiny aggregates crossJoined
    * back (the q147 in-plan iteration pattern — weights never leave
    * the plan, nothing corpus-scale ever re-shuffles). |D| is a driver
    * scalar (bounded plan parameter — domains are a curated handful).
    * @return (domain, n_docs, loss, weight) — weight the smoothed
    *         round-`rounds` mixture weight, round6. */
  def doremiWeights(
      perDoc: DataFrame, domainCol: Column, lossCol: Column,
      rounds: Int = 8, eta: Double = 0.5,
      smoothing: Double = 0.1): DataFrame = {
    require(rounds >= 1, "rounds must be >= 1")
    require(eta > 0, "eta must be positive")
    require(smoothing >= 0 && smoothing <= 1, "smoothing must be in [0,1]")
    import graft.functions.TextFunctions.round6
    val dom = perDoc
      .select(domainCol.cast("string").as("domain"),
        lossCol.cast("double").as("__l"))
      .groupBy(col("domain"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__l").cast("decimal(28,6)")).as("__s"))
      .select(col("domain"), col("n_docs"),
        round6(col("__s").cast("double") / col("n_docs").cast("double"))
          .as("loss"))
      .localCheckpoint(eager = false) // |D| rows; feeds every round
    val d = dom.count() // |D|: bounded driver scalar
    require(d >= 1, "doremiWeights: no domains")
    // The EG rounds are pure |D|-row arithmetic over STATIC per-domain
    // losses, so the whole trajectory folds into one single-partition
    // WINDOW CHAIN: each round's two global sums (mix, z) are frame-wide
    // window aggregates over the same SinglePartition exchange, and the
    // per-domain update is row-local arithmetic between them. Same
    // expressions (round6 steps, decimal-exact sums — order-free, so
    // window vs agg is bit-identical), but ONE exchange + one stage for
    // all rounds instead of per-round agg + crossJoin + localCheckpoint
    // jobs (the old form paid ~4 scheduled jobs per round; at |D| rows
    // the round-trip latency was the entire cost — guide §2.4, shared
    // exchange). Plan grows linearly in rounds: each select references
    // the previous round's columns by NAME, so Catalyst keeps the
    // window operators stacked on the one exchange.
    val win = Window.partitionBy()
    def wsum(c: Column): Column =
      round6(sum(c.cast("decimal(28,6)")).over(win).cast("double"))
    var alpha = dom.select(col("domain"), col("n_docs"), col("loss"),
      round6(lit(1.0) / lit(d.toDouble)).as("alpha"))
    for (_ <- 1 to rounds) {
      alpha = alpha
        .withColumn("__mix", wsum(round6(col("alpha") * col("loss"))))
        .withColumn("__w", round6(col("alpha") * exp(lit(eta) *
          round6(greatest(lit(0.0), round6(col("loss") - col("__mix")))))))
        .withColumn("__z", wsum(col("__w")))
        .select(col("domain"), col("n_docs"), col("loss"),
          round6(col("__w") / col("__z")).as("alpha"))
    }
    alpha.select(col("domain"), col("n_docs"), col("loss"),
      round6(lit(1.0 - smoothing) * col("alpha") +
        lit(smoothing / d.toDouble)).as("weight"))
  }

  /** Deterministic TRAIN/VAL/TEST split — every training pipeline's
    * first partitioning step, as a pure hash predicate: the id's
    * portable-hash bucket (mod 100) is cut by cumulative percentage
    * boundaries, so membership is a per-row computed column — no
    * shuffle, no sampling state, stable across runs, engines and
    * re-partitioning, and a row can never land in two splits. New data
    * joins the same splits its ids hash to (the property that keeps a
    * held-out set held out as the corpus grows).
    * @param splits (label, percent) in order; percents must sum to 100.
    * @return df plus a `split` label column. */
  def hashSplit(
      df: DataFrame, idCol: Column, splits: Seq[(String, Int)]): DataFrame = {
    require(splits.map(_._2).sum == 100, "split percents must sum to 100")
    require(splits.forall(_._2 > 0), "split percents must be positive")
    val bucket = pmod(portable_hash(idCol.cast("string")), lit(100L))
    val bounds = splits.scanLeft(0) { case (acc, (_, p)) => acc + p }.tail
    val label = splits.zip(bounds).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(bucket < hi, lit(name)).otherwise(acc)
      }
    df.withColumn("split", label)
  }

  /** LEAKAGE-SAFE train/val/test split — [[hashSplit]] keyed on the
    * near-dup CLUSTER rather than the document: every member of a
    * duplicate cluster hashes through its `canon_id`, so near-copies
    * of a training document can never land in val/test (the
    * contamination mode a per-doc split invites the moment the corpus
    * contains duplicates — the reason corpus pipelines split AFTER
    * dedup clustering, on the cluster). Same stability properties as
    * [[hashSplit]]: membership is a computed column of `canon_id`,
    * so growing a cluster never moves it between splits.
    *
    * Scale shape: one equi-join of docs against the O(V) label table
    * (`clusters` is [[Dedup.duplicateClusters]] output — doc_id,
    * canon_id, ...), then per-row arithmetic; no shuffle beyond the
    * join. Docs absent from `clusters` are their own singleton
    * cluster (canon_id = doc_id), matching duplicateClusters'
    * coalesce rule.
    * @return df plus `canon_id` and `split` columns. */
  def leakageSafeSplit(
      df: DataFrame, idCol: Column, clusters: DataFrame,
      splits: Seq[(String, Int)]): DataFrame = {
    val lab = clusters.select(col("doc_id").cast("long").as("__lss_id"),
      col("canon_id").cast("long").as("canon_id"))
    val joined = df
      .join(lab, idCol.cast("long") === col("__lss_id"), "left")
      .drop("__lss_id")
      .withColumn("canon_id",
        coalesce(col("canon_id"), idCol.cast("long")))
    hashSplit(joined, col("canon_id"), splits)
  }

  /** TOKEN-BUDGET DATA SELECTION — keep the highest-scoring documents
    * until a token budget fills (the DCLM/FineWeb-style selection step:
    * "train on the best B tokens", not "the best p %"): docs ordered by
    * (score DESC, id ASC — a strict total order), selected while the
    * cumulative token count stays ≤ `budget` (inclusive; the first doc
    * that would overflow is dropped, as are all below it).
    *
    * The global running sum is computed TWO-LEVEL, never as one
    * all-rows window (a single-reducer sort of the corpus):
    *  1. block = floor(score · 10⁶) — MONOTONE in score (equal scores
    *     share a block; the global (score desc) order refines the
    *     (block desc) order), and that monotonicity is the ONLY
    *     property the construction needs: step 3 re-orders within a
    *     block by the true score, so a 6-dp score that double
    *     arithmetic floors into the adjacent lower block (the
    *     0.29·100 = 28.999… class) merely widens that block's
    *     tie-class. Do NOT lean on block ⇔ score bijectivity (e.g. by
    *     ordering within a block by id alone) — it does not hold.
    *     Scores in [0, 1] keep the block-aggregate table ≤ 10⁶+1 rows
    *     regardless of corpus size;
    *  2. per-block token sums prefix-sum over the ASCENDING-block
    *     window on that bounded table (higher blocks first in the
    *     global order ⇒ offset = Σ tokens of strictly-higher blocks),
    *     broadcast back;
    *  3. within-block running sum via a window PARTITIONED by block —
    *     rows per reducer bounded by the largest score tie-class, not
    *     the corpus.
    * All arithmetic is exact longs; ties break by id, so the selected
    * SET is bit-stable across engines and layouts.
    *
    * @param scoreCol  double in [0, 1], 6-dp-rounded (quantization
    *                  must be lossless for cross-engine identity)
    * @return (id, score, n_tokens, cum_tokens) for selected docs —
    *         cum_tokens the inclusive global running total. */
  def selectByTokenBudget(
      docs: DataFrame, idCol: Column, scoreCol: Column,
      nTokensCol: Column, budget: Long): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val base = docs.select(idCol.cast("long").as("id"),
        scoreCol.cast("double").as("score"),
        nTokensCol.cast("long").as("n_tokens"))
      .withColumn("__blk", floor(col("score") * lit(1000000L)).cast("long"))
    val wOff = Window.orderBy(col("__blk").desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = base.groupBy(col("__blk"))
      .agg(sum(col("n_tokens")).as("__bt"))
      .withColumn("__boff", coalesce(sum(col("__bt")).over(wOff), lit(0L)))
      .select(col("__blk"), col("__boff"))
    val wCum = Window.partitionBy(col("__blk"))
      .orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base.join(broadcast(offs), Seq("__blk"))
      .withColumn("cum_tokens",
        col("__boff") + sum(col("n_tokens")).over(wCum))
      .filter(col("cum_tokens") <= budget)
      .select(col("id"), col("score"), col("n_tokens"), col("cum_tokens"))
  }
}
