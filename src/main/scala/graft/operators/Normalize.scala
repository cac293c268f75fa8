package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.round6

/** Grouped feature STANDARDIZATION — z-scores per key, the
  * feature-pipeline normalization step — with EXACT moments: Σv and
  * Σv² accumulate as DECIMALs (exact for fixed-precision inputs, the
  * engine's money-sum policy applied to second moments), so mean and
  * variance are identical under any partitioning/aggregation order and
  * the per-row z value is exactly oracle-reproducible — a `rand()`-free
  * answer to "why did normalization differ between two runs".
  *
  * Scale: one map-side-combined hash aggregate to per-key (Σv, Σv², n)
  * — key-count-sized output — then a broadcast-friendly join back; the
  * data-plane rows never shuffle (AQE broadcasts the stats side).
  * Derived μ/σ arithmetic runs in double with a FIXED expression order
  * (μ = s1/n; σ² = s2/n − μ·μ) mirrored by the oracle. */
object Normalize {

  /** The exact-percentile family's state tripwire. Spark's exact
    * `percentile` buffers one (value → count) entry per DISTINCT value
    * per key — at 100 TB a single hot key with a high-cardinality
    * double domain is an executor-OOM vector (~24 B/distinct: 10⁸
    * distinct ≈ 2.4 GB in ONE aggregation buffer). The cure is the
    * mergeable [[Quantiles.histogramQuantiles]] bounds (the q65 dial),
    * but silently switching would change exact results — so this is a
    * GUARD, not a switch: an `approx_count_distinct` sketch (O(1)
    * mergeable state) rides the SAME aggregate pass, and the returned
    * plan fails fast with the dial's name when any key's distinct
    * estimate exceeds `maxDistinctPerKey` (same lazy broadcast-scalar
    * assert as semDedup's cluster guard — zero construction jobs,
    * message in the cause chain). Estimate, not exact — exactly right
    * for a tripwire whose failure mode is orders of magnitude, not
    * percent.
    *
    * The check is PER ROW on the `__cd` each joined row already
    * carries from the stats join — a codegen'd comparison in the
    * existing data plane, not a separate worst-case aggregate (an
    * earlier form re-aggregated the bounds subplan for a global max,
    * which re-ran the whole exact-percentile pass a second time per
    * action). Every key in the stats table has at least one joined
    * row by construction, so "any key over the threshold" and "any
    * row over it" trip identically — except a NULL-key group, whose
    * rows the equi-join drops anyway (see [[zscore]]'s NULL-key
    * contract: coalesce keys upstream if that stratum matters). */
  private[operators] def guardDistinctState(
      joined: DataFrame, op: String, maxDistinctPerKey: Long): DataFrame = {
    require(maxDistinctPerKey >= 1, "maxDistinctPerKey must be >= 1")
    joined.where(assert_true(
      col("__cd") <= lit(maxDistinctPerKey),
      lit(s"$op: a key holds more than $maxDistinctPerKey distinct " +
        "values (estimated) — exact percentile state is " +
        "O(distinct-per-key) and a hot key this wide risks executor " +
        "OOM. Use Quantiles.histogramQuantiles bounds for this " +
        "domain, or raise maxDistinctPerKey if the state is truly " +
        "affordable")).isNull)
  }

  /** @return df plus `z` = round6((v − μ_key)/σ_key); NULL when the
    * key's variance is 0 (constant groups have no z-score) or the
    * row's value is NULL. NULL values are excluded from the moments
    * (`count(v)`, and the decimal sums already skip them) — counting
    * them would bias μ/σ and make constant-plus-null groups emit
    * garbage z-scores.
    *
    * NULL-KEY rows are EXCLUDED from the output entirely: the join
    * back to the stats table is an equi-join on the keys, and SQL
    * equality never matches NULL — matching the semantics of the
    * GROUP BY + JOIN USING oracle mirror. Coalesce key columns
    * upstream if a NULL-key stratum should be normalized as its own
    * group. */
  def zscore(
      df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame = {
    require(keys.nonEmpty, "zscore needs at least one key column")
    val v = valueCol.cast("double")
    val stats = df.groupBy(keys.map(col): _*)
      .agg(
        sum(valueCol.cast("decimal(28,6)")).cast("double").as("__s1"),
        sum((valueCol.cast("decimal(18,6)") * valueCol.cast("decimal(18,6)"))
          .cast("decimal(38,12)")).cast("double").as("__s2"),
        count(v).cast("double").as("__n"))
    val mu = col("__s1") / col("__n")
    val variance = col("__s2") / col("__n") - mu * mu
    df.join(stats, keys)
      .withColumn("z",
        when(variance > 0, round6((v - mu) / sqrt(variance)))
          .otherwise(lit(null).cast("double")))
      .drop("__s1", "__s2", "__n")
  }

  /** WINSORIZED CLIPPING — per-key percentile capping, the outlier
    * treatment feature pipelines apply before scaling (zscore's
    * natural companion): values clip to the key's [pLo, pHi]
    * interpolated percentiles. Spark's exact `percentile` and DuckDB's
    * `quantile_cont` share the (n−1)·p linear-interpolation
    * definition (the q53 precedent), so the clipped values are
    * cross-engine exact with no rounding policy needed.
    *
    * NULL values stay NULL (explicit CASE — Spark's `greatest` would
    * otherwise silently promote a NULL value to the lower bound);
    * NULL-key rows are excluded by the equi-join, as in [[zscore]].
    *
    * Scale: one hash aggregate to key-count-sized bounds (exact
    * percentile state is O(distinct values) per key — for
    * heavy-cardinality value domains swap in the mergeable
    * [[Quantiles.histogramQuantiles]] bounds, the q65 dial), then a
    * broadcast-friendly join back; data-plane rows never shuffle. */
  def winsorize(
      df: DataFrame, keys: Seq[String], valueCol: Column,
      pLo: Double = 0.05, pHi: Double = 0.95,
      maxDistinctPerKey: Long = 4000000L): DataFrame = {
    require(keys.nonEmpty, "winsorize needs at least one key column")
    require(0.0 <= pLo && pLo < pHi && pHi <= 1.0,
      s"need 0 <= pLo < pHi <= 1, got ($pLo, $pHi)")
    val v = valueCol.cast("double")
    val bounds = df.groupBy(keys.map(col): _*)
      .agg(percentile(v, lit(pLo)).as("__lo"),
        percentile(v, lit(pHi)).as("__hi"),
        approx_count_distinct(v).as("__cd"))
    guardDistinctState(df.join(bounds, keys), "winsorize",
        maxDistinctPerKey)
      .withColumn("v_clipped",
        when(v.isNull, lit(null).cast("double"))
          .otherwise(least(greatest(v, col("__lo")), col("__hi"))))
      .drop("__lo", "__hi", "__cd")
  }

  /** ROBUST SCALING — (v − median) / IQR per key: the outlier-immune
    * normalization (z-score's μ/σ are dragged by the same heavy tails
    * a curation pipeline exists to handle; median/IQR are not). Same
    * machinery as [[winsorize]]: exact interpolated `percentile`
    * (≡ DuckDB `quantile_cont`, the q53 precedent) in one hash agg per
    * key, broadcast-friendly join back, NULL values pass through as
    * NULL. A zero IQR (over half the key's mass on one value) yields
    * NULL rather than ±Inf — the caller's signal that this key needs a
    * different treatment, not a silent blow-up.
    * @return df + `v_scaled`. */
  def robustScale(
      df: DataFrame, keys: Seq[String], valueCol: Column,
      maxDistinctPerKey: Long = 4000000L): DataFrame = {
    require(keys.nonEmpty, "robustScale needs at least one key column")
    import graft.functions.TextFunctions.round6
    val v = valueCol.cast("double")
    val stats = df.groupBy(keys.map(col): _*)
      .agg(percentile(v, lit(0.5)).as("__med"),
        (percentile(v, lit(0.75)) - percentile(v, lit(0.25))).as("__iqr"),
        approx_count_distinct(v).as("__cd"))
    guardDistinctState(df.join(stats, keys), "robustScale",
        maxDistinctPerKey)
      .withColumn("v_scaled",
        when(v.isNull || col("__iqr") === 0.0, lit(null).cast("double"))
          .otherwise(round6((v - col("__med")) / col("__iqr"))))
      .drop("__med", "__iqr", "__cd")
  }
}
