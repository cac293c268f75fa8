package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions.round6

/** Approximate quantiles at scale via a FIXED-BIN HISTOGRAM sketch —
  * the mergeable, order-independent alternative to exact per-group
  * sorts. Bin counts are a plain hash aggregation (map-side combined,
  * mergeable across partitions/streams by addition), so the full pass
  * over a 100 TB column reduces to (keys × bins) longs before anything
  * crosses the wire; the quantile read-off interpolates inside the
  * covering bin. Every step — binning, cumulative counts, linear
  * interpolation — is integer/deterministic-double arithmetic, so
  * unlike t-digest/KLL (merge-order-dependent centroids) the estimate
  * is exactly reproducible in an external oracle.
  *
  * Accuracy: error ≤ bin width, i.e. (max−min)/bins per key — the
  * right trade for distribution monitoring dashboards; exact
  * percentiles (q53) remain the spot-check tool. */
object Quantiles {

  /** Per-key histogram quantile estimates at probabilities `ps`.
    * Returns (key, p, est, n); bin range is each key's own [min, max].
    * The covering bin for target t = p·n is the first with
    * cum ≥ t > cum_prev; est = lo + (bin + (t − cum_prev)/cnt)·width
    * (all expression order mirrored by the oracle). */
  def histogramQuantiles(
      df: DataFrame, keyCol: Column, valueCol: Column,
      bins: Int, ps: Seq[Double]): DataFrame = {
    require(bins > 1 && ps.nonEmpty && ps.forall(p => p > 0 && p < 1))
    // NULL values are excluded up front: they would otherwise count in n
    // and land in a NULL bin whose window ordering differs between
    // engines (Spark NULLS FIRST asc vs DuckDB NULLS LAST), breaking the
    // exact-oracle reproducibility this operator guarantees.
    val base = df.select(keyCol.as("key"), valueCol.cast("double").as("v"))
      .filter(col("v").isNotNull)
    val stats = base.groupBy(col("key"))
      .agg(min(col("v")).as("lo"), max(col("v")).as("hi"),
        count(lit(1)).as("n"))
    // bin id: per-row deterministic double math; top edge folds into
    // the last bin; degenerate single-value keys take bin 0
    val binned = base.join(stats, "key")
      .withColumn("bin",
        when(col("hi") === col("lo"), lit(0L)).otherwise(
          least(floor((col("v") - col("lo")) / (col("hi") - col("lo")) * bins),
            lit(bins - 1L))).cast("long"))
      .groupBy(col("key"), col("bin")).agg(count(lit(1)).as("cnt"))
      .join(stats, "key")
    val wCum = Window.partitionBy(col("key")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val cum = binned
      .withColumn("cum", sum(col("cnt")).over(wCum))
      .withColumn("cum_prev", col("cum") - col("cnt"))
    val probes = cum.select(col("key"), col("bin"), col("cnt"),
      col("lo"), col("hi"), col("n"), col("cum"), col("cum_prev"),
      explode(array(ps.map(lit): _*)).as("p"))
    probes
      .withColumn("t", col("p") * col("n").cast("double"))
      .filter(col("cum").cast("double") >= col("t") &&
        col("cum_prev").cast("double") < col("t"))
      .select(col("key"), col("p"),
        round6(col("lo") +
          (col("bin").cast("double") +
            (col("t") - col("cum_prev").cast("double")) / col("cnt").cast("double")) *
          ((col("hi") - col("lo")) / bins)).as("est"),
        col("n"))
  }
}
