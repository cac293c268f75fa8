package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** A3/U2 — ensemble-axis statistics for the CFSv2 forecast pipeline
  * (SURVEY.md §2.4, §2.6).
  *
  * Method 1 (`etl.py:296-298`): exact median across the 48-member `ens`
  * axis per (time, j, i) cell. The reference materializes this through a
  * Dask cluster (`etl.py:236-242`) and `.compute()`; here it is a single
  * shuffle-based hash aggregation — `median` is Spark's exact built-in
  * (not `approx_percentile`), matching the reference's `np.median`
  * semantics (average of the two middle members for even counts).
  *
  * Method 2 keeps `ens` as a grouping key end-to-end (see
  * [[WeightedMean.apply]] `extraKeys`), replacing the reference's
  * per-member loop + `xr.concat` (`etl.py:354-380`) with one aggregation —
  * U2's concat disappears entirely in relational form.
  */
object EnsembleStats {

  /** Exact per-cell ensemble median of each value column.
    * Input: long-form grid with an `ens` column; output: one row per
    * (time, j, i) with the ensemble axis collapsed. */
  def ensembleMedian(grid: DataFrame, valueCols: Seq[String]): DataFrame = {
    require(valueCols.nonEmpty)
    val aggs = valueCols.map(v => median(col(v)).as(v))
    grid.groupBy(col("time"), col("j"), col("i"))
      .agg(aggs.head, aggs.tail: _*)
  }

  /** U2/F10 — ensemble concat: stack per-member frames along a new `ens`
    * axis (`xr.concat` + `assign_coords`, `etl.py:354-358`). Preferred
    * form keeps `ens` a grouping key end-to-end ([[graft.operators.WeightedMean]]
    * `extraKeys`); this exists for sources that genuinely arrive as
    * separate member tables. */
  def concatMembers(members: Seq[DataFrame]): DataFrame = {
    require(members.nonEmpty)
    members.zipWithIndex
      .map { case (df, n) => df.withColumn("ens", lit(n)) }
      .reduce(_ unionByName _)
  }
}
