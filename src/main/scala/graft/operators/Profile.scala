package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE-PASS table profiling — the corpus-QA / data-contract utility
  * (per-column null counts, distinct-count estimates, min/max) every
  * ingestion pipeline runs before training on a new drop. Columns
  * profile in batched aggregate jobs: per column the plan carries a
  * non-null count, a KMV distinct sketch over the portable hash
  * (O(k) mergeable state — never a per-column count-distinct expand),
  * and native-type min/max rendered to strings only at output. Each
  * batch's scan collapses map-side to one stats row per task; the
  * result is |columns| rows.
  *
  * Batching (`batchCols`, default 64): a single aggregate with
  * 4·|columns| expressions blows past Janino's generated-method limits
  * on wide feature tables (1000 columns → 4000 agg expressions) and
  * falls back to interpreted evaluation. Each batch is its own
  * aggregate unioned at the end; column pruning means batch scans read
  * only their own columns, so total bytes read equal the single-pass
  * form — the batches just pipeline as separate codegen-sized stages.
  * A ≤ 64-column table produces the identical single-aggregate plan as
  * before.
  *
  * Deterministic end to end (counts, order-free KMV estimate, native
  * min/max), so the profile — including the ESTIMATES — is exactly
  * oracle-checkable.
  *
  * Rendering contract: ndv hashing and min/max output cast values to
  * strings with the ENGINE's rendering. For floating-point columns the
  * oracle parity therefore assumes values whose decimal rendering
  * agrees between Spark and the oracle engine — i.e. magnitudes inside
  * the fixed-notation range (roughly |x| ∈ [1e-3, 1e16) or exact
  * zero); doubles at scientific-notation thresholds render differently
  * ("1.0E16" vs "1e+16") across engines. Cross-engine-canonical
  * alternatives (hex-float %a, %.17e) have their own engine-specific
  * formatting divergences (exponent digits, NaN case, last-digit
  * rounding mode), so the engine rendering is kept and the contract
  * documented instead. Integer, string, date and timestamp columns are
  * unaffected. */
object Profile {

  /** @return one row per column:
    * (column, n_rows, n_nulls, ndv_est, min_val, max_val). */
  def profile(df: DataFrame, kmvK: Int = 64, batchCols: Int = 64): DataFrame = {
    import graft.functions.KmvDistinct.kmv_distinct
    import graft.functions.PortableHash.portable_hash
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "profile needs at least one column")
    require(batchCols >= 1, "batchCols must be >= 1")
    cols.grouped(batchCols).map { batch =>
      val aggs = batch.flatMap { c =>
        Seq(
          count(col(c)).as(s"__cnt_$c"),
          kmv_distinct(portable_hash(col(c).cast("string")), kmvK)
            .as(s"__ndv_$c"),
          min(col(c)).cast("string").as(s"__min_$c"),
          max(col(c)).cast("string").as(s"__max_$c"))
      }
      val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
      val entries = batch.map { c =>
        struct(lit(c).as("column"),
          (col("__total") - col(s"__cnt_$c")).as("n_nulls"),
          col(s"__ndv_$c").as("ndv_est"),
          col(s"__min_$c").as("min_val"),
          col(s"__max_$c").as("max_val"))
      }
      one.select(col("__total").as("n_rows"), explode(array(entries: _*)).as("p"))
        .select(col("p.column").as("column"), col("n_rows"),
          col("p.n_nulls").as("n_nulls"), col("p.ndv_est").as("ndv_est"),
          col("p.min_val").as("min_val"), col("p.max_val").as("max_val"))
    }.reduce(_ unionByName _)
  }
}
