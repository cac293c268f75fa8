package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** ONE-PASS table profiling — the corpus-QA / data-contract utility
  * (per-column null counts, distinct-count estimates, min/max) every
  * ingestion pipeline runs before training on a new drop. All columns
  * profile in a SINGLE aggregate job: per column the plan carries a
  * non-null count, a KMV distinct sketch over the portable hash
  * (O(k) mergeable state — never a per-column count-distinct expand),
  * and native-type min/max rendered to strings only at output. The
  * whole scan collapses map-side to one stats row per task; the result
  * is |columns| rows.
  *
  * Deterministic end to end (counts, order-free KMV estimate, native
  * min/max), so the profile — including the ESTIMATES — is exactly
  * oracle-checkable. */
object Profile {

  /** @return one row per column:
    * (column, n_rows, n_nulls, ndv_est, min_val, max_val). */
  def profile(df: DataFrame, kmvK: Int = 64): DataFrame = {
    import graft.functions.KmvDistinct.kmv_distinct
    import graft.functions.PortableHash.portable_hash
    val cols = df.columns.toSeq
    require(cols.nonEmpty, "profile needs at least one column")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"__cnt_$c"),
        kmv_distinct(portable_hash(col(c).cast("string")), kmvK)
          .as(s"__ndv_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(count(lit(1)).as("__total"), aggs: _*)
    val entries = cols.map { c =>
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
  }
}
