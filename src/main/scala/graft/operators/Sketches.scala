package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.PortableHash.portable_hash

/** Sketch-shaped aggregates beyond [[graft.functions.KmvDistinct]]:
  * a COUNT-MIN sketch built as a relational plan. The sketch itself is
  * an aggregation OUTPUT of fixed size (depth × width counters), so at
  * 100 TB the full scan collapses map-side into d·w longs per
  * partition before anything crosses the wire, and every downstream
  * step joins against a broadcast-sized table.
  *
  * The hash is the engine's cross-engine-reproducible
  * [[graft.functions.PortableHash]] with the row index as a seed
  * prefix, so the whole construction — including the over-estimates a
  * real CMS produces on colliding buckets — is exactly mirrorable in
  * the DuckDB oracle. */
object Sketches {

  /** The (depth × width) counter table: one row per (r, b) with the
    * summed count of keys hashing to bucket b under seed r. */
  def cmsSketch(df: DataFrame, keyCol: Column, depth: Int, width: Int): DataFrame =
    df.select(keyCol.cast("string").as("k"))
      .select(explode(array((0 until depth).map(r =>
        struct(lit(r).as("r"),
          pmod(portable_hash(concat_ws(":", lit(r.toString), col("k"))),
            lit(width.toLong)).as("b"))): _*)).as("e"))
      .groupBy(col("e.r").as("r"), col("e.b").as("b"))
      .agg(count(lit(1)).as("c"))

  /** HEAVY HITTERS via the sketch: keys whose CMS estimate
    * (min over depth rows of the key's bucket counter) reaches
    * `minCount`. Returns (key, est_count, exact_count) — the exact
    * count rides along so the over-estimate is visible/testable;
    * est ≥ exact always holds.
    *
    * Scale: the candidate side is the distinct-key aggregate (output-
    * sized); the sketch side is d·w rows and broadcast. In a true
    * 100 TB deployment the distinct-key pass is replaced by any
    * bounded candidate stream (e.g. per-partition top lists); the
    * estimate plan — broadcast sketch probe + min — is unchanged. */
  def cmsHeavyHitters(
      df: DataFrame, keyCol: Column, depth: Int, width: Int,
      minCount: Long): DataFrame = {
    val sketch = cmsSketch(df, keyCol, depth, width)
    val keys = df.select(keyCol.cast("string").as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("exact_count"))
    keys
      .select(col("k"), col("exact_count"),
        explode(array((0 until depth).map(r =>
          struct(lit(r).as("r"),
            pmod(portable_hash(concat_ws(":", lit(r.toString), col("k"))),
              lit(width.toLong)).as("b"))): _*)).as("e"))
      .join(broadcast(sketch),
        col("e.r") === sketch("r") && col("e.b") === sketch("b"))
      .groupBy(col("k"), col("exact_count"))
      .agg(min(col("c")).as("est_count"))
      .filter(col("est_count") >= minCount)
      .select(col("k").as("key"), col("est_count"), col("exact_count"))
  }
}
