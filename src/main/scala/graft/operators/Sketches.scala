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
    sketchOfKeys(df.select(keyCol.cast("string").as("k")), depth, width)

  private def sketchOfKeys(ks: DataFrame, depth: Int, width: Int): DataFrame =
    ks.select(explode(array((0 until depth).map(r =>
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
    * Scale shape: two projected columnar key scans (sketch build +
    * key-count aggregate — different grains; shared aggregates below
    * them dedupe via AQE exchange reuse); the CANDIDATE
    * STREAM probing the broadcast sketch is then BOUNDED to
    * `candBuckets · candPerBucket` rows regardless of vocabulary — per
    * deterministic hash-bucket of the key space, only the top
    * `candPerBucket` keys by (count desc, key asc) survive, selected by
    * the bounded-heap [[graft.functions.TopKBy]] aggregate (O(k) state,
    * map-side partials — never a per-bucket sort). Every step is
    * deterministic (portable hash buckets, total-order tie rule), so
    * the bounding itself is exactly oracle-mirrorable: a key outside
    * its bucket's top list is dropped by BOTH engines. Choose
    * candBuckets·candPerBucket ≥ the number of keys that can reach
    * minCount (≤ stream/minCount) and the bounding is lossless.
    *
    * `checkLossless` (default ON) verifies that promise against the
    * data: every key whose EXACT count reaches minCount must survive
    * the bucket capping, else the job fails fast with a raise-the-caps
    * message instead of silently under-reporting. The check is one
    * left-anti count over the two aggregation outputs (vocabulary- and
    * cap-sized — cheap) folded INTO the returned plan as a broadcast
    * scalar guarded by `assert_true`, so construction stays fully lazy
    * (zero Spark jobs — spec-pinned) and the verification piggybacks
    * on the action's own query execution, reusing the counts/cand
    * exchanges. The failure therefore surfaces at ACTION time (wrapped in
    * Spark's job-failure exception), not at call time. Disable only
    * when truncation is acceptable (e.g. exploratory top-N
    * dashboards). Estimate-only qualifiers
    * (est ≥ minCount > exact, a sketch-collision artifact) are outside
    * the guarantee — catching those would need the unbounded probe this
    * operator exists to avoid.
    *
    * NULL-key contract: rows whose key is NULL are EXCLUDED — from the
    * sketch, the candidates, and the output. A NULL key carries no
    * identity worth reporting, and the bounded-heap candidate aggregate
    * skips NULL ids by design, so admitting NULLs upstream would make
    * the lossless guarantee unsatisfiable (a qualifying NULL group
    * could never surface as a candidate). Pre-coalesce upstream if a
    * NULL bucket must be counted. */
  def cmsHeavyHitters(
      df: DataFrame, keyCol: Column, depth: Int, width: Int,
      minCount: Long, candBuckets: Int = 64, candPerBucket: Int = 128,
      checkLossless: Boolean = true): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    require(candBuckets >= 1 && candPerBucket >= 1,
      "candBuckets and candPerBucket must be >= 1")
    // No mid-plan checkpoints: under AQE even a LAZY localCheckpoint
    // materializes its shuffle map stages at construction (Dataset.rdd
    // forces stage materialization), so true laziness requires ONE
    // query execution. The shared subplans below (counts feeds both the
    // candidate build and the guard; cand feeds both the guard and the
    // probe) dedupe at runtime via AQE exchange reuse — their shuffle
    // exchanges are canonically identical, so each map stage runs once.
    // The raw key stream is scanned twice (sketch build + key counts,
    // different aggregation grains); at scale two projected columnar
    // scans beat spilling the whole key column to executor disk.
    val ks = df.select(keyCol.cast("string").as("k"))
      .filter(col("k").isNotNull) // NULL-key contract (see scaladoc)
    val sketch = sketchOfKeys(ks, depth, width)
    val counts = ks.groupBy(col("k")).agg(count(lit(1)).as("exact_count"))
    val cand = counts
      .groupBy(pmod(portable_hash(col("k")), lit(candBuckets.toLong)).as("bkt"))
      .agg(top_k_by(col("exact_count").cast("double"), col("k"),
        candPerBucket).as("tk"))
      .select(explode(col("tk")).as("p"))
      .select(col("p.id").as("k"), col("p.v").cast("long").as("exact_count"))
    val guarded = if (checkLossless) {
      // lazy lossless guard: a 1-row broadcast scalar (count of
      // qualifying keys that fell outside the top lists) cross-joined
      // into the candidate stream and asserted per row. assert_true
      // returns NULL when the condition holds, so the filter keeps
      // every row; a violation fails the first ACTION with the
      // raise-the-caps message. Construction runs zero jobs.
      val dropped = counts.filter(col("exact_count") >= minCount)
        .join(cand, Seq("k"), "left_anti")
        .agg(count(lit(1)).as("dropped_cnt"))
      cand.crossJoin(broadcast(dropped))
        .where(assert_true(col("dropped_cnt") === 0,
          lit(s"cmsHeavyHitters: key(s) with exact count >= $minCount " +
            s"fell outside the per-bucket top lists — raise candBuckets " +
            s"($candBuckets) / candPerBucket ($candPerBucket), or pass " +
            "checkLossless = false to accept truncation")).isNull)
        .drop("dropped_cnt")
    } else cand
    guarded
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
