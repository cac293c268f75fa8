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
    * Scale shape: ONE projected key scan (lazy localCheckpoint) feeds
    * both the sketch build and the key-count aggregate; the CANDIDATE
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
    * the bucket capping, else the call fails fast with a raise-the-caps
    * message instead of silently under-reporting. The check is one
    * left-anti count over the two aggregation outputs (vocabulary- and
    * cap-sized — cheap), and it runs EAGERLY at call time (this call
    * materializes the key counts and candidates — with the guard on,
    * construction is not lazy); disable only when truncation is
    * acceptable (e.g. exploratory top-N dashboards) — that path stays
    * fully lazy. Estimate-only qualifiers
    * (est ≥ minCount > exact, a sketch-collision artifact) are outside
    * the guarantee — catching those would need the unbounded probe this
    * operator exists to avoid. */
  def cmsHeavyHitters(
      df: DataFrame, keyCol: Column, depth: Int, width: Int,
      minCount: Long, candBuckets: Int = 64, candPerBucket: Int = 128,
      checkLossless: Boolean = true): DataFrame = {
    import graft.functions.TopKBy.top_k_by
    require(candBuckets >= 1 && candPerBucket >= 1,
      "candBuckets and candPerBucket must be >= 1")
    val ks = df.select(keyCol.cast("string").as("k"))
      .localCheckpoint(eager = false) // sketch + counts read ONE scan
    val sketch = sketchOfKeys(ks, depth, width)
    // with the lossless check on, counts/cand each gain a second
    // consumer → lazy-checkpoint them so their aggregations run once
    val counts0 = ks.groupBy(col("k")).agg(count(lit(1)).as("exact_count"))
    val counts =
      if (checkLossless) counts0.localCheckpoint(eager = false) else counts0
    val cand0 = counts
      .groupBy(pmod(portable_hash(col("k")), lit(candBuckets.toLong)).as("bkt"))
      .agg(top_k_by(col("exact_count").cast("double"), col("k"),
        candPerBucket).as("tk"))
      .select(explode(col("tk")).as("p"))
      .select(col("p.id").as("k"), col("p.v").cast("long").as("exact_count"))
    val cand =
      if (checkLossless) cand0.localCheckpoint(eager = false) else cand0
    if (checkLossless) {
      val dropped = counts.filter(col("exact_count") >= minCount)
        .join(cand, Seq("k"), "left_anti").count()
      require(dropped == 0L,
        s"cmsHeavyHitters: $dropped key(s) with exact count >= $minCount " +
          s"fell outside the per-bucket top lists — raise candBuckets " +
          s"($candBuckets) / candPerBucket ($candPerBucket), or pass " +
          "checkLossless = false to accept truncation")
    }
    cand
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
