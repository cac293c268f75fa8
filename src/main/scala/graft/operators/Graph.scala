package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Graph analytics over pair lists (the dedup-cluster edge sets,
  * citation/link graphs). Connected components live in
  * [[Dedup.duplicateClusters]]; this adds PageRank.
  *
  * DETERMINISM BY DESIGN: ranks are carried as 64-bit integer
  * micro-units (SCALE = 10¹²) and every per-edge contribution uses
  * floor division — so the per-node incoming sums are exact integer
  * arithmetic, immune to FP addition order, and the whole fixed
  * iteration is bit-reproducible in any engine. The rounding error is
  * ≤ outdeg ulps of 10⁻¹² per node per round — far below any
  * analytical use of PageRank, and a price worth paying for an
  * exactly verifiable distributed computation.
  */
object Graph {

  val Scale: Long = 1000000000000L // 1e12 micro-rank units

  /** Fixed-iteration PageRank (damping 0.85) over an undirected pair
    * list: each (a_id, b_id) pair contributes edges both ways. Returns
    * (id, rank) with rank in [0,1] doubles = micro-units/10¹².
    * Vertices = docs (isolated docs hold the base rank).
    *
    * Scale: per round, one join of edges ⋈ ranks (both keyed on the
    * vertex id) + one sum aggregate — the standard O(E) Pregel round
    * as two shuffles; ranks/degrees are O(V) aggregation outputs.
    * Dangling mass is NOT redistributed (documented simplification —
    * isolated/dangling vertices keep base rank). `localCheckpoint`
    * per round keeps the plan from growing with iterations.
    *
    * PRECONDITION: `docs` must carry one row per vertex id. Duplicate
    * ids would silently inflate n (skewing the base rank) — deduping
    * here would add an O(V) shuffle every caller with unique ids (the
    * engine's document tables) pays for nothing, so the contract is
    * on the caller. An empty vertex set is rejected outright. */
  def pageRank(
      docs: DataFrame, idCol: String, pairs: DataFrame,
      iters: Int = 3): DataFrame = {
    val verts = docs.select(col(idCol).cast("long").as("id"))
    val edges = pairs
      .select(explode(array(
        struct(col("a_id").cast("long").as("src"), col("b_id").cast("long").as("dst")),
        struct(col("b_id").cast("long").as("src"), col("a_id").cast("long").as("dst"))))
        .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .localCheckpoint(eager = false)
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("deg"))
    val n = verts.count()
    require(n > 0, "pageRank needs a non-empty vertex set (docs has 0 rows)")
    val base = Scale * 15L / 100L / n
    var ranks = verts.select(col("id"), lit(Scale / n).as("r"))
      .localCheckpoint(eager = false)
    for (_ <- 1 to iters) {
      // contribution per edge: (r·85 DIV 100) DIV deg — integer DIV,
      // not `/` (Spark's Column `/` is always DOUBLE division)
      val contribs = edges.join(ranks, edges("src") === ranks("id"))
        .join(outdeg, "src")
        .select(col("dst"), expr("r * 85L DIV 100L DIV deg").as("c"))
        .groupBy(col("dst")).agg(sum(col("c")).as("in_sum"))
      ranks = verts
        .join(contribs.withColumnRenamed("dst", "id"), Seq("id"), "left")
        .select(col("id"),
          (lit(base) + coalesce(col("in_sum"), lit(0L))).as("r"))
        .localCheckpoint(eager = false)
    }
    ranks.select(col("id"),
      (col("r").cast("double") / lit(Scale.toDouble)).as("rank"))
  }
}
