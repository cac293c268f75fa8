package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
}
