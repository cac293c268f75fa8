package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Bucketed staging: co-located joins/aggregations read pre-shuffled
  * data — the Exchange disappears from the plan. */
class StagingSpec extends SparkSpec {
  import spark.implicits._

  test("bucketed tables join and aggregate without a shuffle exchange") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val a = (0 until 1000).map(k => (k % 25, k % 10, k.toDouble))
        .toDF("i", "j", "va")
      val b = (0 until 500).map(k => (k % 25, k % 10, (k * 2).toDouble))
        .toDF("i", "j", "vb")
      Staging.stageGrid(a, "graft_bucket_a", partitionCols = Nil, buckets = 4)
      Staging.stageGrid(b, "graft_bucket_b", partitionCols = Nil, buckets = 4)
      val ta = Staging.readTable(spark, "graft_bucket_a")
      val tb = Staging.readTable(spark, "graft_bucket_b")

      val joined = ta.join(tb, Seq("i", "j"))
      val jp = joined.queryExecution.executedPlan.toString
      assert(!jp.contains("Exchange"), jp) // co-located: no shuffle
      assert(joined.count() > 0)

      val agg = ta.groupBy("i", "j").agg(sum($"va"))
      val ap = agg.queryExecution.executedPlan.toString
      assert(!ap.contains("Exchange"), ap) // grouping on bucket keys: no shuffle
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_a")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_b")
    }
  }

  test("SortMerge weighted mean over a bucketed grid: the grid side joins with zero exchange") {
    // the huge-weight-table deployment shape (WeightJoin.SortMerge +
    // (i,j)-bucketed grid staging): exactly two exchanges in the whole
    // plan — the weight table shuffling into the grid's bucket layout,
    // and the group-key repartition of the join output (which also
    // satisfies the aggregation's distribution, so BOTH agg phases run
    // above it with per-task state bounded to groups/partition — the
    // spill guard for 10⁸-row weight tables). The 100 TB grid side: none.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t1 = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
      val g = (0 until 1000).map(k => (t1, k % 25, k % 10, k.toDouble))
        .toDF("time", "i", "j", "v")
      Staging.stageGrid(g, "graft_bucket_g", partitionCols = Nil, buckets = 4)
      val tg = Staging.readTable(spark, "graft_bucket_g")
      val w = (0 until 250).map(k => ((k % 50).toLong, k % 25, k % 10, 0.5))
        .toDF("fid", "i", "j", "wght")
      val out = graft.operators.WeightedMean(tg, w, Seq("v"),
        strategy = graft.operators.WeightJoin.SortMerge)
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      val exchanges = "Exchange".r.findAllIn(p).size
      assert(exchanges == 2,
        s"expected 2 exchanges (weights shuffle + final agg), got $exchanges:\n$p")
      assert(out.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_g")
    }
  }
}
