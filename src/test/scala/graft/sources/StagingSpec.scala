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
}
