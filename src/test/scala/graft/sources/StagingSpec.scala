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

  test("SortMergeTiled over a tile-bucketed grid: zero grid exchange AND partial agg below the one agg exchange") {
    // the round-11 ask #4 shape: vs plain SortMerge (whose 2nd
    // exchange repartitions RAW join rows), the tiled plan's 2nd
    // exchange carries PARTIAL aggregation rows — tile locality lets
    // map-side combine run safely, so the partial HashAggregate must
    // sit BELOW the (fid, time) exchange, and the grid side must still
    // join with zero exchange off its tile buckets.
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    // subset co-partitioning: the grid's HashPartitioning(tile) bucket
    // layout satisfies the (tile, i, j) join clustering, but by default
    // Spark demands ALL cluster keys for co-partition and reshuffles
    // both sides — this deployment conf is part of the tiled recipe
    // (documented on WeightJoin.SortMergeTiled)
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val t1 = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
      // 20×10 grid, tiles of 4×4 cells
      val g = (0 until 1000).map(k => (t1, k % 20, (k / 20) % 10, k.toDouble))
        .toDF("time", "i", "j", "v")
      Staging.stageGridTiled(g, "graft_bucket_tiled", tileW = 4, tileH = 4,
        partitionCols = Nil, buckets = 4)
      val tg = Staging.readTable(spark, "graft_bucket_tiled")
      // compact 2×1 footprints
      val w = (0 until 100).map { f =>
        Seq((f.toLong, (f * 2) % 20, f % 10, 0.5),
          (f.toLong, (f * 2 + 1) % 20, f % 10, 0.5))
      }.flatten.toDF("fid", "i", "j", "wght")
      val out = graft.operators.WeightedMean(tg, w, Seq("v"),
        strategy = graft.operators.WeightJoin.SortMergeTiled(4, 4))
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      // bucketed scan actually engaged (not "disabled by query planner")
      assert(p.contains("Bucketed: true"), p)
      // exactly 2 exchanges: weights → tile buckets, partial-agg rows →
      // (fid, time); the 100 TB grid side: none
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 2,
        s"expected 2 exchanges (weights→tile buckets + agg), got $exchanges:\n$p")
      // the weights exchange is on the TILE key alone (grid's bucket
      // spec), proving the grid's layout drove the co-partitioning
      assert(p.contains("Exchange hashpartitioning(tile"), p)
      // the agg exchange carries PARTIAL rows: the partial HashAggregate
      // prints BELOW (after) the (fid, time) exchange in the tree
      val aggEx = p.indexOf("Exchange hashpartitioning(fid")
      assert(aggEx >= 0, p)
      assert(p.indexOf("partial_sum", aggEx) > aggEx,
        s"no partial aggregate below the (fid,time) exchange:\n$p")
      assert(out.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_tiled")
    }
  }

  test("Auto resolves to SortMergeTiled on a tile-staged grid: staged geometry detected, confs set in one place, zero grid exchange") {
    // round-12 verdict ask #2: the measured 5.2×-less-shuffle tiled
    // plan must be reachable WITHOUT manual opt-in — Auto + an
    // over-threshold weight table + a stageGridTiled grid must produce
    // the exact plan the explicit SortMergeTiled(4,4) test above pins,
    // with WeightedMean itself supplying the subset-co-partition conf
    // (no per-caller conf juggling).
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val prevCoPart =
      spark.conf.getOption("spark.sql.requireAllClusterKeysForCoPartition")
    val prevOrd =
      spark.conf.getOption("spark.sql.legacy.bucketedTableScan.outputOrdering")
    try {
      val t1 = java.sql.Timestamp.valueOf("2021-01-01 00:00:00")
      val g = (0 until 1000).map(k => (t1, k % 20, (k / 20) % 10, k.toDouble))
        .toDF("time", "i", "j", "v")
      Staging.stageGridTiled(g, "graft_bucket_auto_tiled", tileW = 4,
        tileH = 4, partitionCols = Nil, buckets = 4)
      val tg = Staging.readTable(spark, "graft_bucket_auto_tiled")
      // the geometry survives the parquet/catalog round trip as field
      // metadata — that is what Auto keys on
      assert(Staging.tileGeometry(tg) === Some((4, 4)))
      val w = (0 until 100).flatMap { f =>
        Seq((f.toLong, (f * 2) % 20, f % 10, 0.5),
          (f.toLong, (f * 2 + 1) % 20, f % 10, 0.5))
      }.toDF("fid", "i", "j", "wght")
      val out = graft.operators.WeightedMean(tg, w, Seq("v")) // strategy = Auto
      // WeightedMean set the deployment confs itself (the "one place")
      assert(spark.conf
        .get("spark.sql.requireAllClusterKeysForCoPartition") === "false")
      assert(spark.conf
        .get("spark.sql.legacy.bucketedTableScan.outputOrdering") === "true")
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      val exchanges = "Exchange hashpartitioning".r.findAllIn(p).size
      assert(exchanges == 2,
        s"expected 2 exchanges (weights→tile buckets + agg), got $exchanges:\n$p")
      assert(p.contains("Exchange hashpartitioning(tile"), p)
      // result identity with the broadcast strategy over the same input
      val bc = graft.operators.WeightedMean(tg, w, Seq("v"),
        strategy = graft.operators.WeightJoin.Broadcast)
      assert(rows(out) == rows(bc))
      assert(out.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      prevCoPart match {
        case Some(v) =>
          spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", v)
        case None =>
          spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      }
      prevOrd match {
        case Some(v) =>
          spark.conf.set("spark.sql.legacy.bucketedTableScan.outputOrdering", v)
        case None =>
          spark.conf.unset("spark.sql.legacy.bucketedTableScan.outputOrdering")
      }
      spark.sql("DROP TABLE IF EXISTS graft_bucket_auto_tiled")
    }
  }

  test("tiled staging composes with time partitioning: partition PRUNING and the zero-exchange join together") {
    // the deployment layout at 100 TB: partitionBy(day) for F3 time
    // pruning (directories skipped, not read) AND tile buckets for the
    // weighted-mean join — the two must compose in one plan: the scan
    // shows a partition filter, stays bucketed, and the join still
    // needs no grid-side exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.requireAllClusterKeysForCoPartition", "false")
    try {
      val g = (0 until 2000).map { k =>
        (if (k % 2 == 0) "2021-01-01" else "2021-01-02",
          k % 20, (k / 20) % 10, k.toDouble)
      }.toDF("day", "i", "j", "v")
        .select(col("day").cast("date").as("day"),
          col("day").cast("date").cast("timestamp").as("time"),
          col("i"), col("j"), col("v"))
      Staging.stageGridTiled(g, "graft_bucket_tiled_part",
        tileW = 4, tileH = 4, partitionCols = Seq("day"), buckets = 4)
      val tg = Staging.readTable(spark, "graft_bucket_tiled_part")
        .filter(col("day") === lit("2021-01-01").cast("date"))
      val w = (0 until 50).map(f =>
        (f.toLong, (f * 2) % 20, f % 10, 0.5)).toDF("fid", "i", "j", "wght")
      val out = graft.operators.WeightedMean(tg, w, Seq("v"),
        strategy = graft.operators.WeightJoin.SortMergeTiled(4, 4))
      val p = out.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(p.contains("Bucketed: true"), p)
      // the day predicate became a PARTITION filter (pruned at listing,
      // not a data filter over read rows)
      assert(p.contains("PartitionFilters: [") &&
        p.replaceAll("(?s).*PartitionFilters: \\[([^\\]]*)\\].*", "$1")
          .contains("day"), p)
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 2, p)
      // values: equal to the broadcast strategy over the same subset
      val bc = graft.operators.WeightedMean(tg, w, Seq("v"),
        strategy = graft.operators.WeightJoin.Broadcast)
      assert(rows(out) == rows(bc))
      assert(out.count() > 0)
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.requireAllClusterKeysForCoPartition")
      spark.sql("DROP TABLE IF EXISTS graft_bucket_tiled_part")
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
