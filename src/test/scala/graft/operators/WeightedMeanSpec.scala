package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** A1/A2 vs hand-computed values (SURVEY.md §5 strategy 1). */
class WeightedMeanSpec extends SparkSpec {
  import spark.implicits._

  private val t1 = Timestamp.valueOf("2021-01-01 00:00:00")
  private val t2 = Timestamp.valueOf("2021-01-02 00:00:00")

  // feature 1 covers cells (0,0) w=0.25 and (1,0) w=0.75
  // feature 2 covers cell  (1,0) w=1.0
  private def weights = Seq(
    (1L, 0, 0, 0.25), (1L, 1, 0, 0.75), (2L, 1, 0, 1.0)
  ).toDF("fid", "i", "j", "wght")

  private def grid = Seq(
    (t1, 0, 0, Some(10.0)), (t1, 1, 0, Some(20.0)),
    (t2, 0, 0, None), (t2, 1, 0, Some(40.0))
  ).toDF("time", "i", "j", "v")

  test("plain weighted mean matches hand computation") {
    val out = WeightedMean(grid, weights, Seq("v"))
      .filter($"time" === t1).orderBy("fid")
      .select("fid", "v").as[(Long, Double)].collect()
    // f1: (0.25*10 + 0.75*20) / 1.0 = 17.5 ; f2: 20.0
    assert(out.toSeq == Seq((1L, 17.5), (2L, 20.0)))
  }

  test("plain mean poisons on any missing contributing cell") {
    val out = WeightedMean(grid, weights, Seq("v"))
      .filter($"time" === t2).orderBy("fid")
      .select("fid", "v").collect()
    assert(out(0).isNullAt(1))              // f1 touches the null cell
    assert(out(1).getDouble(1) == 40.0)     // f2 does not
  }

  test("masked mean renormalizes over valid cells") {
    val out = WeightedMean(grid, weights, Seq("v"), masked = true)
      .filter($"time" === t2).orderBy("fid")
      .select("fid", "v").as[(Long, Double)].collect()
    // f1: (0.75*40)/(0.75) = 40 ; f2: 40
    assert(out.toSeq == Seq((1L, 40.0), (2L, 40.0)))
  }

  test("preCombine=true gives identical results (incl. duplicate cells)") {
    // duplicate rows per cell — the case preCombine exists for
    val dup = grid.union(grid).union(
      Seq((t1, 0, 0, Some(30.0))).toDF("time", "i", "j", "v"))
    for (masked <- Seq(false, true)) {
      val plain = WeightedMean(dup, weights, Seq("v"), masked = masked)
      val pre = WeightedMean(dup, weights, Seq("v"), masked = masked, preCombine = true)
      val a = plain.select($"fid", $"time", round($"v", 9).as("v"))
      val b = pre.select($"fid", $"time", round($"v", 9).as("v"))
      assert(rows(a) == rows(b), s"masked=$masked")
    }
  }

  test("SortMerge strategy gives identical results to broadcast (all variants)") {
    val dup = grid.union(grid)
    for (masked <- Seq(false, true); pre <- Seq(false, true)) {
      val bc = WeightedMean(dup, weights, Seq("v"), masked = masked,
        preCombine = pre, strategy = WeightJoin.Broadcast)
      val sm = WeightedMean(dup, weights, Seq("v"), masked = masked,
        preCombine = pre, strategy = WeightJoin.SortMerge)
      val a = bc.select($"fid", $"time", round($"v", 9).as("v"))
      val b = sm.select($"fid", $"time", round($"v", 9).as("v"))
      assert(rows(a) == rows(b), s"masked=$masked preCombine=$pre")
    }
  }

  test("SortMergeTiled gives identical results to broadcast (all variants, tile-straddling footprints)") {
    // footprints deliberately CROSS tile boundaries (tiles are 2×2
    // cells; feature 3 spans cells in two tiles) — correctness must
    // not depend on the locality the strategy optimizes for
    val w3 = weights.union(Seq((3L, 1, 0, 0.5), (3L, 2, 0, 0.5))
      .toDF("fid", "i", "j", "wght"))
    val g3 = grid.union(Seq((t1, 2, 0, Option(60.0)), (t2, 2, 0, Option(6.0)))
      .toDF("time", "i", "j", "v"))
    val dup = g3.union(g3)
    for (masked <- Seq(false, true); pre <- Seq(false, true)) {
      val bc = WeightedMean(dup, w3, Seq("v"), masked = masked,
        preCombine = pre, strategy = WeightJoin.Broadcast)
      val tiled = WeightedMean(dup, w3, Seq("v"), masked = masked,
        preCombine = pre, strategy = WeightJoin.SortMergeTiled(2, 2))
      val a = bc.select($"fid", $"time", round($"v", 9).as("v"))
      val b = tiled.select($"fid", $"time", round($"v", 9).as("v"))
      assert(rows(a) == rows(b), s"masked=$masked preCombine=$pre")
      // and the join really is sort-merge with no broadcast
      val p = tiled.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("BroadcastHashJoin"), p)
    }
  }

  test("ens as extra grouping key replaces the member loop") {
    val g = Seq(
      (t1, 0, 0, 0, 10.0), (t1, 1, 0, 0, 20.0),
      (t1, 0, 1, 0, 100.0), (t1, 1, 1, 0, 200.0)
    ).toDF("time", "ens", "i", "j", "v")
    val out = WeightedMean(g, weights, Seq("v"), extraKeys = Seq("ens"))
      .filter($"fid" === 1).orderBy("ens")
      .select("ens", "v").as[(Int, Double)].collect()
    // ens 0: 0.25·10 + 0.75·100 = 77.5 ; ens 1: 0.25·20 + 0.75·200 = 155
    assert(out.toSeq == Seq((0, 77.5), (1, 155.0)))
  }

  test("multi-variable aggregation in one pass") {
    val g = Seq((t1, 0, 0, 10.0, 1.0), (t1, 1, 0, 20.0, 3.0))
      .toDF("time", "i", "j", "a", "b")
    val out = WeightedMean(g, weights, Seq("a", "b"))
      .filter($"fid" === 1).select("a", "b").as[(Double, Double)].head()
    assert(out == ((17.5, 2.5)))
  }
}
