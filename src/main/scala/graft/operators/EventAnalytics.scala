package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over the event stream. */
object EventAnalytics {

  /** OHLC (open/high/low/close) bars per (series, day) — the standard
    * time-series downsampling aggregate. First/last are resolved by
    * row_number over (ts, id) in both directions — deterministic under
    * ties and identical to the oracle's window (no engine-specific
    * first()/arg_min semantics); high/low/count are plain order-free
    * aggregates. One shuffle on the bar key; Spark folds both window
    * passes over the same sort. */
  def ohlcBars(
      events: DataFrame, typeCol: String = "event_type",
      tsCol: String = "ts", valueCol: String = "value",
      idCol: String = "event_id"): DataFrame = {
    val base = events.select(col(typeCol).as("series"),
      col(tsCol).cast("date").as("day"), col(tsCol).as("ts"),
      col(idCol).as("id"), col(valueCol).as("v"))
    val asc = Window.partitionBy(col("series"), col("day"))
      .orderBy(col("ts").asc, col("id").asc)
    val desc = Window.partitionBy(col("series"), col("day"))
      .orderBy(col("ts").desc, col("id").desc)
    base
      .withColumn("rn1", row_number().over(asc))
      .withColumn("rn2", row_number().over(desc))
      .groupBy(col("series"), col("day"))
      .agg(max(when(col("rn1") === 1, col("v"))).as("open"),
        max(col("v")).as("high"), min(col("v")).as("low"),
        max(when(col("rn2") === 1, col("v"))).as("close"),
        count(lit(1)).as("n"))
  }

  /** FUNNEL: per user, the first occurrence of each stage in order —
    * stage i+1 must happen strictly after the user's first completion
    * of stage i. Returns one row per user that entered the funnel:
    * (user_id, t1..tk nullable stage timestamps, stage = furthest
    * stage reached). First-touch semantics; `min(ts)` per stage makes
    * every step deterministic.
    *
    * Scale: k stage aggregates, each keyed on the user — the raw
    * stream collapses map-side to one row per (user, stage) before any
    * join, and each refinement join is aggregate-output ⋈ aggregate-
    * output on the user key, so AQE sizes them from real stats. No
    * window over the raw stream, no per-user event buffering. */
  def funnel(
      events: DataFrame, stages: Seq[String],
      typeCol: String = "event_type", userCol: String = "user_id",
      tsCol: String = "ts"): DataFrame = {
    require(stages.nonEmpty, "funnel needs at least one stage")
    val first = events.filter(col(typeCol) === stages.head)
      .groupBy(col(userCol)).agg(min(col(tsCol)).as("t1"))
    val full = stages.toSeq.zipWithIndex.drop(1).foldLeft(first) {
      case (acc, (stage, i)) =>
        val prev = s"t$i"; val cur = s"t${i + 1}"
        val nxt = events.filter(col(typeCol) === stage)
          .select(col(userCol), col(tsCol).as("__ts"))
          .join(acc.select(col(userCol), col(prev).as("__prev")), userCol)
          .filter(col("__ts") > col("__prev"))
          .groupBy(col(userCol)).agg(min(col("__ts")).as(cur))
        acc.join(nxt, Seq(userCol), "left")
    }
    val stageNum = (1 to stages.size).map(i => when(col(s"t$i").isNotNull, 1).otherwise(0))
      .reduce(_ + _)
    full.select(col(userCol) +: (1 to stages.size).map(i => col(s"t$i")) :+
      stageNum.as("stage"): _*)
  }
}
