package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered-sequence analytics over the event stream. */
object EventAnalytics {

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
