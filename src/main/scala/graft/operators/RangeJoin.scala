package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Temporal proximity join — the interval/range-join family member the
  * training-data pipeline actually uses ("all events within ±r of each
  * anomaly", "sensor readings around each failure"). The reference's
  * availability gate does the degenerate form of this (a ±1-day
  * alignment window around the probe date, `Gridmet_current.py:24-48`);
  * here it is the general keyed-by-nothing range join.
  *
  * Scale design: a naive `JOIN ON abs(a.t - b.t) <= r` has no equi
  * keys, so Catalyst plans a broadcast-nested-loop / cartesian — the
  * canonical 100 TB killer. Instead time is binned at width 2r: a left
  * window [t−r, t+r] covers at most TWO bins, the right row lives in
  * exactly ONE bin, so an equi-join on the bin plus the exact |Δt| ≤ r
  * residual filter finds every qualifying pair exactly once (no
  * distinct needed — the right row's single bin dedups by
  * construction). The only data movement is a hash shuffle on the bin;
  * left rows at a bin boundary duplicate once (2× left, never 2×
  * right). Bursty data makes hot bins — AQE skew-join splits them, or
  * salt the bin with a right-side id mod, the [[Skew]] pattern. */
object RangeJoin {

  /** Pairs (left row, right row) with |right time − left time| ≤
    * `radiusUs` (microseconds, inclusive). Output: left.* plus right
    * columns prefixed with `rightPrefix`. The time columns may arrive
    * as TIMESTAMP, TIMESTAMP_NTZ, or int64 nanoseconds — normalized
    * at entry ([[graft.functions.EventTime.normalize]]). */
  def proximityJoin(
      left0: DataFrame, right0: DataFrame,
      leftTs: String, rightTs: String, radiusUs: Long,
      rightPrefix: String = "r_"): DataFrame = {
    require(radiusUs > 0, "radius must be positive")
    val left = graft.functions.EventTime.normalize(left0, leftTs)
    val right = graft.functions.EventTime.normalize(right0, rightTs)
    val w = 2 * radiusUs
    // SQL strings only ever reference our own "__t"/"__t2" temp columns
    // (integer DIV has no Column-API form); user column names never hit
    // the parser, so quoting-hostile names (spaces, dots) work. The
    // right side prefixes its columns BEFORE the temp column lands, so
    // even a user column literally named "__t2" survives (prefixed);
    // "__"-prefixed LEFT column names remain reserved.
    val l = left
      .withColumn("__t", unix_micros(col(leftTs)))
      .withColumn("__bin", explode(array_distinct(array(
        expr(s"(__t - ${radiusUs}L) DIV ${w}L"),
        expr(s"(__t + ${radiusUs}L) DIV ${w}L")))))
    val rCols = right.columns.toSeq
    val r = right
      .select(rCols.map(c => col(c).as(s"$rightPrefix$c")) :+
        unix_micros(col(rightTs)).as("__t2"): _*)
      .withColumn("__bin", expr(s"__t2 DIV ${w}L"))
    l.join(r, Seq("__bin"))
      .filter(abs(col("__t2") - col("__t")) <= radiusUs)
      .drop("__bin", "__t", "__t2")
  }

  /** CONTAINMENT (point-in-interval) lookup join: each point row pairs
    * with every interval row whose half-open [lo, hi) contains its
    * value — the IP-range→geo / price-band / SCD-2 validity-window
    * lookup, a join class Spark has no native operator for (the naive
    * `ON v >= lo AND v < hi` has no equi keys → broadcast-nested-loop,
    * the canonical scale killer).
    *
    * Same binning idea as [[proximityJoin]], generalized to variable-
    * width intervals: intervals explode to every width-`binWidth` bin
    * they touch (an interval spans ⌈span/binWidth⌉+1 bins — size
    * `binWidth` to the TYPICAL interval span), a point lives in exactly
    * ONE bin, so the bin equi-join + exact residual filter emits every
    * qualifying pair exactly once, no distinct. The exchange is a hash
    * shuffle on the bin for both sides; when the interval table is
    * broadcast-sized Catalyst downgrades it to a broadcast hash join
    * for free. Output: point.* plus interval columns prefixed
    * `intervalPrefix`. */
  def containmentJoin(
      points: DataFrame, intervals: DataFrame,
      pointCol: String, loCol: String, hiCol: String,
      binWidth: Double, intervalPrefix: String = "i_"): DataFrame = {
    require(binWidth > 0, "binWidth must be positive")
    val p = points
      .withColumn("__bin", floor(col(pointCol).cast("double") / binWidth).cast("long"))
    val iCols = intervals.columns.toSeq
    val i = intervals
      .select(iCols.map(c => col(c).as(s"$intervalPrefix$c")): _*)
      .withColumn("__lo", col(s"$intervalPrefix$loCol").cast("double"))
      .withColumn("__hi", col(s"$intervalPrefix$hiCol").cast("double"))
      .withColumn("__bin", explode(sequence(
        floor(col("__lo") / binWidth).cast("long"),
        floor(col("__hi") / binWidth).cast("long"))))
    p.join(i, Seq("__bin"))
      .filter(col(pointCol).cast("double") >= col("__lo") &&
        col(pointCol).cast("double") < col("__hi"))
      .drop("__bin", "__lo", "__hi")
  }
}
