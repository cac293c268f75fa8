package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.MetadataBuilder
import graft.functions.Physics
import graft.model.Model

/** F7/C1/C2/C7 — the "finalize" layer (`etl.py:712-755`): rename the
  * aggregated feature time-series to the NHM output contract, convert
  * units, derive the gridMET humidity column, and attach CF metadata
  * (`gm_header.md`). Pure select/withColumn — no shuffle.
  */
object Convert {

  /** Attach a CF `units` attribute to a column's metadata. */
  private def withUnits(df: DataFrame, colName: String, units: String): DataFrame = {
    val md = new MetadataBuilder().putString("units", units).build()
    df.withColumn(colName, col(colName).as(colName, md))
  }

  /** gridMET finalize: input is the weighted-mean output with raw
    * variable names (tmmx, tmmn, pr, rmax, rmin, vs) keyed by
    * (fid, time). Output follows `gm_header.md`: renamed vars, K→°C
    * temperatures, the humidity column (reference's literal
    * `rhmin + rhmax/2` precedence quirk, `etl.py:740`), nhru key. */
  def gridmetFinalize(agg: DataFrame): DataFrame = {
    val renamed = Model.GridmetRenames.foldLeft(agg) {
      case (df, (from, to)) =>
        if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
    }
    // conversions are as lenient as the renames (F6 — the reference
    // processes whatever variables are present, `etl.py:728-736`):
    // humidity derives only when both inputs exist
    val has = renamed.columns.toSet
    val withTemps = Seq("tmax", "tmin").filter(has).foldLeft(renamed)(
      (df, c) => df.withColumn(c, Physics.kelvinToCelsius(col(c))))
    val converted = (if (has("rhmin") && has("rhmax"))
        withTemps.withColumn("humidity",
          Physics.gridmetHumidity(col("rhmin"), col("rhmax")))
      else withTemps)
      .withColumnRenamed("fid", "nhru")
    Model.OutputUnits.foldLeft(converted) { case (df, (c, u)) =>
      if (df.columns.contains(c)) withUnits(df, c, u) else df
    }
  }

  /** CFSv2 finalize (`etl.py:435-468`): rename + K→°C only; humidity is
    * derived separately from specific humidity (Physics.relativeHumidity)
    * after the elevation join. */
  def cfsv2Finalize(agg: DataFrame): DataFrame = {
    val renamed = Model.Cfsv2Renames.foldLeft(agg) {
      case (df, (from, to)) =>
        if (df.columns.contains(from)) df.withColumnRenamed(from, to) else df
    }
    renamed
      .withColumn("tmax", Physics.kelvinToCelsius(col("tmax")))
      .withColumn("tmin", Physics.kelvinToCelsius(col("tmin")))
      .withColumnRenamed("fid", "nhru")
  }

  /** C7 — encode the time column as int64 "days since `origin`"
    * (sink-side, `gm_header.md:60-62`). */
  def encodeTimeDays(df: DataFrame, origin: String): DataFrame =
    df.withColumn("time", datediff(col("time"), to_date(lit(origin))).cast("long"))
}
