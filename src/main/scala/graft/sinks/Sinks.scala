package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import java.nio.file.{Files, Paths}
import graft.model.Model

/** Sinks (SURVEY.md §2.7). Parquet-first: the reference's CF-NetCDF
  * contract (`gm_header.md`) maps to partitioned parquet in the contract
  * schema + a JSON attrs sidecar; `_FillValue` ↔ parquet nulls; zlib ↔
  * column compression. Literal `.nc` emission would be a driver-side
  * post-step outside the data plane (SURVEY.md §7.3) — not implemented
  * here by design.
  */
object Sinks {

  /** K1 — contract sink: CF metadata (global attrs + per-var units from
    * column metadata) lands in `<path>/_attrs.json`; data is parquet,
    * optionally partitioned (e.g. "ens" for the ensemble layout K4 —
    * `ensembles/<date>/ensemble_<n>` ↔ `partitionBy(ens)`). */
  def writeContract(
      df: DataFrame, path: String,
      partitionBy: Seq[String] = Nil,
      extraAttrs: Map[String, String] = Map.empty): Unit = {
    val w = df.write.mode(SaveMode.Overwrite)
    (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    val varAttrs = df.schema.fields.collect {
      case f if f.metadata.contains("units") =>
        s""""${f.name}": {"units": "${f.metadata.getString("units")}"}"""
    }.mkString(",")
    val globals = (Model.GlobalAttrs ++ extraAttrs)
      .map { case (k, v) => s""""$k": "$v"""" }.mkString(",")
    Files.writeString(Paths.get(path, "_attrs.json"),
      s"""{"global": {$globals}, "variables": {$varAttrs}}""")
  }

  /** K3 — NN-mapping CSV (`helper.py:75-77`; default name `helper.py:13`). */
  def writeMappingCsv(mapping: DataFrame, path: String): Unit =
    mapping.coalesce(1).write.mode(SaveMode.Overwrite)
      .option("header", "true").csv(path)

  /** K4 — output naming protocol (`etl.py:493-498`, `etl.py:770-775`,
    * `helper.py:92-99`): `<date>_converted` → `<date>_filled_converted`
    * with optional `_<ens>` / `_median` suffix. */
  def outputName(
      startDate: String, filled: Boolean,
      ensemble: Option[Int] = None, median: Boolean = false): String = {
    val base = if (filled) s"${startDate}_filled_converted" else s"${startDate}_converted"
    val suffix = ensemble.map(e => s"_$e").getOrElse(if (median) "_median" else "")
    base + suffix
  }

  /** Stable sink ordering (the reference's TYX layout, F8): deterministic
    * file content for downstream diffing — sort is the LAST operation so
    * it never constrains upstream plans. */
  def ordered(df: DataFrame, keys: String*): DataFrame =
    df.orderBy(keys.map(col): _*)
}
