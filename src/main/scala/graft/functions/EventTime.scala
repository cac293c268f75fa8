package graft.functions

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Physical-encoding-proof event-time normalization.
  *
  * The same logical "microsecond-precision event timestamp" column
  * arrives under (at least) three parquet encodings depending on which
  * writer produced the file:
  *
  *   - `int64` nanoseconds (parquet TIMESTAMP(NANOS) surfaced as
  *     `LongType` under `spark.sql.legacy.parquet.nanosAsLong`);
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=false)` → Spark
  *     `TimestampNTZType`;
  *   - `TIMESTAMP(MICROS, isAdjustedToUTC=true)` → Spark
  *     `TimestampType`.
  *
  * Round 8 proved the engine must be invariant to this drift: the test
  * datagen switched encodings and every `unix_micros` call site broke
  * at analysis time (`unix_micros` rejects TIMESTAMP_NTZ). This object
  * is the single seam: normalize once at the operator/loader boundary,
  * and every downstream `unix_micros`/window/watermark sees plain
  * `TimestampType`.
  *
  * The NTZ→LTZ cast reinterprets the wall-clock instant in the SESSION
  * time zone; the engine pins `spark.sql.session.timeZone=UTC`
  * everywhere (Verify/Bench/Jobs/specs), which makes the cast lossless
  * and exactly equivalent to the DuckDB oracle's naive `TIMESTAMP`
  * arithmetic. The long branch divides as an INTEGER (`DIV`): the ns
  * epoch (~1.7e18) exceeds a double's 53-bit mantissa, so float
  * division would drift by ±1 µs.
  */
object EventTime {

  /** Columns named with this prefix are reserved by [[normalize]]'s
    * internal rewrite and must not appear in caller schemas. */
  val ReservedPrefix = "__graft_"

  /** Return `df` with each named column (that exists) normalized to
    * `TimestampType`, whatever its physical encoding. Missing names are
    * ignored (callers pass optional columns unconditionally); columns
    * already `TimestampType` pass through untouched, so the call is
    * idempotent and free on already-clean input.
    *
    * Name resolution matches Spark's (exact, else unique
    * case-insensitive) so the seam cannot silently no-op on a source
    * that capitalized the column while downstream `unix_micros` still
    * resolves it.
    *
    * @param longNanos interpret a `LongType` column as int64 epoch
    *   NANOSECONDS (the events table's historical encoding). Pass
    *   false where a long time column is ambiguous (e.g. a staged
    *   grid's `time` could be epoch-seconds or yyyymm ints) — there a
    *   silent ns reinterpretation would fabricate 1970 instants and
    *   filter everything out instead of failing loudly downstream. */
  def normalize(df: DataFrame, cols: String*): DataFrame =
    normalize(df, cols, longNanos = true)

  def normalize(df: DataFrame, cols: Seq[String], longNanos: Boolean): DataFrame =
    cols.foldLeft(df) { (d, c0) =>
      val resolved = d.schema.fields.find(_.name == c0).orElse {
        d.schema.fields.filter(_.name.equalsIgnoreCase(c0)) match {
          case Array(one) => Some(one)
          case _ => None // ambiguous or absent: leave untouched
        }
      }
      resolved match {
        case Some(f) if f.dataType == LongType && longNanos =>
          // rename through a reserved temp name so the SQL `DIV` text
          // never contains a caller-controlled identifier (quoting-
          // hostile column names stay safe, as in RangeJoin)
          val tmp = ReservedPrefix + "ns"
          require(!d.columns.contains(tmp),
            s"input already has a $ReservedPrefix-prefixed column ($tmp); " +
              "that prefix is reserved by EventTime.normalize")
          d.withColumn(tmp, col(f.name))
            .withColumn(f.name, timestamp_micros(expr(s"$tmp DIV 1000")))
            .drop(tmp)
        case Some(f) if f.dataType == TimestampNTZType =>
          d.withColumn(f.name, col(f.name).cast(TimestampType))
        // NOT DateType: a DATE is a coarser logical type, not another
        // physical encoding of the same instant — converting it would
        // silently widen date-keyed pipelines (e.g. the synthetic
        // month-truncated grids) to timestamps and break schema parity
        case _ => d
      }
    }
}
