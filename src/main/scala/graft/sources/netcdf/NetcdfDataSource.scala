package graft.sources.netcdf

import java.util
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.{DataSourceRegister, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import graft.sinks.NetcdfClassic
import graft.sinks.NetcdfClassic.{Att, AttDoubles, AttText, Header}

/** DataSource V2 scan over contract NetCDF classic files (S1/S10 in
  * Spark-native form):
  *
  *   spark.read.format("netcdf-classic").load("/path/file.nc")
  *
  * Schema: (featureDim long, time timestamp, <2-D data vars> double) —
  * the long-form series table, same as `Sources.netcdfSeries` but
  * executed by Spark's scan machinery instead of a driver collect:
  *
  *  - PARTITIONED by time-index ranges (option `rowsPerPartition`
  *    bounds rows per split) — executors read in parallel;
  *  - COLUMN PRUNING is real I/O pruning: the row layout of a classic
  *    file is one contiguous (time → features) block per variable, so
  *    a reader seeks exactly the requested vars' slices for its time
  *    range and never touches dropped columns' bytes (ReadSchema in
  *    `.explain` reflects it);
  *  - `_FillValue` sentinels and NaN decode to null; the int64
  *    "days since" axis decodes to timestamps.
  *
  * Options: `path`, `featureDim` (default "nhru"), `rowsPerPartition`
  * (default 65536). */
class NetcdfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "netcdf-classic"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    NetcdfDataSource.schemaOf(
      NetcdfClassic.readHeader(NetcdfDataSource.path(options)),
      options.getOrDefault("featureDim", "nhru"))

  override def getTable(
      schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val options = new CaseInsensitiveStringMap(properties)
    new NetcdfTable(NetcdfDataSource.path(options),
      options.getOrDefault("featureDim", "nhru"),
      Integer.parseInt(options.getOrDefault("rowsPerPartition", "65536")))
  }
}

object NetcdfDataSource {
  private[netcdf] def path(options: CaseInsensitiveStringMap): String = {
    val p = options.get("path")
    require(p != null, "netcdf-classic needs a path")
    p
  }

  private[netcdf] def schemaOf(h: Header, featureDim: String): StructType = {
    val dimId = h.dims.zipWithIndex.map { case (d, i) => d.name -> i }.toMap
    require(dimId.contains("time") && dimId.contains(featureDim),
      s"expected dims (time, $featureDim), got ${h.dims.map(_.name)}")
    StructType(
      Seq(StructField(featureDim, LongType, nullable = false),
        StructField("time", TimestampType, nullable = false)) ++
        h.vars.filter(_.dimIds == Seq(dimId("time"), dimId(featureDim)))
          .map(v => StructField(v.name, DoubleType, nullable = true)))
  }
}

class NetcdfTable(path: String, featureDim: String, rowsPerPartition: Int)
    extends Table with SupportsRead {
  private lazy val header = NetcdfClassic.readHeader(path)
  override def name(): String = s"netcdf-classic:$path"
  override def schema(): StructType = NetcdfDataSource.schemaOf(header, featureDim)
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NetcdfScanBuilder(path, featureDim, rowsPerPartition, header, schema())
}

class NetcdfScanBuilder(
    path: String, featureDim: String, rowsPerPartition: Int,
    header: Header, full: StructType)
    extends ScanBuilder
    with SupportsPushDownRequiredColumns with SupportsPushDownFilters {
  private var required: StructType = full
  private var timeBounds: (Long, Long) = (Long.MinValue, Long.MaxValue)
  private var accepted: Array[Filter] = Array.empty

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Time-range pruning, the file-format analogue of parquet row-group
    * min/max skipping: range predicates on `time` narrow the scanned
    * time-index window (the axis is sorted in contract files). Every
    * filter is still returned as post-scan residual — pruning is an
    * I/O optimization, not the evaluation of record semantics. */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def micros(v: Any): Option[Long] = v match {
      case t: java.sql.Timestamp => Some(t.getTime * 1000L + t.getNanos / 1000 % 1000)
      case i: java.time.Instant =>
        Some(i.getEpochSecond * 1000000L + i.getNano / 1000)
      case _ => None
    }
    accepted = filters.filter {
      case GreaterThan("time", v) => micros(v).exists { m =>
        timeBounds = (timeBounds._1 max (m + 1), timeBounds._2); true }
      case GreaterThanOrEqual("time", v) => micros(v).exists { m =>
        timeBounds = (timeBounds._1 max m, timeBounds._2); true }
      case LessThan("time", v) => micros(v).exists { m =>
        timeBounds = (timeBounds._1, timeBounds._2 min (m - 1)); true }
      case LessThanOrEqual("time", v) => micros(v).exists { m =>
        timeBounds = (timeBounds._1, timeBounds._2 min m); true }
      case EqualTo("time", v) => micros(v).exists { m =>
        timeBounds = (timeBounds._1 max m, timeBounds._2 min m); true }
      case _ => false
    }
    filters // all residual: Spark re-applies them post-scan
  }
  override def pushedFilters(): Array[Filter] = accepted

  override def build(): Scan = new NetcdfScan(
    path, featureDim, rowsPerPartition, header, required, timeBounds)
}

final case class NetcdfInputPartition(tiStart: Int, tiEnd: Int) extends InputPartition

class NetcdfScan(
    path: String, featureDim: String, rowsPerPartition: Int,
    header: Header, required: StructType,
    timeBounds: (Long, Long) = (Long.MinValue, Long.MaxValue))
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  private def nTimes: Int =
    header.dims(header.vars.find(_.name == "time").get.dimIds.head).length.toInt
  private def nFeat: Int = {
    val fid = header.vars.find(_.name == featureDim).get
    header.dims(fid.dimIds.head).length.toInt
  }

  /** Time-index window satisfying the pushed bounds. The contract time
    * axis is ascending; when it isn't, pruning is skipped (correctness
    * never depends on it — filters are residual). */
  private def timeWindow(): (Int, Int) = {
    if (timeBounds == (Long.MinValue, Long.MaxValue)) return (0, nTimes)
    val times = NetcdfPartitionReader.timeAxisMicros(path, header)
    if (!times.indices.drop(1).forall(i => times(i - 1) <= times(i)))
      return (0, nTimes)
    val lo = times.indexWhere(_ >= timeBounds._1) match {
      case -1 => nTimes
      case i => i
    }
    val hi = times.lastIndexWhere(_ <= timeBounds._2) + 1
    (lo, math.max(lo, hi))
  }

  override def planInputPartitions(): Array[InputPartition] = {
    val (lo, hi) = timeWindow()
    val timesPerPart = math.max(1, rowsPerPartition / math.max(1, nFeat))
    (lo until hi by timesPerPart).map { t0 =>
      NetcdfInputPartition(t0, math.min(hi, t0 + timesPerPart))
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NetcdfReaderFactory(path, featureDim, required)
}

class NetcdfReaderFactory(path: String, featureDim: String, required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] = {
    val part = p.asInstanceOf[NetcdfInputPartition]
    new NetcdfPartitionReader(path, featureDim, required, part.tiStart, part.tiEnd)
  }
}

/** Reads its time-index slice with per-variable seeks — only the
  * REQUIRED columns' byte ranges are touched. */
class NetcdfPartitionReader(
    path: String, featureDim: String, required: StructType,
    tiStart: Int, tiEnd: Int)
    extends PartitionReader[InternalRow] {

  private val header = NetcdfClassic.readHeader(path)
  private val byName = header.vars.map(v => v.name -> v).toMap
  private val dimId = header.dims.zipWithIndex.map { case (d, i) => d.name -> i }.toMap
  private val nFeat = header.dims(dimId(featureDim)).length.toInt

  private val raf = new java.io.RandomAccessFile(path, "r")

  private def readLongs1D(name: String): Array[Long] = {
    val vh = byName(name)
    val n = header.dims(vh.dimIds.head).length.toInt
    val w = NetcdfClassic.elemSize(vh.ncType)
    val bytes = new Array[Byte](n * w)
    raf.seek(vh.begin); raf.readFully(bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.tabulate(n)(i =>
      if (vh.ncType == NetcdfClassic.NcInt64) bb.getLong(i * 8)
      else bb.getInt(i * 4).toLong)
  }

  /** One contiguous (tiEnd−tiStart)·nFeat slice of a (time, feat)
    * double variable. */
  private def readSlice(name: String): Array[Double] = {
    val vh = byName(name)
    val n = (tiEnd - tiStart) * nFeat
    val bytes = new Array[Byte](n * 8)
    raf.seek(vh.begin + tiStart.toLong * nFeat * 8)
    raf.readFully(bytes)
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.tabulate(n)(i => bb.getDouble(i * 8))
  }

  private val fids = readLongs1D(featureDim)
  private val timesUs: Array[Long] =
    NetcdfPartitionReader.timeAxisMicros(path, header)
  private val dataCols: Array[(Int, Array[Double], Option[Double])] =
    required.fields.zipWithIndex.collect {
      case (f, i) if f.name != featureDim && f.name != "time" =>
        val fill = byName(f.name).atts.collectFirst {
          case Att("_FillValue", AttDoubles(Seq(v))) => v
        }
        (i, readSlice(f.name), fill)
    }
  private val fidIdx =
    if (required.fieldNames.contains(featureDim))
      Some(required.fieldIndex(featureDim))
    else None
  private val timeIdx =
    if (required.fieldNames.contains("time")) Some(required.fieldIndex("time"))
    else None

  private var pos = -1
  private val total = (tiEnd - tiStart) * nFeat
  private val row = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
    required.length)

  override def next(): Boolean = { pos += 1; pos < total }

  override def get(): InternalRow = {
    val ti = pos / nFeat
    val hi = pos % nFeat
    fidIdx.foreach(i => row.update(i, fids(hi)))
    timeIdx.foreach(i => row.update(i, timesUs(tiStart + ti)))
    dataCols.foreach { case (i, slice, fill) =>
      val x = slice(pos)
      if (x.isNaN || fill.contains(x)) row.update(i, null)
      else row.update(i, x)
    }
    row
  }

  override def close(): Unit = raf.close()
}

object NetcdfPartitionReader {
  /** The decoded time axis in epoch micros — shared by the scan's
    * partition pruning (driver) and each reader. Small (nTimes longs). */
  def timeAxisMicros(path: String, header: Header): Array[Long] = {
    val tv = header.vars.find(_.name == "time")
      .getOrElse(sys.error("no time variable"))
    val units = tv.atts.collectFirst { case Att("units", AttText(s)) => s }
      .getOrElse(sys.error("time var has no units"))
    require(units.startsWith("days since "), s"unsupported time units: $units")
    val origin = java.time.LocalDate
      .parse(units.drop("days since ".length).take(10))
      .atStartOfDay(java.time.ZoneOffset.UTC)
    val n = header.dims(tv.dimIds.head).length.toInt
    val w = NetcdfClassic.elemSize(tv.ncType)
    val raf = new java.io.RandomAccessFile(path, "r")
    try {
      val bytes = new Array[Byte](n * w)
      raf.seek(tv.begin); raf.readFully(bytes)
      val bb = java.nio.ByteBuffer.wrap(bytes)
      Array.tabulate(n) { i =>
        val d = if (tv.ncType == NetcdfClassic.NcInt64) bb.getLong(i * 8)
          else bb.getInt(i * 4).toLong
        origin.plusDays(d).toInstant.toEpochMilli * 1000L
      }
    } finally raf.close()
  }
}
