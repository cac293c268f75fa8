package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.file.{Files, Paths}

/** Test-side ESRI shapefile WRITER (spec-conformant fixtures for the
  * reader; the engine itself only reads). Each feature: (fid, rings),
  * ring = closed coordinate sequence (first == last). */
object ShpTestData {

  def write(dir: String, name: String,
      feats: Seq[(Long, Seq[Seq[(Double, Double)]])]): String = {
    val shpPath = Paths.get(dir, s"$name.shp")
    val dbfPath = Paths.get(dir, s"$name.dbf")

    // ---- .shp ----
    val recs = feats.map { case (_, rings) =>
      val numPoints = rings.map(_.length).sum
      val content = ByteBuffer
        .allocate(4 + 32 + 8 + 4 * rings.length + 16 * numPoints)
        .order(ByteOrder.LITTLE_ENDIAN)
      val xs = rings.flatten.map(_._1); val ys = rings.flatten.map(_._2)
      content.putInt(5) // Polygon
      content.putDouble(xs.min).putDouble(ys.min)
        .putDouble(xs.max).putDouble(ys.max)
      content.putInt(rings.length).putInt(numPoints)
      rings.scanLeft(0)(_ + _.length).dropRight(1)
        .foreach(content.putInt)
      rings.flatten.foreach { case (x, y) =>
        content.putDouble(x).putDouble(y)
      }
      content.array()
    }
    val totalLen = 100 + recs.map(8 + _.length).sum
    val shp = ByteBuffer.allocate(totalLen)
    shp.order(ByteOrder.BIG_ENDIAN)
    shp.putInt(0, 9994)
    shp.putInt(24, totalLen / 2) // length in 16-bit words
    shp.order(ByteOrder.LITTLE_ENDIAN)
    shp.putInt(28, 1000)
    shp.putInt(32, 5)
    val allX = feats.flatMap(_._2.flatten.map(_._1))
    val allY = feats.flatMap(_._2.flatten.map(_._2))
    shp.putDouble(36, allX.min); shp.putDouble(44, allY.min)
    shp.putDouble(52, allX.max); shp.putDouble(60, allY.max)
    shp.position(100)
    recs.zipWithIndex.foreach { case (r, i) =>
      shp.order(ByteOrder.BIG_ENDIAN)
      shp.putInt(i + 1).putInt(r.length / 2)
      shp.order(ByteOrder.LITTLE_ENDIAN)
      shp.put(r)
    }
    Files.write(shpPath, shp.array())

    // ---- .dbf (single N field "nhru_v1_1", width 18, dec 0) ----
    val fieldLen = 18
    val headerSize = 32 + 32 + 1
    val recordSize = 1 + fieldLen
    val dbf = ByteBuffer
      .allocate(headerSize + feats.length * recordSize + 1)
      .order(ByteOrder.LITTLE_ENDIAN)
    dbf.put(0, 0x03.toByte)
    dbf.putInt(4, feats.length)
    dbf.putShort(8, headerSize.toShort)
    dbf.putShort(10, recordSize.toShort)
    val fname = "nhru_v1_1".getBytes("US-ASCII")
    var i = 0
    while (i < fname.length) { dbf.put(32 + i, fname(i)); i += 1 }
    dbf.put(32 + 11, 'N'.toByte)
    dbf.put(32 + 16, fieldLen.toByte)
    dbf.put(32 + 17, 0.toByte)
    dbf.put(64, 0x0d.toByte)
    dbf.position(headerSize)
    feats.foreach { case (fid, _) =>
      dbf.put(' '.toByte) // not deleted
      val s = fid.toString
      val pad = " " * (fieldLen - s.length) + s // right-justified numeric
      dbf.put(pad.getBytes("US-ASCII"))
    }
    dbf.put(0x1a.toByte)
    Files.write(dbfPath, dbf.array())
    shpPath.toString
  }
}
