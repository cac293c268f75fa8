package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** Bounded-heap top-k aggregate (`TypedImperativeAggregate`): per group
  * keep the k (value, id) pairs with the highest value (ties → lowest
  * id), returned as a best-first sorted array of structs. The id may be
  * BIGINT (q45's order keys) or STRING (the CMS heavy-hitter candidate
  * keys); ordering/serialization adapt, values are unaffected.
  *
  * This is the scale form of "top-k per group": the window-function
  * formulation (`row_number() OVER (PARTITION BY g ORDER BY v DESC)`)
  * sorts EVERY group's full row set; this aggregate keeps O(k) state
  * per group, participates in hash aggregation (no sort at all), and —
  * because it is mergeable — does map-side partial aggregation, so the
  * shuffle carries at most k pairs per (group, map task) instead of
  * every row. At 100 TB with millions of groups the exchange shrinks
  * by |rows|/(k·|groups|).
  *
  * Deterministic (total order on (value desc, id asc)), so the result
  * is exactly the window form's — one oracle serves both. */
case class TopKBy(
    left: Expression, right: Expression, k: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[TopKBy.Buf]
    with BinaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  private def idIsString: Boolean = right.dataType == StringType

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType, nullable = false),
      StructField("id", right.dataType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType | StringType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by needs (DOUBLE value, BIGINT|STRING id), got " +
          s"(${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): TopKBy.Buf = new TopKBy.Buf(k)

  override def update(buf: TopKBy.Buf, input: InternalRow): TopKBy.Buf = {
    val v = left.eval(input)
    val id = right.eval(input)
    if (v != null && id != null) {
      // UTF8String from an unsafe row may alias a reused buffer — copy
      val owned = id match {
        case s: UTF8String => s.clone()
        case x => x
      }
      buf.add(v.asInstanceOf[Double], owned, 1)
    }
    buf
  }

  override def merge(a: TopKBy.Buf, b: TopKBy.Buf): TopKBy.Buf = {
    val it = b.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      a.add(e.getKey._1, e.getKey._2, e.getValue)
    }
    a
  }

  override def eval(buf: TopKBy.Buf): Any = {
    val out = new Array[Any](buf.total)
    val it = buf.map.descendingMap().entrySet().iterator() // best first
    var i = 0
    while (it.hasNext) {
      val e = it.next()
      var c = 0
      while (c < e.getValue) {
        out(i) = InternalRow(e.getKey._1, e.getKey._2)
        i += 1; c += 1
      }
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: TopKBy.Buf): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val out = new DataOutputStream(bos)
    out.writeInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      out.writeDouble(e.getKey._1)
      e.getKey._2 match {
        case s: UTF8String =>
          val b = s.getBytes
          out.writeInt(b.length); out.write(b)
        case l: Long => out.writeLong(l)
      }
      out.writeInt(e.getValue)
    }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): TopKBy.Buf = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val n = in.readInt()
    val buf = createAggregationBuffer()
    val isStr = idIsString
    var i = 0
    while (i < n) {
      val v = in.readDouble()
      val id: Any =
        if (isStr) {
          val len = in.readInt()
          val b = new Array[Byte](len)
          in.readFully(b)
          UTF8String.fromBytes(b)
        } else in.readLong()
      buf.add(v, id, in.readInt())
      i += 1
    }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): TopKBy =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): TopKBy =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): TopKBy =
    copy(left = newLeft, right = newRight)
}

object TopKBy {
  // worst entry first: ascending value, ties descending id (a lower id
  // wins a tie, so the highest id among equal values is the worst).
  // Ids compare as longs or as UTF8String byte order, per the input.
  private val worstFirst: java.util.Comparator[(Double, Any)] =
    new java.util.Comparator[(Double, Any)] {
      override def compare(x: (Double, Any), y: (Double, Any)): Int = {
        val c = java.lang.Double.compare(x._1, y._1)
        if (c != 0) c
        else {
          val ci = (x._2, y._2) match {
            case (a: UTF8String, b: UTF8String) => a.compareTo(b)
            case (a: Long, b: Long) => java.lang.Long.compare(a, b)
            case (a, b) => throw new IllegalStateException(
              s"top_k_by: mixed id types ${a.getClass} / ${b.getClass}")
          }
          -ci
        }
      }
    }

  /** Bounded top-k buffer with MULTIPLICITY: duplicate (value, id)
    * input rows each count toward k, exactly as the window
    * `row_number` form ranks them — a plain set would silently
    * deduplicate and return fewer than k rows. Keyed TreeMap
    * (value, id) → count; ≤ k distinct keys, `total` ≤ k. */
  final class Buf(k: Int) {
    val map = new java.util.TreeMap[(Double, Any), Integer](worstFirst)
    var total: Int = 0
    def add(v: Double, id: Any, n: Int): Unit = {
      val key = (v, id)
      val cur = map.get(key)
      map.put(key, if (cur == null) n else cur + n)
      total += n
      while (total > k) { // evict worst entries down to k
        val w = map.firstEntry()
        val over = total - k
        if (w.getValue <= over) { map.remove(w.getKey); total -= w.getValue }
        else { map.put(w.getKey, w.getValue - over); total -= over }
      }
    }
  }

  /** Aggregate column: top `k` (value, id) pairs by value desc, id asc,
    * as a best-first array<struct<v double, id bigint|string>>. */
  def top_k_by(value: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKBy(Bridge.expression(value), Bridge.expression(id), k)
        .toAggregateExpression())
}
