package graft.functions

import java.nio.ByteBuffer
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Bounded-heap top-k aggregate (`TypedImperativeAggregate`): per group
  * keep the k (value, id) pairs with the highest value (ties → lowest
  * id), returned as a best-first sorted array of structs.
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

  override def dataType: DataType = ArrayType(
    StructType(Seq(StructField("v", DoubleType, nullable = false),
      StructField("id", LongType, nullable = false))), containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "top_k_by"

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (DoubleType, LongType) => TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"top_k_by needs (DOUBLE value, BIGINT id), got (${l.catalogString}, ${r.catalogString})")
    }

  override def createAggregationBuffer(): TopKBy.Buf = new TopKBy.Buf(k)

  override def update(buf: TopKBy.Buf, input: InternalRow): TopKBy.Buf = {
    val v = left.eval(input)
    val id = right.eval(input)
    if (v != null && id != null)
      buf.add(v.asInstanceOf[Double], id.asInstanceOf[Long], 1)
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
    val bb = ByteBuffer.allocate(4 + buf.map.size * 20)
    bb.putInt(buf.map.size)
    val it = buf.map.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      bb.putDouble(e.getKey._1); bb.putLong(e.getKey._2); bb.putInt(e.getValue)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): TopKBy.Buf = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add(bb.getDouble, bb.getLong, bb.getInt); i += 1 }
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
  // wins a tie, so the highest id among equal values is the worst)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)

  /** Bounded top-k buffer with MULTIPLICITY: duplicate (value, id)
    * input rows each count toward k, exactly as the window
    * `row_number` form ranks them — a plain set would silently
    * deduplicate and return fewer than k rows. Keyed TreeMap
    * (value, id) → count; ≤ k distinct keys, `total` ≤ k. */
  final class Buf(k: Int) {
    val map = new java.util.TreeMap[(Double, Long), Integer](worstFirst)
    var total: Int = 0
    def add(v: Double, id: Long, n: Int): Unit = {
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
    * as a best-first array<struct<v double, id bigint>>. */
  def top_k_by(value: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKBy(Bridge.expression(value), Bridge.expression(id), k)
        .toAggregateExpression())
}
