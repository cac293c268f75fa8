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
    extends TypedImperativeAggregate[java.util.TreeSet[(Double, Long)]]
    with BinaryLike[Expression] {

  require(k >= 1, "k must be >= 1")

  // worst entry first: ascending value, ties descending id (a lower id
  // wins a tie, so the highest id among equal values is the worst)
  private val worstFirst: Ordering[(Double, Long)] =
    Ordering.Tuple2(Ordering.Double.TotalOrdering, Ordering.Long.reverse)

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

  override def createAggregationBuffer(): java.util.TreeSet[(Double, Long)] =
    new java.util.TreeSet[(Double, Long)](worstFirst)

  private def add(buf: java.util.TreeSet[(Double, Long)], e: (Double, Long)): Unit = {
    buf.add(e)
    if (buf.size > k) buf.pollFirst() // evict the worst
  }

  override def update(
      buf: java.util.TreeSet[(Double, Long)], input: InternalRow): java.util.TreeSet[(Double, Long)] = {
    val v = left.eval(input)
    val id = right.eval(input)
    if (v != null && id != null)
      add(buf, (v.asInstanceOf[Double], id.asInstanceOf[Long]))
    buf
  }

  override def merge(
      a: java.util.TreeSet[(Double, Long)], b: java.util.TreeSet[(Double, Long)]): java.util.TreeSet[(Double, Long)] = {
    val it = b.iterator()
    while (it.hasNext) add(a, it.next())
    a
  }

  override def eval(buf: java.util.TreeSet[(Double, Long)]): Any = {
    val out = new Array[Any](buf.size)
    val it = buf.descendingIterator() // best first
    var i = 0
    while (it.hasNext) {
      val (v, id) = it.next()
      out(i) = InternalRow(v, id)
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: java.util.TreeSet[(Double, Long)]): Array[Byte] = {
    val bb = ByteBuffer.allocate(4 + buf.size * 16)
    bb.putInt(buf.size)
    val it = buf.iterator()
    while (it.hasNext) {
      val (v, id) = it.next()
      bb.putDouble(v); bb.putLong(id)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): java.util.TreeSet[(Double, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt
    val buf = createAggregationBuffer()
    var i = 0
    while (i < n) { buf.add((bb.getDouble, bb.getLong)); i += 1 }
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
  /** Aggregate column: top `k` (value, id) pairs by value desc, id asc,
    * as a best-first array<struct<v double, id bigint>>. */
  def top_k_by(value: Column, id: Column, k: Int): Column =
    Bridge.column(
      TopKBy(Bridge.expression(value), Bridge.expression(id), k)
        .toAggregateExpression())
}
