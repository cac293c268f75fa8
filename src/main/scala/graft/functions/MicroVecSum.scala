package graft.functions

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.Bridge

/** Element-wise SUM of fixed-length double vectors whose values lie on
  * the 6dp grid (i.e. outputs of the round6 policy), as a
  * `TypedImperativeAggregate` with an `Array[Long]` of micro-units as
  * state — the vector form of the engine's "round6 then DECIMAL(28,6)"
  * order-free sum: each value is recovered to its exact integer micro
  * count (`Math.round(v·1e6)`), accumulated with `Math.addExact`
  * (overflow fails fast instead of wrapping), and emitted as
  * micros/1e6 — bit-identical to `CAST(sum(CAST(v AS DECIMAL(28,6)))
  * AS DOUBLE)` while every per-element total stays within 2^53 micros
  * (enforced; ~9e9 unit-scale values per element).
  *
  * Scale shape: replaces explode(array) → groupBy(pos) → decimal-sum —
  * which shuffles |rows|·len exploded rows and pays a BigDecimal-path
  * aggregation — with O(len) longs per (group, map task): updates are
  * a tight long-add loop, merges are element-wise addExact, and the
  * exchange carries ONE len-long buffer per partial. Built for
  * `EmbedStats.gramCov` (len = d(d+1)/2 product sums + d value sums in
  * one pass); general for any bounded-length vector accumulation.
  * NULL input arrays are skipped; rows shorter than `len` and NULL
  * ELEMENTS are rejected (a silent zero-pad would skew sums). */
case class MicroVecSum(
    child: Expression, len: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Long]]
    with UnaryLike[Expression] {

  require(len >= 1, "len must be >= 1")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def nullable: Boolean = false
  override def prettyName: String = "micro_vec_sum"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(DoubleType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"micro_vec_sum needs ARRAY<DOUBLE>, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Long] = new Array[Long](len)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val a = child.eval(input)
    if (a != null) {
      val arr = a.asInstanceOf[ArrayData]
      require(arr.numElements() >= len,
        s"micro_vec_sum: row has ${arr.numElements()} elements, need $len")
      var i = 0
      while (i < len) {
        // The input type is ARRAY<DOUBLE> with whatever containsNull
        // the upstream transform chain carries; ArrayData.getDouble on
        // a null slot silently yields 0.0, which is exactly the
        // "silent zero-pad skews sums" this kernel refuses — check.
        require(!arr.isNullAt(i),
          s"micro_vec_sum: NULL element at index $i — a null would " +
            "silently contribute 0.0 to the sum; clean the input")
        buf(i) = Math.addExact(buf(i), Math.round(arr.getDouble(i) * 1e6))
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < len) { a(i) = Math.addExact(a(i), b(i)); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Double](len)
    var i = 0
    while (i < len) {
      val m = buf(i)
      // |micros| ≤ 2^53 keeps long→double exact, so micros/1e6 rounds
      // ONCE — the same value the DECIMAL(28,6)→DOUBLE cast produces
      require(math.abs(m) <= (1L << 53),
        s"micro_vec_sum: element $i total $m exceeds exact double range")
      out(i) = m.toDouble / 1e6
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bos = new ByteArrayOutputStream(len * 8)
    val out = new DataOutputStream(bos)
    var i = 0
    while (i < len) { out.writeLong(buf(i)); i += 1 }
    out.flush()
    bos.toByteArray
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new ByteArrayInputStream(bytes))
    val buf = new Array[Long](len)
    var i = 0
    while (i < len) { buf(i) = in.readLong(); i += 1 }
    buf
  }

  override def withNewMutableAggBufferOffset(offset: Int): MicroVecSum =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MicroVecSum =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): MicroVecSum =
    copy(child = newChild)
}

object MicroVecSum {
  def micro_vec_sum(v: Column, len: Int): Column =
    Bridge.column(MicroVecSum(Bridge.expression(v), len)
      .toAggregateExpression())
}
