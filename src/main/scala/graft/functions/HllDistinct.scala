package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}
import org.apache.spark.sql.graftbridge.Bridge

/** HyperLogLog distinct-count sketch (Flajolet et al. 2007) as a custom
  * Catalyst aggregate: 64 one-byte registers per group — fixed state no
  * matter the input size, merge = element-wise max, so partial
  * aggregation, AQE and re-partitioning cannot change the result.
  *
  * The whole construction is deterministic AND order-independent, so —
  * unlike Spark's own `approx_count_distinct` (HLL++, private digest) —
  * the ESTIMATE itself is reproducible in an external SQL oracle:
  *  - input is a pre-hashed BIGINT ([[PortableHash]]); bucket and rank
  *    come from TWO independent affine scrambles (g₁ = A·(h+1) mod M,
  *    g₂ = A₂·(h+7) mod M) — one stream's top bits are too correlated
  *    with its own low bits to serve both roles (measured: +40 % bias);
  *  - bucket = g₁ mod 64; the rank draw w = g₂ mod 2²⁴ lives in a
  *    POWER-OF-TWO domain (a [0, M) domain skews P(bitlen) by ~7 % —
  *    M/2²⁴ ≈ 59.6 cycles cap the residue nonuniformity at ~1.7 %);
  *    ρ = 25 − bitlen(w) ∈ [1,25]; bitlen is integer-exact — the
  *    oracle uses DuckDB `bin()` string length, not floating log2;
  *  - Σ 2^(−reg) sums exact powers of two spanning < 53 bits, so the
  *    indicator sum is EXACT in double regardless of addition order;
  *  - the only transcendental is `ln` in the small-range linear-counting
  *    branch (cross-engine agreement measured — the BM25 precedent).
  *
  * Estimator: raw = α₆₄·64²/Σ2^(−reg); if raw ≤ 2.5·64 and empty
  * registers exist, linear counting 64·ln(64/zeros). 4-dp portable
  * round, like [[KmvDistinct]].
  */
case class HllDistinct(
    child: Expression,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
    extends TypedImperativeAggregate[Array[Byte]]
    with UnaryLike[Expression] {

  import HllDistinct.{M, Alpha}

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = false
  override def prettyName: String = "hll_distinct"

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"hll_distinct needs a BIGINT (pre-hashed) input, got ${other.catalogString}")
  }

  override def createAggregationBuffer(): Array[Byte] = new Array[Byte](M)

  override def update(buf: Array[Byte], input: InternalRow): Array[Byte] = {
    val v = child.eval(input)
    if (v != null) {
      // floorMod, not %: a negative input (raw xxhash64, negative id)
      // would otherwise drive b negative and crash executors with
      // ArrayIndexOutOfBoundsException. For the documented non-negative
      // PortableHash range floorMod ≡ %, so no estimate changes.
      val h = Math.floorMod(v.asInstanceOf[Long], PortableHash.Mod)
      val g1 = KmvDistinct.Scramble * (h + 1L) % PortableHash.Mod
      val g2 = HllDistinct.Scramble2 * (h + 7L) % PortableHash.Mod
      val b = (g1 % M).toInt
      val w = g2 % (1L << 24)
      val bitlen = if (w == 0L) 0 else 64 - java.lang.Long.numberOfLeadingZeros(w)
      val rho = (25 - bitlen).toByte
      if (rho > buf(b)) buf(b) = rho
    }
    buf
  }

  override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
    var i = 0
    while (i < M) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Byte]): Any = {
    var s = 0.0
    var zeros = 0
    var i = 0
    while (i < M) {
      s += java.lang.Math.pow(2.0, -buf(i).toDouble) // exact powers of two
      if (buf(i) == 0) zeros += 1
      i += 1
    }
    val raw = Alpha * (M.toDouble * M.toDouble) / s
    val est =
      if (raw <= 2.5 * M && zeros > 0) M.toDouble * math.log(M.toDouble / zeros)
      else raw
    math.floor(est * 1e4 + 0.5) / 1e4 // portable 4-dp round
  }

  // clone both ways: merge mutates its left buffer in place, and the
  // serialized bytes must be a snapshot, not an alias of it
  override def serialize(buf: Array[Byte]): Array[Byte] = buf.clone()
  override def deserialize(bytes: Array[Byte]): Array[Byte] = bytes.clone()

  override def withNewMutableAggBufferOffset(offset: Int): HllDistinct =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): HllDistinct =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildInternal(newChild: Expression): HllDistinct =
    copy(child = newChild)
}

object HllDistinct {
  /** Register count (2⁶ — bucket is the low 6 bits of the scrambled hash). */
  val M: Int = 64
  /** α₆₄ bias constant (Flajolet et al., table for m = 64). */
  val Alpha: Double = 0.709
  /** Second affine scrambler (glibc LCG constant) — the rank stream. */
  val Scramble2: Long = 1103515245L

  /** Aggregate column: HLL distinct estimate of pre-hashed `c`. */
  def hll_distinct(c: Column): Column =
    Bridge.column(HllDistinct(Bridge.expression(c)).toAggregateExpression())
}
