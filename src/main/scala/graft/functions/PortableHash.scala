package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.graftbridge.Bridge

/** Engine-defined deterministic string hash, as a native Catalyst
  * expression with codegen (preference order (b) of the build contract:
  * a custom `Expression` beats a Scala UDF).
  *
  * h = fold over UTF-8 bytes: h ← (h·31 + byte) mod 1_000_000_007
  *
  * Design constraints:
  *  - **Cross-engine reproducible**: for ASCII input the identical value
  *    is computable in ANSI-ish SQL (DuckDB oracle):
  *    {{{
  *    list_reduce(list_prepend(CAST(0 AS BIGINT),
  *      list_transform(range(1, length(s)+1), i -> ascii(s[i]))),
  *      (acc, c) -> (acc*31 + c) % 1000000007)
  *    }}}
  *    This is what makes minhash / simhash / fingerprint queries
  *    oracle-verifiable instead of rows-only checks.
  *  - **Codegen**: participates in whole-stage codegen via doGenCode —
  *    no boxing, no UDF serialization; stays inside the generated loop.
  *
  * Used as the base hash for minhash signatures, simhash, and document
  * fingerprints (SURVEY.md §7.2 step 9 extensions).
  */
case class PortableHash(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "portable_hash"

  /** Accepts strings (hashes UTF-8 bytes) and raw binary (same fold over
    * the byte array — a text-cast blob hashes identically to the text). */
  override def checkInputDataTypes(): TypeCheckResult =
    child.dataType match {
      case _: org.apache.spark.sql.types.StringType | BinaryType =>
        TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"portable_hash needs STRING or BINARY input, got ${other.catalogString}")
    }

  override def nullSafeEval(input: Any): Any = {
    val bytes = input match {
      case s: UTF8String => s.getBytes
      case b: Array[Byte] => b
    }
    var h = 0L
    var k = 0
    while (k < bytes.length) {
      h = (h * 31L + (bytes(k) & 0xffL)) % 1000000007L
      k += 1
    }
    h
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val bytes = ctx.freshName("bytes")
      val h = ctx.freshName("h")
      val k = ctx.freshName("k")
      val src = child.dataType match {
        case BinaryType => c          // already byte[]
        case _ => s"$c.getBytes()"    // UTF8String
      }
      s"""
         |byte[] $bytes = $src;
         |long $h = 0L;
         |for (int $k = 0; $k < $bytes.length; $k++) {
         |  $h = ($h * 31L + ($bytes[$k] & 0xffL)) % 1000000007L;
         |}
         |${ev.value} = $h;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): PortableHash =
    copy(child = newChild)
}

object PortableHash {
  /** Column-level entry point. */
  def portable_hash(c: Column): Column =
    Bridge.column(PortableHash(Bridge.expression(c)))

  val Mod: Long = 1000000007L
}
