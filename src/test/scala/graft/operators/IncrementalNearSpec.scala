package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class IncrementalNearSpec extends SparkSpec {
  import spark.implicits._

  private val corpus = Seq(
    (1L, "a b c d e f"),
    (2L, "x y z w v u")).toDF("doc_id", "text")

  private def admit(batch: Seq[(Long, String)]) =
    Dedup.incrementalNear(corpus, batch.toDF("doc_id", "text"),
        "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq

  test("verbatim and near corpus copies are rejected, fresh docs admitted") {
    // 11 shares 4 of its 5 trigrams with corpus doc 1: J = 4/5 = 0.8,
    // exactly at threshold -> rejected.
    val got = admit(Seq(
      (10L, "a b c d e f"),
      (11L, "a b c d e f g"),
      (12L, "p q r s t u0")))
    assert(got === Seq(12L))
  }

  test("within-batch near-dups keep the lower id") {
    val got = admit(Seq(
      (12L, "p q r s t u0"),
      (13L, "p q r s t u0")))
    assert(got === Seq(12L))
  }

  test("a batch doc with an id LOWER than its corpus match still dies") {
    val big = Seq((100L, "m n o p q r")).toDF("doc_id", "text")
    val got = Dedup.incrementalNear(big,
        Seq((5L, "m n o p q r")).toDF("doc_id", "text"), "doc_id", "text")
      .collect()
    assert(got.isEmpty)
  }

  test("shingle-less docs (< n words) admit unconditionally") {
    assert(admit(Seq((20L, "one two"), (21L, "one two"))) ===
      Seq(20L, 21L))
  }

  test("all batch columns survive admission") {
    val batch = Seq((30L, "fresh words only here now ok", "keepme"))
      .toDF("doc_id", "text", "extra")
    val got = Dedup.incrementalNear(corpus, batch, "doc_id", "text")
      .collect()
    assert(got.head.getString(2) === "keepme")
  }

  test("Fp form over the persisted signature artifact is identical") {
    val batch = Seq(
      (10L, "a b c d e f"),
      (12L, "p q r s t u0"),
      (13L, "p q r s t u0")).toDF("doc_id", "text")
    val viaFp = Dedup.incrementalNearFp(
        Dedup.nearSignatures(corpus, "doc_id", "text"),
        batch, "doc_id", "text")
      .orderBy("doc_id").collect().map(_.getLong(0)).toSeq
    assert(viaFp === Seq(12L))
  }

  test("hot-bucket tripwire fires and names the fix") {
    val dup = (1 to 30).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val batch = Seq((100L, "the quick brown fox jumps over the lazy dog"))
      .toDF("doc_id", "text")
    val e = intercept[Exception] {
      Dedup.incrementalNear(dup, batch, "doc_id", "text",
        maxBucketSize = 10).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString("\n")
    assert(msgs.contains("incrementalNearFp"))
  }

  test("corpus-corpus pairs are pruned in the join condition") {
    // two corpus near-dups, an unrelated batch: no rejection, and the
    // candidate join condition must carry the side predicate.
    val c = Seq((1L, "a b c d e f"), (2L, "a b c d e f")).toDF("doc_id", "text")
    val out = Dedup.incrementalNear(c,
      Seq((10L, "p q r s t u0")).toDF("doc_id", "text"), "doc_id", "text")
    assert(out.collect().map(_.getLong(0)).toSeq === Seq(10L))
    val optimized = out.queryExecution.optimizedPlan.toString
    assert(optimized.contains("side"), optimized)
  }
}
