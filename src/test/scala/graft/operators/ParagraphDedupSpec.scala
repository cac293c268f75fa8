package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ParagraphDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String)]) =
    Corpus.paragraphDedup(rows.toDF("doc_id", "text"),
        col("doc_id"), col("text"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))

  test("globally-first occurrence survives; later docs lose the copy") {
    val got = run(Seq((1L, "a\nb"), (2L, "b\nc"), (3L, "a\nc\nc")))
    assert(got.toSeq === Seq(
      (1L, "a\nb", 2L, 2L),
      (2L, "c", 2L, 1L),
      (3L, "", 3L, 0L)))
  }

  test("intra-document repeats drop too (same election, no special case)") {
    val got = run(Seq((1L, "x\ny\nx")))
    assert(got.toSeq === Seq((1L, "x\ny", 3L, 2L)))
  }

  test("whitespace-only paragraphs are formatting: dropped, never counted") {
    val got = run(Seq((1L, "a\n   \nb\n")))
    assert(got.toSeq === Seq((1L, "a\nb", 2L, 2L)))
  }

  test("paragraphs are trimmed before fingerprinting AND in the output") {
    val got = run(Seq((1L, "  a  \nb"), (2L, "a")))
    assert(got.toSeq === Seq((1L, "a\nb", 2L, 2L), (2L, "", 1L, 0L)))
  }

  test("empty document yields an output row with zero counts") {
    val got = run(Seq((1L, ""), (2L, "real content")))
    assert(got.toSeq === Seq(
      (1L, "", 0L, 0L), (2L, "real content", 1L, 1L)))
  }

  test("ordering within a doc is original position, not election order") {
    // doc 2's kept paragraphs interleave with dropped ones; rebuild
    // must follow pos order.
    val got = run(Seq((1L, "dup"), (2L, "z\ndup\na")))
    assert(got.toSeq === Seq((1L, "dup", 1L, 1L), (2L, "z\na", 3L, 2L)))
  }

  test("custom separator is literal (regex metachars are quoted)") {
    val df = Seq((1L, "a|b"), (2L, "b|c")).toDF("doc_id", "text")
    val got = Corpus.paragraphDedup(df, col("doc_id"), col("text"), sep = "|")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "a|b"), (2L, "c")))
  }

  test("plan: the election window sees fingerprints only, never content") {
    val df = Seq((1L, "a\nb")).toDF("doc_id", "text")
    val plan = Corpus.paragraphDedup(df, col("doc_id"), col("text"))
      .queryExecution.optimizedPlan
    val wins = plan.collect {
      case w: org.apache.spark.sql.catalyst.plans.logical.Window => w
    }
    assert(wins.nonEmpty)
    wins.foreach { w =>
      val cols = w.child.output.map(_.name).toSet
      assert(!cols.contains("text") && !cols.contains("__t") &&
        !cols.contains("__p"), cols.toString)
    }
  }
}
