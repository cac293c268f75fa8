package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class C4LineFilterSpec extends SparkSpec {
  import spark.implicits._

  private def filter(texts: Seq[String]) =
    Corpus.c4LineFilter(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .orderBy("id").collect()

  test("line rules: terminal punctuation, five words, javascript, trim") {
    val doc = Seq(
      "A good first sentence right here.",
      "short one.",                          // < 5 words
      "This has no terminal punctuation",    // no punct
      "  \t Indented but still a fine line! ", // trims, kept
      "We must reject JavaScript mentions here.", // javascript
      "",                                    // blank
      "Quoted lines can end with a quote.\"",
      "Ends with a question of five words?").mkString("\n")
    val r = filter(Seq(doc)).head
    assert(r.getString(1) === Seq(
      "A good first sentence right here.",
      "Indented but still a fine line!",
      "Quoted lines can end with a quote.\"",
      "Ends with a question of five words?").mkString("\n"))
    assert(r.getInt(2) === 4)
    assert(r.getInt(3) === 4)
    assert(!r.getBoolean(4) && !r.getBoolean(5))
    assert(r.getBoolean(6)) // >= 3 kept, no flags
  }

  test("doc-level kills: lorem ipsum, brace, fewer than three kept lines") {
    val base = Seq(
      "A good first sentence right here.",
      "Another solid sentence with enough words.",
      "A third keeper sentence closes it out.")
    val lorem = (base :+ "We enjoy some Lorem IPSUM content today.").mkString("\n")
    val brace = (base :+ "if (x) { return; }").mkString("\n")
    val thin = base.take(2).mkString("\n")
    val got = filter(Seq(base.mkString("\n"), lorem, brace, thin))
    assert(got(0).getBoolean(6))
    assert(got(1).getBoolean(4) && !got(1).getBoolean(6)) // lorem kills
    assert(got(2).getBoolean(5) && !got(2).getBoolean(6)) // brace kills
    assert(got(3).getInt(2) === 2 && !got(3).getBoolean(6)) // thin kills
  }

  test("case-insensitive probes are ASCII-exact") {
    val r = filter(Seq("LoReM iPsUm appears in this fine sentence.")).head
    assert(r.getBoolean(4))
    val r2 = filter(Seq("JAVASCRIPT should also be caught in lines here.")).head
    assert(r2.getInt(2) === 0 && r2.getInt(3) === 1)
  }

  test("empty doc fails closed") {
    val r = filter(Seq("")).head
    assert(r.getString(1) === "")
    assert(r.getInt(2) === 0)
    assert(!r.getBoolean(6))
  }

  test("plan: single projection, no shuffle") {
    val df = Corpus.c4LineFilter(
      Seq((1L, "a")).toDF("doc_id", "text"), col("doc_id"), col("text"))
    assert(!df.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
