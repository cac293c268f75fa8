package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GopherGateSpec extends SparkSpec {
  import spark.implicits._

  /** In-memory reference implementing the documented contract
    * directly (independent of the kernel's single-scan shape). */
  private def reference(text: String): (Int, Double, Double, Double, Double, Double, Int) = {
    def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val ws = text.split(graft.operators.BpeTrain.WhitespaceClass).filter(_.nonEmpty)
    val ls = text.split("\n", -1)
      .map(_.replaceAll("^[ \t\r\f]+|[ \t\r\f]+$", ""))
      .filter(_.nonEmpty)
    val nWords = ws.length
    val chars = ws.map(w => w.codePointCount(0, w.length)).sum
    val nSym = ws.count(w => w.contains("#") || w.contains("..."))
    val nBullet = ls.count(l => l.startsWith("-") || l.startsWith("*"))
    val nEll = ls.count(_.endsWith("..."))
    val nAlpha = ws.count(_.exists(c =>
      (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z')))
    val nStop = graft.functions.QualityKernels.RequiredStopwords
      .count(ws.contains)
    def ratio(n: Int, d: Int) = if (d == 0) 0.0 else round6(n.toDouble / d)
    (nWords, ratio(chars, nWords), ratio(nSym, nWords),
      ratio(nBullet, ls.length), ratio(nEll, ls.length),
      ratio(nAlpha, nWords), nStop)
  }

  private def gate(texts: Seq[String]) =
    Corpus.gopherQualityGate(
      texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text"),
      col("doc_id"), col("text"))
      .orderBy("id").collect()

  test("counts and ratios match the documented contract on crafted docs") {
    val texts = Seq(
      "the cat sat on the mat with a hat and that is that to be sure of it have fun " * 4,
      "- bullet one\n- bullet two\n* bullet three\nplain line",
      "ends with dots...\nanother...\nplain\n\n  \n",
      "### #tags every#where ... ... word",
      "1 2 3 4 5 numbers only 6 7 8 9",
      "",
      "   \t \n  ",
      "one-word")
    val got = gate(texts)
    texts.zipWithIndex.foreach { case (t, i) =>
      val (nw, mwl, sym, bul, ell, alp, stp) = reference(t)
      val r = got(i)
      assert(r.getInt(1) === nw, s"n_words doc $i")
      assert(r.getDouble(2) === mwl, s"mean_word_len doc $i")
      assert(r.getDouble(3) === sym, s"symbol_ratio doc $i")
      assert(r.getDouble(4) === bul, s"bullet_ratio doc $i")
      assert(r.getDouble(5) === ell, s"ellipsis_ratio doc $i")
      assert(r.getDouble(6) === alp, s"alpha_ratio doc $i")
      assert(r.getInt(7) === stp, s"n_stop_present doc $i")
    }
  }

  test("pass requires every rule; n_rules_failed counts the violations") {
    // a long, ordinary English-looking doc: passes everything
    val good = (("the quick brown fox jumps over the lazy dog to be " +
      "sure of that and it will have done so with ease ") * 3).trim
    // short + numeric-only: fails word count, alpha ratio, stopwords...
    val bad = "1 2 3"
    val got = gate(Seq(good, bad))
    assert(got(0).getBoolean(9) === true)
    assert(got(0).getInt(8) === 0)
    assert(got(1).getBoolean(9) === false)
    assert(got(1).getInt(8) >= 3)
  }

  test("empty and whitespace-only docs fail closed with zero ratios") {
    val got = gate(Seq("", " \t\n "))
    got.foreach { r =>
      assert(r.getInt(1) === 0)
      assert(r.getDouble(2) === 0.0)
      assert(r.getBoolean(9) === false)
    }
  }

  test("plan: the gate is a single projection over the scan (no shuffle)") {
    val df = Corpus.gopherQualityGate(
      Seq((1L, "a")).toDF("doc_id", "text"), col("doc_id"), col("text"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"unexpected shuffle:\n$plan")
  }
}
