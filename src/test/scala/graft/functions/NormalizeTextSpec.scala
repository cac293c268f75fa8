package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class NormalizeTextSpec extends SparkSpec {
  import spark.implicits._

  private val Composed = "Café"   // é as one codepoint
  private val Decomposed = "Café" // e + combining acute

  private def run(texts: String*) =
    texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
      .select(col("id"), TextKernels.normalize_text(col("t")).as("n"))
      .orderBy("id")
      .select("n.clean_text", "n.n_stripped", "n.changed").collect()
      .map(r => (r.getString(0), r.getInt(1), r.getBoolean(2)))

  test("NFC composes decomposed accents") {
    assert(run(Decomposed).head === ((Composed, 0, true)))
  }

  test("CRLF and stray CR fold to LF") {
    assert(run("a\r\nb\rc").head === (("a\nb\nc", 0, true)))
  }

  test("zero-width characters and controls strip, counted") {
    val got = run("​a‌b‍c﻿d")
    assert(got.head === (("abcd", 6, true)))
  }

  test("TAB and LF survive the control strip") {
    assert(run("a\tb\nc").head === (("a\tb\nc", 0, false)))
  }

  test("clean ASCII passes through unchanged") {
    assert(run("plain ascii text.").head === (("plain ascii text.", 0, false)))
  }

  test("already-composed text is not changed by NFC") {
    assert(run(Composed).head === ((Composed, 0, false)))
  }

  test("idempotent: normalizing the output is a no-op") {
    val once = run(Decomposed + " x\r\n​y").head._1
    assert(once === Composed + " x\ny")
    assert(run(once).head === ((once, 0, false)))
  }

  test("interpreted eval matches codegen") {
    import org.apache.spark.unsafe.types.UTF8String
    val row = TextKernels.normalizeText(
      UTF8String.fromString(Decomposed + "\r\n​z"))
    assert(row.getUTF8String(0).toString === Composed + "\nz")
    assert(row.getInt(1) === 2 && row.getBoolean(2))
  }
}
