package graft.operators

import graft.SparkSpec

class RelevanceSpec extends SparkSpec {
  import spark.implicits._

  test("bm25: rare discriminative terms outrank ubiquitous ones") {
    val docs = Seq(
      (1L, "common zebra common common"),
      (2L, "common common"),
      (3L, "common llama common")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25TopTerms(docs, "doc_id", "text", topK = 2)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getInt(3)))
    // "common" appears in every doc -> idf ln(1 + 0.5/3.5) is tiny;
    // the unique term must rank first wherever present
    assert(out.contains((1L, "zebra", 1)))
    assert(out.contains((3L, "llama", 1)))
    assert(out.count(_._1 == 2L) == 1) // doc 2 has a single distinct term
  }

  test("bm25: longer docs are length-normalized below shorter ones") {
    // same tf for "target", one doc padded with filler terms
    val docs = Seq(
      (1L, "target alpha"),
      (2L, "target beta gamma delta epsilon zeta eta theta iota kappa")
    ).toDF("doc_id", "text")
    val out = Relevance.bm25TopTerms(docs, "doc_id", "text", topK = 10)
      .collect().map(r => ((r.getLong(0), r.getString(1)), r.getDouble(2))).toMap
    assert(out((1L, "target")) > out((2L, "target")))
  }
}
