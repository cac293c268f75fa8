package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BlocklistFilterSpec extends SparkSpec {
  import spark.implicits._

  private def run(urls: Seq[(Long, String)], blocked: Seq[String]) =
    Corpus.blocklistFilter(urls.toDF("doc_id", "url"),
        col("doc_id"), col("url"), blocked.toDF("domain"))
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2),
        Option(r.getString(3))))

  test("a listed domain blocks itself and every subdomain") {
    val got = run(Seq(
      (1L, "http://example.com/x"),
      (2L, "http://a.b.example.com/y"),
      (3L, "http://example.org/z")), Seq("example.com"))
    assert(got.toSeq === Seq(
      (1L, "example.com", true, Some("example.com")),
      (2L, "a.b.example.com", true, Some("example.com")),
      (3L, "example.org", false, None)))
  }

  test("suffix match respects label boundaries: notexample.com stays") {
    val got = run(Seq((1L, "http://notexample.com/")), Seq("example.com"))
    assert(got.head._3 === false)
  }

  test("longest listed suffix wins matched_domain") {
    val got = run(Seq((1L, "http://a.b.c.com/")), Seq("c.com", "b.c.com"))
    assert(got.head._4 === Some("b.c.com"))
  }

  test("canonicalization shares the verdict across messy variants") {
    val got = run(Seq(
      (1L, "HTTP://Bad.COM:80/p?utm_source=x"),
      (2L, "http://bad.com/q")), Seq("bad.com"))
    assert(got.map(g => (g._2, g._3)).toSeq ===
      Seq(("bad.com", true), ("bad.com", true)))
  }

  test("plan: the blocklist is the broadcast side of the suffix join") {
    val urls = Seq((1L, "http://a.example.com/")).toDF("doc_id", "url")
    val p = Corpus.blocklistFilter(urls, col("doc_id"), col("url"),
      Seq("example.com").toDF("domain"))
      .queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }
}
