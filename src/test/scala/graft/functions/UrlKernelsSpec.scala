package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class UrlKernelsSpec extends SparkSpec {
  import spark.implicits._

  private def canon(url: String): String =
    Seq(url).toDF("u")
      .select(UrlKernels.canonicalize_url(col("u")).as("c"))
      .collect().head.getString(0)

  test("messy variants of the same resource collapse") {
    val a = canon("HTTP://WWW.Example.COM:80/A/b?utm_source=x&z=1&a=2#frag")
    val b = canon("http://www.example.com/A/b?a=2&z=1&utm_campaign=y")
    assert(a === "http://www.example.com/A/b?a=2&z=1")
    assert(a === b)
  }

  test("default ports strip only for the matching scheme") {
    assert(canon("http://h:80/p") === "http://h/p")
    assert(canon("https://h:443/p") === "https://h/p")
    assert(canon("http://h:443/p") === "http://h:443/p")
    assert(canon("https://h:80/p") === "https://h:80/p")
    assert(canon("ftp://h:80/p") === "ftp://h:80/p")
    assert(canon("http://h:8080/p") === "http://h:8080/p")
  }

  test("tracking params drop; others sort in binary order") {
    assert(canon("http://h/?fbclid=1&b=2&A=3&gclid=z&msclkid=9&utm_x=1") ===
      "http://h/?A=3&b=2")
    // all params tracking → the '?' goes too
    assert(canon("http://h/p?utm_a=1&gclid=2") === "http://h/p")
    // empty params drop; key-only params keep
    assert(canon("http://h/p?&&flag&z=1") === "http://h/p?flag&z=1")
    // utm as a VALUE (not key) survives
    assert(canon("http://h/p?q=utm_source") === "http://h/p?q=utm_source")
  }

  test("path case and structure are preserved; fragment always drops") {
    assert(canon("https://H.io/CaseSensitive/Path/?x=1#sec") ===
      "https://h.io/CaseSensitive/Path/?x=1")
    assert(canon("http://h#only-fragment") === "http://h")
    assert(canon("http://h?a=1#f") === "http://h?a=1")
  }

  test("fail-open: no scheme → returned as-is minus fragment") {
    assert(canon("not a url") === "not a url")
    assert(canon("example.com/path?utm_x=1") === "example.com/path?utm_x=1")
    assert(canon("opaque#frag") === "opaque")
    assert(canon("a/b://weird") === "a/b://weird")
    assert(canon("://nohost") === "://nohost")
  }

  test("perHostCap: messy variants share one host budget; lowest ids win") {
    import graft.operators.Corpus
    val urls = Seq(
      (5L, "HTTP://A.COM:80/x"),
      (1L, "http://a.com/y?utm_q=1"),
      (3L, "http://A.com/z#f"),
      (9L, "http://a.com/w"),
      (2L, "https://b.org/only")).toDF("doc_id", "url")
    val got = Corpus.perHostCap(urls, col("doc_id"), col("url"), cap = 2)
      .orderBy("host", "host_rank").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getInt(2)))
    assert(got.toSeq === Seq(
      (1L, "a.com", 1), (3L, "a.com", 2), (2L, "b.org", 1)))
  }

  test("null passes through") {
    val got = Seq(Option.empty[String]).toDF("u")
      .select(UrlKernels.canonicalize_url(col("u")).as("c")).collect()
    assert(got.head.isNullAt(0))
  }
}
