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

  test("perHostCap: two-level megahost form is bit-identical to naive") {
    import graft.operators.Corpus
    // one megahost (600 docs), several small hosts, ids deliberately
    // NOT in insertion order — the two-level election must keep the
    // exact cap-lowest ids and ranks of the single-window form.
    val urls = ((1L to 600L).map(i =>
        (i * 7 % 601, s"http://mega.com/p$i")) ++
      (700L to 720L).map(i => (i, s"http://s${i % 4}.org/x")))
      .toDF("doc_id", "url")
    def run(force: String): Seq[(Long, String, Int)] = {
      spark.conf.set("spark.graft.corpus.twoLevelHostCap", force)
      try Corpus.perHostCap(urls, col("doc_id"), col("url"),
          cap = 3, blocks = 8)
        .orderBy("host", "host_rank").collect()
        .map(r => (r.getLong(0), r.getString(1), r.getInt(2))).toSeq
      finally spark.conf.unset("spark.graft.corpus.twoLevelHostCap")
    }
    val two = run("true")
    val naive = run("false")
    assert(two === naive)
    assert(two.count(_._2 == "mega.com") === 3)
    // lowest three ids of the megahost really are the kept ones
    assert(two.filter(_._2 == "mega.com").map(_._1).sorted ===
      (1L to 600L).map(i => i * 7 % 601).sorted.take(3))
  }

  test("param sort is code-point (UTF-8 byte) order, not UTF-16") {
    // U+E000 (one BMP char) vs U+10000 (surrogate pair 𐀀):
    // Java String order puts the surrogate FIRST (0xD800 < 0xE000
    // code-unit-wise); UTF-8 byte order — the documented contract and
    // what a byte-comparing oracle engine replays — puts U+E000 first
    // (0xE000 < 0x10000 as code points).
    val supp = new String(Character.toChars(0x10000))
    val url = s"http://x.com/p?$supp=1&=2"
    val got = Seq(url).toDF("u")
      .select(UrlKernels.canonicalize_url(col("u")).as("c"))
      .collect().head.getString(0)
    assert(got === s"http://x.com/p?=2&$supp=1")
    assert(url.split('?')(1).split('&').sorted.head.startsWith(supp),
      "fixture must actually disagree between the two orders")
  }

  test("null passes through") {
    val got = Seq(Option.empty[String]).toDF("u")
      .select(UrlKernels.canonicalize_url(col("u")).as("c")).collect()
    assert(got.head.isNullAt(0))
  }
}
