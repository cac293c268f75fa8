package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HtmlExtractSpec extends SparkSpec {
  import spark.implicits._

  private def extract(html: String): String =
    Seq(html).toDF("h")
      .select(QualityKernels.html_extract(col("h")).as("t"))
      .collect().head.getString(0)

  test("strips tags, script/style with content, decodes entities, collapses whitespace") {
    val html =
      """<html><head><STYLE media="all">body { margin: 0 }</STYLE>
        |<script type="text/javascript">
        |  if (a < b && c > d) { emit("x"); }
        |</script></head>
        |<body>
        |  <h1 class="big">Title</h1>
        |  <p>one   two
        |three</p>
        |  <div>fish &amp; chips &lt;tag&gt; &quot;q&quot; &#39;s&#39;&nbsp;end</div>
        |</body></html>""".stripMargin
    assert(extract(html) ===
      """Title one two three fish & chips <tag> "q" 's' end""")
  }

  test("amp decodes LAST: &amp;lt; yields the literal string &lt;") {
    assert(extract("<p>&amp;lt; &amp;amp;</p>") === "&lt; &amp;")
  }

  test("decoded angle brackets are not re-parsed as tags") {
    assert(extract("&lt;script&gt;evil()&lt;/script&gt;") ===
      "<script>evil()</script>")
  }

  test("unterminated script tag is left as text minus the tags") {
    // no </script>: the block regex can't match, the tag regex then
    // strips <script> itself and the content survives
    assert(extract("<p>a</p><script>orphan(1)") === "a orphan(1)")
  }

  test("unterminated < at end of input stays") {
    assert(extract("x <b>y</b> 1 < 2") === "x y 1 < 2")
  }

  test("case-insensitive block removal") {
    assert(extract("<SCRIPT>x()</ScRiPt>keep<STYLE a=b>s{}</style>") === "keep")
  }

  test("null and empty pass through") {
    val got = Seq[(Option[String], Int)]((None, 0), (Some(""), 1))
      .toDF("h", "i")
      .select(QualityKernels.html_extract(col("h")).as("t"))
      .collect()
    assert(got(0).isNullAt(0))
    assert(got(1).getString(0) === "")
  }
}
