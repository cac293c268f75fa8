package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType, StructField, StructType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen kernel behind the Gopher-style rule-based document
  * quality gate ([[graft.operators.Corpus.gopherQualityGate]]): the
  * published repetition-free subset of the Gopher quality heuristics
  * (Rae et al. 2021, "Scaling Language Models", table A1) needs eight
  * integer counts per document — words, word characters, symbol words,
  * non-blank lines, bullet lines, ellipsis lines, alphabetic words and
  * required-stopword presence. Computing them as HOF `filter`/`size`
  * chains re-splits the text per predicate (interpreted, the q129
  * lesson); this kernel makes them ONE fused scan per row, and every
  * output is an exact integer so the downstream ratio/flag arithmetic
  * replays bit-for-bit in an external SQL oracle.
  *
  * Contract (shared verbatim with the oracle):
  *  - words: maximal runs between ASCII whitespace
  *    `[ \t\n\r\f] plus VT` ([[graft.operators.BpeTrain.WhitespaceClass]]),
  *    empties dropped; word characters are UTF-8 code points;
  *  - lines: `\n`-separated; a line is counted only if non-blank after
  *    trimming `[ \t\r\f] plus VT`; bullet = trimmed line starts with
  *    `-` or `*`; ellipsis = trimmed line ends with `...`;
  *  - symbol word: contains `#` or `...`; alphabetic word: contains
  *    `[A-Za-z]`;
  *  - required stopwords: case-sensitive exact-token presence of each
  *    of (the, be, to, of, and, that, have, with), each counted once.
  */
case class GopherCounts(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("sum_word_chars", IntegerType, nullable = false),
    StructField("n_symbol_words", IntegerType, nullable = false),
    StructField("n_lines", IntegerType, nullable = false),
    StructField("n_bullet_lines", IntegerType, nullable = false),
    StructField("n_ellipsis_lines", IntegerType, nullable = false),
    StructField("n_alpha_words", IntegerType, nullable = false),
    StructField("n_stop_present", IntegerType, nullable = false)))
  override def prettyName: String = "gopher_counts"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"gopher_counts needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    QualityKernels.gopherCounts(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QualityKernels.gopherCounts($s);")
  override protected def withNewChildInternal(newChild: Expression): GopherCounts =
    copy(child = newChild)
}

/** MARKUP TEXT EXTRACTION — the WET-style "HTML in, prose out" pass
  * every web-crawl pipeline runs before any quality scoring (CCNet /
  * C4 / RefinedWeb lineage). One fused kernel per row; the pipeline is
  * a FIXED, documented chain so an external SQL oracle can replay it
  * with the same regexes in the same order:
  *  1. remove `(?is)<script[^>]*>.*?</script>` blocks (with content);
  *  2. remove `(?is)<style[^>]*>.*?</style>` blocks (with content);
  *  3. replace every remaining `(?s)<[^>]*>` tag with ONE space
  *     (unterminated `<…` at end-of-input is left as text, exactly as
  *     the regex leaves it);
  *  4. decode the safe entity set — `&lt; &gt; &quot; &#39; &nbsp;`
  *     then `&amp;` LAST (so `&amp;lt;` decodes to the literal
  *     `&lt;`, not `<`); decoded `<`/`>` are NOT re-parsed as tags
  *     (decode runs after tag stripping, the correct extraction
  *     order);
  *  5. collapse ASCII whitespace runs to one space and trim.
  * The patterns are ASCII, non-backtracking-hazard-free, and carry
  * identical semantics in java.util.regex (this kernel) and RE2 (the
  * DuckDB oracle): `(?is)`, non-greedy `.*?`, and `[^>]*` agree
  * engine-to-engine. */
case class HtmlExtract(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "html_extract"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"html_extract needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    QualityKernels.extractHtmlText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QualityKernels.extractHtmlText($s);")
  override protected def withNewChildInternal(newChild: Expression): HtmlExtract =
    copy(child = newChild)
}

/** C4 LINE-LEVEL FILTER — the line-granular cleaning pass from Raffel
  * et al. 2020 (the C4 recipe), the other canonical curation gate
  * beside the Gopher document rules: per `\n`-line, KEEP only lines
  * that (a) end in terminal punctuation (`.` `!` `?` `"`), (b) have at
  * least 5 words, and (c) do not contain `javascript` (any case);
  * kept lines re-join with `\n`. Document-level flags ride along: C4
  * drops the whole page when the raw text contains `lorem ipsum` or a
  * `{` (code smell), or when fewer than 3 lines survive.
  *
  * Contract details (shared with the oracle): lines split on `\n` and
  * are trimmed of `[ \t\r\f]` plus VT before the rules; words are
  * maximal non-whitespace runs ([[graft.operators.BpeTrain.WhitespaceClass]]);
  * the `javascript` match is ASCII-case-insensitive substring; the
  * doc-level `lorem ipsum`/`{` probes run on the RAW text (before any
  * line is dropped), `lorem ipsum` ASCII-case-insensitively.
  * Output: struct(clean_text, n_lines_kept int, n_lines_dropped int,
  * has_lorem boolean, has_brace boolean, keep_doc boolean). */
case class C4LineFilter(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{BooleanType, IntegerType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_lines_kept", IntegerType, nullable = false),
    StructField("n_lines_dropped", IntegerType, nullable = false),
    StructField("has_lorem", BooleanType, nullable = false),
    StructField("has_brace", BooleanType, nullable = false),
    StructField("keep_doc", BooleanType, nullable = false)))
  override def prettyName: String = "c4_line_filter"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"c4_line_filter needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    QualityKernels.c4LineFilter(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.QualityKernels.c4LineFilter($s);")
  override protected def withNewChildInternal(newChild: Expression): C4LineFilter =
    copy(child = newChild)
}

object QualityKernels {

  /** The Gopher "required words" list (Rae et al. 2021 §A1.1). */
  val RequiredStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  private val StopBytes: Array[Array[Byte]] =
    RequiredStopwords.map(_.getBytes("UTF-8")).toArray

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r' || b == '\f' || b == 0x0B

  /** Static entry for [[GopherCounts]] — one scan over the UTF-8 bytes. */
  def gopherCounts(text: UTF8String): GenericInternalRow = {
    val bytes = text.getBytes
    var nWords = 0
    var sumChars = 0
    var nSym = 0
    var nAlpha = 0
    var stopMask = 0
    var nLines = 0
    var nBullet = 0
    var nEllipsis = 0
    // ---- word pass ----
    var i = 0
    while (i < bytes.length) {
      if (!isWs(bytes(i))) {
        val start = i
        var chars = 0
        var hasHash = false
        var hasAlpha = false
        var dots = 0
        var hasEll = false
        while (i < bytes.length && !isWs(bytes(i))) {
          val b = bytes(i)
          if ((b & 0xC0) != 0x80) chars += 1
          if (b == '#') hasHash = true
          if ((b >= 'a' && b <= 'z') || (b >= 'A' && b <= 'Z')) hasAlpha = true
          if (b == '.') { dots += 1; if (dots >= 3) hasEll = true }
          else dots = 0
          i += 1
        }
        nWords += 1
        sumChars += chars
        if (hasHash || hasEll) nSym += 1
        if (hasAlpha) nAlpha += 1
        val len = i - start
        var s = 0
        while (s < StopBytes.length) {
          if ((stopMask & (1 << s)) == 0) {
            val w = StopBytes(s)
            if (w.length == len) {
              var j = 0
              while (j < len && w(j) == bytes(start + j)) j += 1
              if (j == len) stopMask |= 1 << s
            }
          }
          s += 1
        }
      } else i += 1
    }
    // ---- line pass: \n-separated, trim [ \t\r\f] plus VT ----
    var lineStart = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == '\n') {
        var a = lineStart
        var e = i
        while (a < e && isWs(bytes(a))) a += 1
        while (e > a && isWs(bytes(e - 1))) e -= 1
        if (e > a) {
          nLines += 1
          val first = bytes(a)
          if (first == '-' || first == '*') nBullet += 1
          if (e - a >= 3 && bytes(e - 1) == '.' && bytes(e - 2) == '.' &&
              bytes(e - 3) == '.') nEllipsis += 1
        }
        lineStart = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      nWords, sumChars, nSym, nLines, nBullet, nEllipsis, nAlpha,
      Integer.bitCount(stopMask)))
  }

  def gopher_counts(text: Column): Column =
    Bridge.column(GopherCounts(Bridge.expression(text)))

  // ---- HtmlExtract statics (patterns compiled once per JVM) ----
  private val ScriptP = java.util.regex.Pattern
    .compile("(?is)<script[^>]*>.*?</script>")
  private val StyleP = java.util.regex.Pattern
    .compile("(?is)<style[^>]*>.*?</style>")
  private val TagP = java.util.regex.Pattern.compile("(?s)<[^>]*>")
  private val WsRunP = java.util.regex.Pattern
    .compile("[ \\t\\n\\r\\f\\x0B]+")

  /** Static entry for [[HtmlExtract]] — the documented five-step
    * chain. */
  def extractHtmlText(html: UTF8String): UTF8String = {
    var s = html.toString
    s = ScriptP.matcher(s).replaceAll("")
    s = StyleP.matcher(s).replaceAll("")
    s = TagP.matcher(s).replaceAll(" ")
    s = s.replace("&lt;", "<").replace("&gt;", ">")
      .replace("&quot;", "\"").replace("&#39;", "'")
      .replace("&nbsp;", " ").replace("&amp;", "&")
    s = WsRunP.matcher(s).replaceAll(" ")
    var a = 0
    var e = s.length
    while (a < e && s.charAt(a) == ' ') a += 1
    while (e > a && s.charAt(e - 1) == ' ') e -= 1
    UTF8String.fromString(s.substring(a, e))
  }

  def html_extract(html: Column): Column =
    Bridge.column(HtmlExtract(Bridge.expression(html)))

  private val LoremNeedle = "lorem ipsum".getBytes("US-ASCII")
  private val JsNeedle = "javascript".getBytes("US-ASCII")

  private def asciiLower(b: Byte): Byte =
    if (b >= 'A' && b <= 'Z') (b + 32).toByte else b

  private def matchesAt(
      bytes: Array[Byte], pos: Int, limit: Int, needle: Array[Byte]): Boolean = {
    if (pos + needle.length > limit) return false
    var j = 0
    while (j < needle.length && asciiLower(bytes(pos + j)) == needle(j)) j += 1
    j == needle.length
  }

  /** Static entry for [[C4LineFilter]] — one scan for the doc-level
    * probes, one line walk for the rules. */
  def c4LineFilter(text: UTF8String): GenericInternalRow = {
    val bytes = text.getBytes
    var hasBrace = false
    var hasLorem = false
    var i = 0
    while (i < bytes.length && !(hasBrace && hasLorem)) {
      if (bytes(i) == '{') hasBrace = true
      if (!hasLorem && matchesAt(bytes, i, bytes.length, LoremNeedle))
        hasLorem = true
      i += 1
    }
    val out = new java.io.ByteArrayOutputStream(bytes.length)
    var kept = 0
    var total = 0
    var lineStart = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == '\n') {
        total += 1
        var a = lineStart
        var e = i
        while (a < e && isWs(bytes(a))) a += 1
        while (e > a && isWs(bytes(e - 1))) e -= 1
        if (e > a) {
          val lastB = bytes(e - 1)
          if (lastB == '.' || lastB == '!' || lastB == '?' || lastB == '"') {
            var words = 0
            var inRun = false
            var hasJs = false
            var k = a
            while (k < e) {
              val ws = isWs(bytes(k))
              if (!ws && !inRun) words += 1
              inRun = !ws
              if (!hasJs && matchesAt(bytes, k, e, JsNeedle)) hasJs = true
              k += 1
            }
            if (words >= 5 && !hasJs) {
              if (kept > 0) out.write('\n')
              out.write(bytes, a, e - a)
              kept += 1
            }
          }
        }
        lineStart = i + 1
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](
      UTF8String.fromBytes(out.toByteArray), kept, total - kept,
      hasLorem, hasBrace, !hasLorem && !hasBrace && kept >= 3))
  }

  def c4_line_filter(text: Column): Column =
    Bridge.column(C4LineFilter(Bridge.expression(text)))
}
