package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** One-pass codegen kernels for the two remaining interpreted-HOF text
  * pipelines, value-identical to their Column-API definitions (so every
  * existing oracle keeps matching bit-for-bit):
  *
  *  - [[NgramPortableHashes]] ≡ sorted distinct
  *    `transform(shingles(text, n), portable_hash)` — the minhash base.
  *    Minhash takes a min per slot, so losing first-occurrence order is
  *    value-neutral.
  *  - [[WinnowFingerprints]] ≡ [[TextFunctions.winnowingFingerprints]] —
  *    per-CHARACTER k-gram portable hashes (UTF-8 char boundaries
  *    honored, matching `substr`'s character semantics), sliding-window
  *    minima, sorted distinct.
  *
  * Both ride the static-helper codegen pattern (one call per row; the
  * surrounding stage stays whole-stage compiled). */
case class NgramPortableHashes(child: Expression, n: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "ngram_portable_hashes"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"ngram_portable_hashes needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.ngramPortableHashes(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.ngramPortableHashes($s, $n);")
  override protected def withNewChildInternal(newChild: Expression): NgramPortableHashes =
    copy(child = newChild)
}

case class WinnowFingerprints(child: Expression, k: Int, w: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "winnow_fingerprints"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"winnow_fingerprints needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.winnowFingerprints(input.asInstanceOf[UTF8String], k, w)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.winnowFingerprints($s, $k, $w);")
  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

/** One-pass quality/token stats: struct(ws_tokens int, re_tokens int,
  * quality double), value-identical to the Column-API trio
  * (whitespaceTokenCount, regexTokenCount, qualityScore) — same split
  * semantics, same round6 arithmetic in the same order. The regex token
  * count reproduces `[a-z0-9]+` over `lower(text)` by counting maximal
  * [A-Za-z0-9] byte runs — identical for ASCII text (exotic case
  * mappings like U+212A→k would differ; the corpus contract is ASCII). */
case class TextStats(child: Expression, stopwords: Seq[String]) extends UnaryExpression {
  import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("ws_tokens", IntegerType, nullable = false),
    StructField("re_tokens", IntegerType, nullable = false),
    StructField("quality", DoubleType, nullable = false)))
  override def prettyName: String = "text_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"text_stats needs STRING, got ${other.catalogString}")
  }
  @transient private lazy val stopBytes: Array[Array[Byte]] =
    stopwords.map(_.getBytes("UTF-8")).toArray
  override def nullSafeEval(input: Any): Any =
    TextKernels.textStats(input.asInstanceOf[UTF8String], stopBytes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val sw = ctx.addReferenceObj("stop", stopBytes, "byte[][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.textStats($s, $sw);")
  }
  override protected def withNewChildInternal(newChild: Expression): TextStats =
    copy(child = newChild)
}

/** One-pass language-ID: per-profile stopword ratios + argmax
  * prediction, value-identical to [[TextFunctions.stopwordRatio]] ×
  * profiles + [[TextFunctions.langIdPrediction]] (same round6 division,
  * same highest-score / lexicographically-largest-language tie rule as
  * `greatest` over (score, lang) structs). Output:
  * struct(<lang>_score double ..., pred_lang string), profiles in the
  * given order. */
case class LangScores(child: Expression, profiles: Seq[(String, Seq[String])])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{DoubleType, StructField, StructType}
  override def dataType: DataType = StructType(
    profiles.map { case (l, _) =>
      StructField(s"${l}_score", DoubleType, nullable = false)
    } :+ StructField("pred_lang", StringType, nullable = false))
  override def prettyName: String = "lang_scores"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lang_scores needs STRING, got ${other.catalogString}")
  }
  @transient private lazy val langs: Array[UTF8String] =
    profiles.map(p => UTF8String.fromString(p._1)).toArray
  @transient private lazy val words: Array[Array[Array[Byte]]] =
    profiles.map(_._2.map(_.getBytes("UTF-8")).toArray).toArray
  override def nullSafeEval(input: Any): Any =
    TextKernels.langScores(input.asInstanceOf[UTF8String], langs, words)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ls = ctx.addReferenceObj("langs", langs,
      "org.apache.spark.unsafe.types.UTF8String[]")
    val ws = ctx.addReferenceObj("words", words, "byte[][][]")
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.langScores($s, $ls, $ws);")
  }
  override protected def withNewChildInternal(newChild: Expression): LangScores =
    copy(child = newChild)
}

/** One-pass repetition stats: struct(n_tokens, n_ngrams, n_distinct,
  * top_tok), value-identical to the HOF formulation it replaces
  * (`array_max(transform(array_distinct(toks), t => size(filter(toks,
  * _ === t))))` — O(distinct·tokens) per row, hostile to book-length
  * documents) but O(L) with a hash map for the top-token count and a
  * hash set for distinct n-grams (O(L·n) including gram building).
  * Token split is `split(text, " ", -1)` (trailing empties kept,
  * "" → [""]); grams join tokens with '_' and compare by the JOINED
  * string — both exactly the Column-API semantics, so the q56 oracle
  * keeps matching bit-for-bit. */
case class RepetitionStatsExpr(child: Expression, n: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("n_ngrams", IntegerType, nullable = false),
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("top_tok", IntegerType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"repetition_stats needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.repetitionStats(input.asInstanceOf[UTF8String], n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.repetitionStats($s, $n);")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStatsExpr =
    copy(child = newChild)
}

/** One-pass Unicode text normalization — the cleanup every corpus runs
  * before fingerprinting/tokenization (the ftfy-lite subset that is
  * engine-portable): CRLF/CR folded to LF, Unicode NFC composition
  * (java.text.Normalizer — `café` arrives byte-identical whether the
  * crawl emitted it composed or decomposed, so exact dedup stops
  * splitting on encoding accidents), then zero-width characters
  * (U+200B–U+200D, U+FEFF) and C0 controls (TAB and LF excepted, plus
  * DEL) stripped. Steps run in EXACTLY that order — the DuckDB oracle
  * chains `replace`/`nfc_normalize`/`regexp_replace` in the same order,
  * so parity holds even where the passes interact.
  * Output: struct(clean_text string, n_stripped int, changed boolean);
  * `n_stripped` counts stripped codepoints (all BMP), `changed`
  * compares against the ORIGINAL input. */
case class NormalizeTextExpr(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{BooleanType, IntegerType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("clean_text", StringType, nullable = false),
    StructField("n_stripped", IntegerType, nullable = false),
    StructField("changed", BooleanType, nullable = false)))
  override def prettyName: String = "normalize_text"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"normalize_text needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    TextKernels.normalizeText(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.TextKernels.normalizeText($s);")
  override protected def withNewChildInternal(newChild: Expression): NormalizeTextExpr =
    copy(child = newChild)
}

object TextKernels {

  private final val Mod = 1000000007L

  /** Static entry for [[NormalizeTextExpr]]. */
  def normalizeText(
      text: UTF8String): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val raw = text.toString
    // 1. CRLF -> LF, stray CR -> LF.
    val lf = raw.replace("\r\n", "\n").replace('\r', '\n')
    // 2. Unicode NFC composition.
    val nfc =
      if (java.text.Normalizer.isNormalized(lf, java.text.Normalizer.Form.NFC)) lf
      else java.text.Normalizer.normalize(lf, java.text.Normalizer.Form.NFC)
    // 3. Strip zero-width + C0 controls (TAB/LF excepted) + DEL.
    val sb = new java.lang.StringBuilder(nfc.length)
    var stripped = 0
    var i = 0
    while (i < nfc.length) {
      val c = nfc.charAt(i)
      val drop = (c <= 0x1f && c != '\t' && c != '\n') || c == 0x7f ||
        (c >= 0x200b && c <= 0x200d) || c == 0xfeff
      if (drop) stripped += 1 else sb.append(c)
      i += 1
    }
    val clean = sb.toString
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](UTF8String.fromString(clean), stripped,
        java.lang.Boolean.valueOf(clean != raw)))
  }

  /** Static entry for [[RepetitionStatsExpr]]. */
  def repetitionStats(
      text: UTF8String,
      n: Int): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val toks = text.toString.split(" ", -1)
    val len = toks.length
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var i = 0
    while (i < len) {
      val c = counts.merge(toks(i), 1, (a, b) => a + b)
      if (c > top) top = c
      i += 1
    }
    val nGrams = if (len < n) 0 else len - n + 1
    var nDistinct = 0
    if (nGrams > 0) {
      val grams = new java.util.HashSet[String]()
      val sb = new java.lang.StringBuilder
      var g = 0
      while (g < nGrams) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append('_')
          sb.append(toks(g + j))
          j += 1
        }
        grams.add(sb.toString)
        g += 1
      }
      nDistinct = grams.size
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](len, nGrams, nDistinct, top))
  }

  /** Static entry for [[LangScores]]. */
  def langScores(
      text: UTF8String, langs: Array[UTF8String],
      words: Array[Array[Array[Byte]]]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val bytes = text.getBytes
    var nTok = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTok += 1; i += 1 }
    val counts = new Array[Int](langs.length)
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        val len = i - start
        var p = 0
        while (p < langs.length) {
          val ws = words(p)
          var s = 0
          var hit = false
          while (s < ws.length && !hit) {
            val w = ws(s)
            if (w.length == len) {
              var j = 0
              while (j < len && w(j) == bytes(start + j)) j += 1
              hit = j == len
            }
            s += 1
          }
          if (hit) counts(p) += 1
          p += 1
        }
        start = i + 1
      }
      i += 1
    }
    val nTokD = nTok.toDouble
    val scores = counts.map(c => math.floor(c.toDouble / nTokD * 1e6 + 0.5) / 1e6)
    // greatest over (score, lang) structs: highest score, then
    // lexicographically LARGEST language string
    var best = 0
    var p = 1
    while (p < langs.length) {
      if (scores(p) > scores(best) ||
        (scores(p) == scores(best) && langs(p).compareTo(langs(best)) > 0)) best = p
      p += 1
    }
    val out = new Array[Any](langs.length + 1)
    p = 0
    while (p < langs.length) { out(p) = scores(p); p += 1 }
    out(langs.length) = langs(best)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(out)
  }

  /** Static entry for [[TextStats]]. */
  def textStats(
      text: UTF8String,
      stop: Array[Array[Byte]]): org.apache.spark.sql.catalyst.expressions.GenericInternalRow = {
    val bytes = text.getBytes
    // whitespace tokens: maximal runs between 0x20 (empties included)
    var nTok = 1
    var nChars = 0
    var reTokens = 0
    var inRun = false
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i)
      if (b == ' '.toByte) nTok += 1
      if ((b & 0xC0) != 0x80) nChars += 1
      val alnum = (b >= 'a'.toByte && b <= 'z'.toByte) ||
        (b >= 'A'.toByte && b <= 'Z'.toByte) ||
        (b >= '0'.toByte && b <= '9'.toByte)
      if (alnum && !inRun) reTokens += 1
      inRun = alnum
      i += 1
    }
    // stopword occurrences: token-by-token byte equality
    var stopCount = 0
    var start = 0
    i = 0
    while (i <= bytes.length) {
      if (i == bytes.length || bytes(i) == ' '.toByte) {
        val len = i - start
        var s = 0
        var hit = false
        while (s < stop.length && !hit) {
          val w = stop(s)
          if (w.length == len) {
            var j = 0
            while (j < len && w(j) == bytes(start + j)) j += 1
            hit = j == len
          }
          s += 1
        }
        if (hit) stopCount += 1
        start = i + 1
      }
      i += 1
    }
    def round6(x: Double): Double = math.floor(x * 1e6 + 0.5) / 1e6
    val nTokD = nTok.toDouble
    val meanLen = round6((nChars.toDouble - (nTokD - 1.0)) / nTokD)
    val stopR = round6(stopCount.toDouble / nTokD)
    val lenTerm = math.min(nTokD / 200.0, 1.0)
    val quality = round6(
      0.4 * lenTerm + 0.3 * math.min(meanLen / 8.0, 1.0) +
        0.3 * math.min(stopR * 5.0, 1.0))
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](nTok, reTokens, quality))
  }

  private def sortedDistinct(a: Array[Long], len: Int): GenericArrayData = {
    val arr = java.util.Arrays.copyOf(a, len)
    java.util.Arrays.sort(arr)
    var uniq = 0
    var i = 0
    while (i < arr.length) {
      if (i == 0 || arr(i) != arr(i - 1)) { arr(uniq) = arr(i); uniq += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(arr, uniq))
  }

  /** Sorted distinct portable_hash values of the word n-grams ("_"-joined,
    * split on every 0x20 — the [[TextFunctions.shingles]] string). */
  def ngramPortableHashes(text: UTF8String, n: Int): GenericArrayData = {
    val bytes = text.getBytes
    var nTokens = 1
    var i = 0
    while (i < bytes.length) { if (bytes(i) == ' '.toByte) nTokens += 1; i += 1 }
    if (nTokens < n) return new GenericArrayData(Array.emptyLongArray)
    val starts = new Array[Int](nTokens + 1)
    var t = 1
    i = 0
    while (i < bytes.length) {
      if (bytes(i) == ' '.toByte) { starts(t) = i + 1; t += 1 }
      i += 1
    }
    starts(nTokens) = bytes.length + 1
    val out = new Array[Long](nTokens - n + 1)
    var w = 0
    while (w <= nTokens - n) {
      var h = 0L
      var j = 0
      while (j < n) {
        if (j > 0) h = (h * 31L + ('_'.toByte & 0xffL)) % Mod
        var p = starts(w + j)
        val end = starts(w + j + 1) - 1
        while (p < end) { h = (h * 31L + (bytes(p) & 0xffL)) % Mod; p += 1 }
        j += 1
      }
      out(w) = h
      w += 1
    }
    sortedDistinct(out, out.length)
  }

  /** Winnowing fingerprints: portable_hash of every char k-gram (char
    * boundaries per UTF-8, matching `substr`), min of each w-window
    * (all grams when fewer than w), sorted distinct. */
  def winnowFingerprints(text: UTF8String, k: Int, w: Int): GenericArrayData = {
    val bytes = text.getBytes
    // char start offsets (UTF-8: a char starts at any byte not 10xxxxxx)
    var nChars = 0
    var i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) nChars += 1
      i += 1
    }
    if (nChars < k) return new GenericArrayData(Array.emptyLongArray)
    val offs = new Array[Int](nChars + 1)
    var c = 0
    i = 0
    while (i < bytes.length) {
      if ((bytes(i) & 0xC0) != 0x80) { offs(c) = i; c += 1 }
      i += 1
    }
    offs(nChars) = bytes.length
    val nGrams = nChars - k + 1
    val grams = new Array[Long](nGrams)
    var g = 0
    while (g < nGrams) {
      var h = 0L
      var p = offs(g)
      val end = offs(g + k)
      while (p < end) { h = (h * 31L + (bytes(p) & 0xffL)) % Mod; p += 1 }
      grams(g) = h
      g += 1
    }
    if (nGrams < w) return sortedDistinct(grams, nGrams)
    val mins = new Array[Long](nGrams - w + 1)
    var m = 0
    while (m <= nGrams - w) {
      var mn = grams(m)
      var j = 1
      while (j < w) { if (grams(m + j) < mn) mn = grams(m + j); j += 1 }
      mins(m) = mn
      m += 1
    }
    sortedDistinct(mins, mins.length)
  }

  def ngram_portable_hashes(text: Column, n: Int): Column =
    Bridge.column(NgramPortableHashes(Bridge.expression(text), n))

  def text_stats(text: Column, stopwords: Seq[String]): Column =
    Bridge.column(TextStats(Bridge.expression(text), stopwords))

  def lang_scores(text: Column, profiles: Seq[(String, Seq[String])]): Column =
    Bridge.column(LangScores(Bridge.expression(text), profiles))

  def winnow_fingerprints(text: Column, k: Int, w: Int): Column =
    Bridge.column(WinnowFingerprints(Bridge.expression(text), k, w))

  def repetition_stats(text: Column, n: Int): Column =
    Bridge.column(RepetitionStatsExpr(Bridge.expression(text), n))

  def normalize_text(text: Column): Column =
    Bridge.column(NormalizeTextExpr(Bridge.expression(text)))
}
