package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.unsafe.types.UTF8String

/** URL CANONICALIZATION — the crawl-dedup normalizer (every web corpus
  * dedups by canonical URL before touching content; CommonCrawl /
  * RefinedWeb lineage). One fused kernel per row; the normalization is
  * a FIXED, documented contract an external SQL oracle replays with
  * builtin string/list functions:
  *  1. drop the fragment — everything from the FIRST `#`;
  *  2. parse `^([^:/?#]+)://(rest)` — a non-matching input (no
  *     scheme) is returned as-is after step 1 (fail-open: an opaque
  *     key still dedups exact matches);
  *  3. authority = `rest` up to the first `/` or `?`, LOWERCASED
  *     (scheme too); default ports stripped (`http…:80`,
  *     `https…:443`);
  *  4. path (first `/` through before `?`) is case-PRESERVED and
  *     otherwise untouched (paths are case-sensitive server-side);
  *  5. query: split on `&`, drop empty params and tracking params
  *     (key starts with `utm_`, or key ∈ {gclid, fbclid, msclkid});
  *     survivors sort lexicographically (binary order, whole `k=v`
  *     string) and rejoin; an empty survivor set drops the `?`.
  */
case class CanonicalizeUrl(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "canonicalize_url"
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"canonicalize_url needs STRING, got ${other.catalogString}")
  }
  override def nullSafeEval(input: Any): Any =
    UrlKernels.canonicalizeUrl(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.UrlKernels.canonicalizeUrl($s);")
  override protected def withNewChildInternal(newChild: Expression): CanonicalizeUrl =
    copy(child = newChild)
}

object UrlKernels {

  /** Tracking-parameter keys dropped by the canonicalizer (exact). */
  val TrackingKeys: Set[String] = Set("gclid", "fbclid", "msclkid")

  /** Static entry for [[CanonicalizeUrl]] — the documented contract. */
  def canonicalizeUrl(url: UTF8String): UTF8String = {
    var s = url.toString
    // 1. fragment
    val hash = s.indexOf('#')
    if (hash >= 0) s = s.substring(0, hash)
    // 2. scheme
    val sep = s.indexOf("://")
    if (sep <= 0) return UTF8String.fromString(s)
    val schemePart = s.substring(0, sep)
    var k = 0
    while (k < schemePart.length) {
      val c = schemePart.charAt(k)
      if (c == ':' || c == '/' || c == '?' || c == '#')
        return UTF8String.fromString(s) // not a scheme — fail open
      k += 1
    }
    val scheme = schemePart.toLowerCase(java.util.Locale.ROOT)
    val rest = s.substring(sep + 3)
    // 3. authority
    var aEnd = 0
    while (aEnd < rest.length && rest.charAt(aEnd) != '/' &&
           rest.charAt(aEnd) != '?') aEnd += 1
    var auth = rest.substring(0, aEnd).toLowerCase(java.util.Locale.ROOT)
    if (scheme == "http" && auth.endsWith(":80"))
      auth = auth.substring(0, auth.length - 3)
    else if (scheme == "https" && auth.endsWith(":443"))
      auth = auth.substring(0, auth.length - 4)
    val tail = rest.substring(aEnd)
    // 4./5. path | query
    val qPos = tail.indexOf('?')
    val path = if (qPos < 0) tail else tail.substring(0, qPos)
    val query = if (qPos < 0) "" else tail.substring(qPos + 1)
    val kept = query.split("&", -1).filter { p =>
      if (p.isEmpty) false
      else {
        val eq = p.indexOf('=')
        val key = if (eq < 0) p else p.substring(0, eq)
        !(key.startsWith("utm_") || TrackingKeys.contains(key))
      }
    }
    // sort in CODE-POINT order (== UTF-8 byte order), not Java's
    // UTF-16 code-unit order: the two disagree exactly where a BMP
    // char in U+E000–U+FFFF meets a supplementary char (surrogates
    // compare below 0xE000 code-unit-wise), and the documented
    // contract — which external byte-comparing engines (DuckDB
    // list_sort on UTF-8) replay — is binary order.
    java.util.Arrays.sort(kept, codePointOrder)
    val qs = if (kept.isEmpty) "" else kept.mkString("?", "&", "")
    UTF8String.fromString(scheme + "://" + auth + path + qs)
  }

  /** Code-point comparator (≡ comparing the strings' UTF-8 bytes
    * unsigned, without allocating the byte arrays). */
  private val codePointOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      override def compare(a: String, b: String): Int = {
        var i = 0
        var j = 0
        while (i < a.length && j < b.length) {
          val ca = a.codePointAt(i)
          val cb = b.codePointAt(j)
          if (ca != cb) return Integer.compare(ca, cb)
          i += Character.charCount(ca)
          j += Character.charCount(cb)
        }
        Integer.compare(a.length - i, b.length - j)
      }
    }

  def canonicalize_url(url: Column): Column =
    Bridge.column(CanonicalizeUrl(Bridge.expression(url)))
}
