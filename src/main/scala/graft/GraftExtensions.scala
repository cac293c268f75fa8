package graft

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.functions.{FoldDot, HllDistinct, KmvDistinct, MinhashSignature,
  NgramHashes, PortableHash, SimhashBits, SortedIntersectCount, TopKBy,
  WkbEnvelopeCentroid, WkbPolygon}

/** SQL registration of the engine's custom codegen expressions, so the
  * full surface is usable from `spark.sql(...)` as well as the Column
  * API. Two entry points:
  *
  *  - session config (new sessions):
  *    `.config("spark.sql.extensions", "graft.GraftExtensions")` or
  *    `.withExtensions(new GraftExtensions)`
  *  - an existing session: `GraftFunctions.register(spark)`
  */
object GraftFunctions {

  type Builder = Seq[Expression] => Expression

  val functions: Seq[(FunctionIdentifier, ExpressionInfo, Builder)] = Seq(
    (FunctionIdentifier("portable_hash"),
      info("portable_hash", "portable_hash(str_or_bin) - byte fold (h*31+b) mod 1e9+7"),
      args => { require(args.length == 1, "portable_hash takes 1 argument")
        PortableHash(args.head) }),
    (FunctionIdentifier("fold_dot"),
      info("fold_dot", "fold_dot(arr, arr) - left-to-right dot product in double"),
      args => { require(args.length == 2, "fold_dot takes 2 arguments")
        FoldDot(args(0), args(1)) }),
    (FunctionIdentifier("simhash_bits"),
      info("simhash_bits", "simhash_bits(array<bigint>) - 30-bit simhash of token hashes"),
      args => { require(args.length == 1, "simhash_bits takes 1 argument")
        SimhashBits(args.head) }),
    (FunctionIdentifier("minhash_signature"),
      info("minhash_signature", "minhash_signature(array<bigint>, k) - k-slot minhash signature"),
      args => { require(args.length == 2, "minhash_signature takes 2 arguments")
        args(1) match {
          case Literal(k: Int, _) => MinhashSignature(args(0), k)
          case other => sys.error(s"minhash_signature k must be an int literal, got $other")
        } }),
    (FunctionIdentifier("ngram_hashes"),
      info("ngram_hashes", "ngram_hashes(text, n) - sorted distinct 64-bit word-n-gram hashes"),
      args => { require(args.length == 2, "ngram_hashes takes 2 arguments")
        args(1) match {
          case Literal(n: Int, _) => NgramHashes(args(0), n)
          case other => sys.error(s"ngram_hashes n must be an int literal, got $other")
        } }),
    (FunctionIdentifier("sorted_intersect_count"),
      info("sorted_intersect_count", "sorted_intersect_count(arr, arr) - |A∩B| of two sorted arrays"),
      args => { require(args.length == 2, "sorted_intersect_count takes 2 arguments")
        SortedIntersectCount(args(0), args(1)) }),
    (FunctionIdentifier("wkb_envelope_centroid"),
      info("wkb_envelope_centroid",
        "wkb_envelope_centroid(binary) - struct(minx,miny,maxx,maxy,cx,cy) of a WKB geometry"),
      args => { require(args.length == 1, "wkb_envelope_centroid takes 1 argument")
        WkbEnvelopeCentroid(args.head) }),
    (FunctionIdentifier("wkb_polygon"),
      info("wkb_polygon", "wkb_polygon(xs, ys) - single-ring polygon WKB from coordinate arrays"),
      args => { require(args.length == 2, "wkb_polygon takes 2 arguments")
        WkbPolygon(args(0), args(1)) }),
    (FunctionIdentifier("kmv_distinct"),
      info("kmv_distinct", "kmv_distinct(hash_bigint, k) - KMV distinct-count estimate"),
      args => { require(args.length == 2, "kmv_distinct takes 2 arguments")
        args(1) match {
          case Literal(k: Int, _) => KmvDistinct(args(0), k)
          case other => sys.error(s"kmv_distinct k must be an int literal, got $other")
        } }),
    (FunctionIdentifier("top_k_by"),
      info("top_k_by",
        "top_k_by(value_double, id_bigint, k) - best-first top-k (value desc, id asc) pairs"),
      args => { require(args.length == 3, "top_k_by takes 3 arguments")
        args(2) match {
          case Literal(k: Int, _) => TopKBy(args(0), args(1), k)
          case other => sys.error(s"top_k_by k must be an int literal, got $other")
        } }),
    (FunctionIdentifier("hll_distinct"),
      info("hll_distinct", "hll_distinct(hash_bigint) - HyperLogLog distinct-count estimate (64 registers)"),
      args => { require(args.length == 1, "hll_distinct takes 1 argument")
        HllDistinct(args.head) }),
    (FunctionIdentifier("repetition_stats"),
      info("repetition_stats",
        "repetition_stats(text, n) - struct(n_tokens, n_ngrams, n_distinct, top_tok) in one pass"),
      args => { require(args.length == 2, "repetition_stats takes 2 arguments")
        args(1) match {
          case Literal(n: Int, _) => graft.functions.RepetitionStatsExpr(args(0), n)
          case other => sys.error(s"repetition_stats n must be an int literal, got $other")
        } }),
    (FunctionIdentifier("normalize_text"),
      info("normalize_text",
        "normalize_text(text) - struct(clean_text, n_stripped, changed): CRLF->LF, NFC, zero-width/control strip"),
      args => { require(args.length == 1, "normalize_text takes 1 argument")
        graft.functions.NormalizeTextExpr(args.head) }),
    (FunctionIdentifier("upper_tri_products"),
      info("upper_tri_products",
        "upper_tri_products(vec, dim) - round6'd upper-triangle products v_i*v_j, i-major"),
      args => { require(args.length == 2, "upper_tri_products takes 2 arguments")
        args(1) match {
          case Literal(d: Int, _) => graft.functions.UpperTriProducts(args(0), d)
          case other => sys.error(s"upper_tri_products dim must be an int literal, got $other")
        } }),
    (FunctionIdentifier("micro_vec_sum"),
      info("micro_vec_sum",
        "micro_vec_sum(array<double>, len) - element-wise order-free sum on the 6dp grid"),
      args => { require(args.length == 2, "micro_vec_sum takes 2 arguments")
        args(1) match {
          case Literal(n: Int, _) => graft.functions.MicroVecSum(args(0), n)
          case other => sys.error(s"micro_vec_sum len must be an int literal, got $other")
        } }))

  private def info(name: String, usage: String) =
    new ExpressionInfo(GraftFunctions.getClass.getName, name, usage)

  /** Register into an already-running session's function registry. */
  def register(spark: SparkSession): Unit =
    functions.foreach { case (id, inf, b) =>
      spark.sessionState.functionRegistry.registerFunction(id, inf, b)
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.functions.foreach(ext.injectFunction)
}
