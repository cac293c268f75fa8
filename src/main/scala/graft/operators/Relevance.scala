package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** IR relevance scoring over the document table — the corpus-curation
  * use of TF-IDF/BM25: score documents' terms against the corpus so a
  * pipeline can keyword-filter, build weak topic labels, or rank
  * near-duplicate survivors by informativeness.
  *
  * Scale design: one term explode feeding two aggregations — per-(doc,
  * term) tf (hash agg) and per-term df (hash agg over the tf table, so
  * document text is exploded exactly ONCE and the df aggregate reads
  * the much smaller tf table). N and avg doc length are scalar plan
  * parameters (two driver doubles). The tf⋈df join is keyed by term —
  * at web scale the df table is vocabulary-sized, so it stays a
  * shuffle join (AQE may broadcast a small vocab); stopword-grade hot
  * terms are naturally spread because the join key is (term) on the
  * POSTINGS side whose rows are distinct (doc, term) pairs. */
object Relevance {

  /** The shared BM25 derivation — ONE definition of the tf/df/length
    * tables and the Okapi score expression, so [[bm25TopTerms]] and
    * [[bm25QueryRank]] (and their oracle mirrors) can never drift:
    * (tf table checkpointed — it feeds df counts, doc lengths and the
    * final join, plus the eager stats scalar — document text is
    * exploded exactly once in the whole plan; per-term score column
    * referencing tf/df/dl). */
  private def bm25Core(
      docs: DataFrame, idCol: String, textCol: String,
      k1: Double, b: Double): (DataFrame, DataFrame, DataFrame, Column) = {
    val toks = docs.select(col(idCol).as("doc_id"),
        explode(split(col(textCol), " ")).as("term"))
      .filter(col("term") =!= "")
    val tf = toks.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint(eager = false)
    val lens = tf.groupBy(col("doc_id")).agg(sum(col("tf")).as("dl"))
    val dfT = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val stats = lens.agg(count(lit(1)).cast("double"),
      sum(col("dl")).cast("double")).head()
    val nDocs = stats.getDouble(0)
    val avgDl = stats.getDouble(1) / nDocs
    val idf = log(lit(1.0) +
      (lit(nDocs) - col("df") + lit(0.5)) / (col("df") + lit(0.5)))
    val score = idf * (col("tf") * lit(k1 + 1.0)) /
      (col("tf") + lit(k1) * (lit(1.0) - lit(b) +
        lit(b) * col("dl").cast("double") / lit(avgDl)))
    (tf, dfT, lens, score)
  }

  /** Top-`topK` BM25 terms per document: (doc_id, term, score, rank).
    * Okapi BM25 with the standard idf = ln(1 + (N−df+0.5)/(df+0.5));
    * deterministic ties (score desc, term asc). */
  def bm25TopTerms(
      docs: DataFrame, idCol: String, textCol: String,
      k1: Double = 1.2, b: Double = 0.75, topK: Int = 3): DataFrame = {
    val (tf, dfT, lens, score) = bm25Core(docs, idCol, textCol, k1, b)
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term").asc)
    tf.join(dfT, "term").join(lens, "doc_id")
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
      .select(col("doc_id"), col("term"),
        graft.functions.TextFunctions.round6(col("score")).as("score"),
        col("rank"))
  }

  /** BM25 RETRIEVAL ranking: every document scored against a
    * bag-of-words query — score(d) = Σ_{t ∈ query} bm25(t, d) over the
    * distinct query terms, each contribution rounded to 6dp and
    * accumulated as DECIMAL(28,6) (order-free exact — the engine's
    * "sum of floats" policy), ranked (score desc, id asc). Corpus
    * statistics (df, N, avgdl) come from the FULL corpus exactly as in
    * [[bm25TopTerms]] (one shared [[bm25Core]] derivation); the probe
    * then filters the tf table to the query's terms, so the scoring
    * join touches |query| postings lists, not the whole vocabulary.
    * Returns (doc_id, score, rank) for documents matching ≥ 1 query
    * term; the rank window runs over that match set, so queries of
    * stopword-grade terms should cap it upstream. */
  def bm25QueryRank(
      docs: DataFrame, idCol: String, textCol: String,
      queryTerms: Seq[String],
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    val (tf, dfT, lens, score) = bm25Core(docs, idCol, textCol, k1, b)
    val w = Window.orderBy(col("score").desc, col("doc_id").asc)
    tf.filter(col("term").isin(queryTerms.distinct: _*))
      .join(dfT, "term").join(lens, "doc_id")
      .select(col("doc_id"),
        graft.functions.TextFunctions.round6(score).as("x"))
      .groupBy(col("doc_id"))
      .agg(sum(col("x").cast("decimal(28,6)")).cast("double").as("score"))
      .withColumn("rank", row_number().over(w))
  }

  /** RECIPROCAL RANK FUSION (Cormack et al.): fuse any number of
    * ranked lists — rrf(d) = Σ_lists round6(1/(kRrf + rank_d)), each
    * contribution rounded then DECIMAL-summed (order-free exact), so
    * the fused ranking is deterministic and oracle-mirrorable. The
    * standard lexical+semantic hybrid-retrieval combiner; absent ids
    * simply contribute nothing from that list. Inputs: (id, rank)
    * DataFrames. Returns the fused top-`topK`: (id, rrf, rank). */
  def rrfFuse(
      rankings: Seq[DataFrame], kRrf: Int = 60, topK: Int = 20): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    val contrib = rankings.map(_.select(col("id"),
      graft.functions.TextFunctions.round6(
        lit(1.0) / (lit(kRrf.toDouble) + col("rank").cast("double"))).as("x")))
      .reduce(_ unionByName _)
    val w = Window.orderBy(col("rrf").desc, col("id").asc)
    contrib.groupBy(col("id"))
      .agg(sum(col("x").cast("decimal(28,6)")).cast("double").as("rrf"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= topK)
  }
}
