package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextFunctions._

/** Deduplication operators for the training-data pipeline surface.
  *
  * Scale design: exact dedup is a single hash aggregation on the text
  * (or a cheap fingerprint of it); near-dup dedup avoids the O(n²)
  * all-pairs comparison via MinHash+LSH — the only shuffles are
  * (a) the explode+groupBy on band keys, whose cardinality is
  * n·bands, and (b) the candidate-pair join, whose size is the number
  * of colliding pairs (≪ n²). Exact-Jaccard verification then runs
  * only on candidates. At 100 TB the signature computation is
  * embarrassingly parallel per document, and the band shuffle is the
  * one data movement — keyed well (band, bkey) so skew only occurs if
  * many docs are near-identical, which is exactly when you want them
  * co-located.
  */
object Dedup {

  /** Exact dedup: keep the smallest id per identical text; returns
    * (keep_id, n_copies, text_hash). */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.groupBy(col(textCol))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** MinHash+LSH near-duplicate pairs, verified by exact Jaccard on
    * word n-gram shingles.
    *
    * @param n        shingle width (words)
    * @param k        minhash functions (= bands·rowsPerBand)
    * @param bands    LSH bands; P(detect | J) = 1-(1-J^r)^bands
    * @param threshold exact-Jaccard acceptance threshold
    * @return (a_id, b_id, jaccard) with a_id < b_id, jaccard rounded 6dp
    */
  def minhashLsh(
      docs: DataFrame, idCol: String, textCol: String,
      n: Int = 3, k: Int = 64, bands: Int = 16,
      threshold: Double = 0.8): DataFrame = {
    val r = k / bands
    require(bands * r == k, "k must be divisible by bands")

    val sh = docs.select(
      col(idCol).as("id"),
      shingles(col(textCol), n).as("sh"))
      .filter(size(col("sh")) > 0)
      .withColumn("hashes", transform(col("sh"), s => graft.functions.PortableHash.portable_hash(s)))
    val sig = sh.withColumn("sig", minhashSignature(col("hashes"), k))

    // explode band keys → bucket join
    val banded = sig.select(col("id"),
      explode(bandKeys(col("sig"), bands, r)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.bkey").as("bkey"))
    val a = banded.alias("a")
    val b = banded.alias("b")
    val candidates = a.join(b,
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col("a.id") < col("b.id"))
      .select(col("a.id").as("a_id"), col("b.id").as("b_id"))
      .distinct()

    // exact verification on the candidate set only
    val shA = sh.select(col("id").as("a_id"), col("sh").as("sh_a"))
    val shB = sh.select(col("id").as("b_id"), col("sh").as("sh_b"))
    candidates
      .join(shA, "a_id").join(shB, "b_id")
      .withColumn("jaccard", round(jaccard(col("sh_a"), col("sh_b")), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** SimHash near-duplicate pairs: 30-bit simhash, pairs within the
    * given Hamming distance. All-pairs here (fine below ~100k docs);
    * the scale path blocks on simhash prefix bands (see
    * [[simhashSignatures]] — grouping on `simhash / 2^b` gives the
    * standard rotation/blocking scheme). */
  def simhashPairs(
      docs: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sigs = simhashSignatures(docs, idCol, textCol)
    val a = sigs.select(col("id").as("a_id"), col("simhash").as("sh_a"))
    val b = sigs.select(col("id").as("b_id"), col("simhash").as("sh_b"))
    a.join(b, col("a_id") < col("b_id"))
      .withColumn("hamming", hammingDistance(col("sh_a"), col("sh_b")))
      .filter(col("hamming") <= maxHamming)
      .select(col("a_id"), col("b_id"), col("hamming"))
  }

  /** Per-document 30-bit simhash signatures: (id, simhash). */
  def simhashSignatures(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(col(idCol).as("id"), simhash(col(textCol)).as("simhash"))

  /** Exact n-gram-Jaccard near-dup pairs within a blocking key — the
    * all-pairs fallback: |A∩B| via the codegen'd two-pointer merge over
    * sorted shingle arrays. Same values as [[ngramJaccardPairs]].
    * MEASURED at sf0.1: loses to the inverted index 109 s vs 9 s —
    * per-element UTF8String materialization in the merge outweighs the
    * join-row explosion it avoids. Keep only for tiny blocks where
    * block² is small and the shingle shuffle isn't. */
  def ngramJaccardPairsDense(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double): DataFrame = {
    import graft.functions.SortedIntersectCount.sorted_intersect_count
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      array_sort(shingles(col(textCol), n)).as("sh"))
      .filter(size(col("sh")) > 0)
    val a = sh.select(col("blk"), col("id").as("a_id"), col("sh").as("sh_a"),
      size(col("sh")).as("n_a")).repartition(col("a_id"))
    val b = sh.select(col("blk").as("blk_b"), col("id").as("b_id"),
      col("sh").as("sh_b"), size(col("sh")).as("n_b"))
    a.join(broadcast(b), col("blk") === col("blk_b") && col("a_id") < col("b_id"))
      .withColumn("inter", sorted_intersect_count(col("sh_a"), col("sh_b")))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }

  /** Exact n-gram-Jaccard near-dup pairs within a blocking key (e.g.
    * language), via an inverted index: explode shingles, equi-join on
    * (block, shingle), count matches per pair → |A∩B|, and derive
    * |A∪B| = |A|+|B|−|A∩B|. Identical result set to the all-pairs
    * formulation for threshold > 0 (a positive Jaccard needs ≥1 shared
    * shingle) but the join is keyed on shingles — work scales with
    * actually-overlapping pairs, not block². At 100 TB with a sparse
    * vocabulary this is the default; for DENSE vocabularies use
    * [[ngramJaccardPairsDense]]. Skew on stock phrases → stopword
    * shingle filter or salting. */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String, blockCol: String,
      n: Int, threshold: Double): DataFrame = {
    val sh = docs.select(col(idCol).as("id"), col(blockCol).as("blk"),
      shingles(col(textCol), n).as("sh")).filter(size(col("sh")) > 0)
    val inv = sh.select(col("id"), col("blk"), size(col("sh")).as("n_sh"),
      explode(col("sh")).as("shingle"))
    val a = inv.select(col("blk"), col("shingle"),
      col("id").as("a_id"), col("n_sh").as("n_a"))
    val b = inv.select(col("blk").as("blk_b"), col("shingle").as("shingle_b"),
      col("id").as("b_id"), col("n_sh").as("n_b"))
    a.join(b, col("blk") === col("blk_b") &&
        col("shingle") === col("shingle_b") && col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"), col("n_a"), col("n_b"))
      .agg(count(lit(1)).as("inter"))
      .withColumn("jaccard", round(col("inter").cast("double") /
        (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
      .filter(col("jaccard") >= threshold)
      .select(col("a_id"), col("b_id"), col("jaccard"))
  }
}
