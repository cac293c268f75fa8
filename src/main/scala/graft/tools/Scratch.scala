package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc operator timing harness for development (not part of the
  * driver contract; graft.Bench is the official benchmark). Runs the
  * historically hot operators against SPARK_GRAFT_SF_DIR. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.operators.{Dedup, Similarity}

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    def noop(df: org.apache.spark.sql.DataFrame): Unit =
      df.write.mode("overwrite").format("noop").save()

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32, col("doc_id"))
    noop(docs) // warm the scan
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(32, col("vec_id"))
    noop(embs)

    time("ngram_jaccard_cold")(noop(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 2, 0.4)))
    time("ngram_jaccard_warm")(noop(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text", "lang", 2, 0.4)))
    time("ngram_jaccard_prefix")(noop(
      Dedup.ngramJaccardPairsPrefix(docs, "doc_id", "text", "lang", 2, 0.4)))
    time("ngram_jaccard_bitmap_cold")(noop(
      Dedup.ngramJaccardPairsBitmap(docs, "doc_id", "text", "lang", 2, 0.4)))
    time("ngram_jaccard_bitmap_warm")(noop(
      Dedup.ngramJaccardPairsBitmap(docs, "doc_id", "text", "lang", 2, 0.4)))
    time("simhash_blocked_h3")(noop(
      Dedup.simhashPairsBlocked(docs, "doc_id", "text", maxHamming = 3)))
    time("minhash_lsh")(noop(
      Dedup.minhashLsh(docs, "doc_id", "text", n = 3, k = 64, bands = 16,
        threshold = 0.8)))
    time("ivf_centroids_3it")(
      Similarity.ivfCentroids(embs, nLists = 16, iters = 3))
    time("ivf_centroids_again")(
      Similarity.ivfCentroids(embs, nLists = 16, iters = 3))
    time("ivf_topk")(noop(
      Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 8), k = 5,
        nLists = 16, nProbe = 4)))
    time("ivf_topk_warm")(noop(
      Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 8), k = 5,
        nLists = 16, nProbe = 4)))
    spark.stop()
  }
}
