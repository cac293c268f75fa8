package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc timing harness for operator variants (not part of the
  * driver contract; graft.Bench is the official benchmark). */
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .repartition(32, col("doc_id"))
    docs.write.mode("overwrite").format("noop").save() // warm

    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"SCRATCH $name ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }

    time("inverted_full")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      "lang", 2, 0.4).write.mode("overwrite").format("noop").save())
    time("inverted_full_warm")(Dedup.ngramJaccardPairs(docs, "doc_id", "text",
      "lang", 2, 0.4).write.mode("overwrite").format("noop").save())
    // how much of inverted_full is the DOUBLE shingle computation?
    locally {
      import graft.functions.TextFunctions._
      val sh = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
        shingles(col("text"), 2).as("sh")).filter(size(col("sh")) > 0)
      val inv = sh.select(col("id"), col("blk"), size(col("sh")).as("n_sh"),
          explode(col("sh")).as("shingle"))
        .select(col("id"), col("blk"), col("n_sh"), xxhash64(col("shingle")).as("h"))
        .persist()
      inv.write.mode("overwrite").format("noop").save()
      val a = inv.select(col("blk"), col("h"), col("id").as("a_id"), col("n_sh").as("n_a"))
      val b = inv.select(col("blk").as("blk_b"), col("h").as("h_b"),
        col("id").as("b_id"), col("n_sh").as("n_b"))
      time("inverted_joingroup_only") {
        a.join(b, col("blk") === col("blk_b") && col("h") === col("h_b") &&
            col("a_id") < col("b_id"))
          .groupBy(col("a_id"), col("b_id"), col("n_a"), col("n_b"))
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard", round(col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
          .filter(col("jaccard") >= 0.4)
          .write.mode("overwrite").format("noop").save()
      }
      inv.unpersist()
    }
    locally {
      import graft.functions.NgramHashes.ngram_hashes
      val sh = docs.select(col("doc_id").as("id"), col("lang").as("blk"),
        ngram_hashes(col("text"), 2).as("hs")).filter(size(col("hs")) > 0)
      val inv = sh.select(col("id"), col("blk"), size(col("hs")).as("n_sh"),
        explode(col("hs")).as("h"))
      time("ngram_postings_only")(inv.write.mode("overwrite").format("noop").save())
      val a = inv.select(col("blk"), col("h"), col("id").as("a_id"), col("n_sh").as("n_a"))
      val b = inv.select(col("blk").as("blk_b"), col("h").as("h_b"),
        col("id").as("b_id"), col("n_sh").as("n_b"))
      time("unsalted_inverted_full") {
        a.join(b, col("blk") === col("blk_b") && col("h") === col("h_b") &&
            col("a_id") < col("b_id"))
          .groupBy(col("a_id"), col("b_id"), col("n_a"), col("n_b"))
          .agg(count(lit(1)).as("inter"))
          .withColumn("jaccard", round(col("inter").cast("double") /
            (col("n_a") + col("n_b") - col("inter")).cast("double"), 6))
          .filter(col("jaccard") >= 0.4)
          .write.mode("overwrite").format("noop").save()
      }
    }
    val embs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(32, col("vec_id"))
    embs.write.mode("overwrite").format("noop").save()
    time("ivf_seeds_only") {
      embs.select(col("vec_id").cast("long").as("id"),
        transform(col("embedding"), _.cast("double")).as("v"))
        .orderBy(col("id")).limit(16).collect()
    }
    time("ivf_centroids_3it") {
      Similarity.ivfCentroids(embs, nLists = 16, iters = 3)
    }
    time("ivf_topk_full") {
      Similarity.ivfTopK(embs, embs.filter(col("vec_id") < 8), k = 5,
        nLists = 16, nProbe = 4).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
