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
