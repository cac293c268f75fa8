package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc operator diagnosis harness for development (not part of the
  * driver contract; graft.Bench is the official benchmark,
  * graft.Stress the scale harness). Current focus: per-stage
  * attribution of the kneser_ney stress scenario's spill/skew. */
object Scratch {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", (cpus.toInt * 4).toString)
      .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8MB")
      .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def tok(seed: org.apache.spark.sql.Column,
        i: org.apache.spark.sql.Column, vocab: Int) =
      concat(lit("t"), pmod(hash(seed, i), lit(vocab)))
    val n = sys.env.getOrElse("SCRATCH_N", "1000000").toLong
    // the Stress.corpus shape (clone every 100th doc), vocab-dialed:
    // kneser_ney uses vocab 2000, kn_trigram vocab 200
    def corpus(vocab: Int) = spark.range(n)
      .withColumn("seed",
        when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
          .otherwise(col("id")))
      .withColumn("text", concat(
        array_join(transform(sequence(lit(0), lit(119)),
          i => tok(col("seed"), i, vocab)), " "),
        when(pmod(col("id"), lit(100)) === 1, lit(" cloneextra"))
          .otherwise(lit(""))))
      .select(col("id"), col("text"))
    val d = corpus(2000)

    // Zipf-head fixture (the kneser_ney_zipf stress shape): 20% of
    // tokens are one head word → the head bigram is ~4% of all pairs.
    val z = spark.range(n).withColumn("text",
      array_join(transform(sequence(lit(0), lit(119)), i =>
        when(pmod(hash(col("id"), i, lit(13)), lit(5)) === 0, lit("the"))
          .otherwise(tok(col("id"), i, 2000))), " "))
      .select(col("id"), col("text"))

    val m = new StressMetrics
    spark.sparkContext.addSparkListener(m)
    val t0 = System.nanoTime()
    sys.env.getOrElse("SCRATCH_OP", "kn") match {
      case "cls" =>
        val dim = 1 << 18
        val dl = d.withColumn("label", pmod(hash(col("id")), lit(2)) === 0)
        val feats = graft.operators.Classifier.hashedFeaturesSparse(
          dl, "id", "text", col("label"), dim).localCheckpoint()
        println(s"SCRATCH feats built ${(System.nanoTime() - t0) / 1e9}")
        graft.operators.Classifier.trainLogisticSparse(
          feats, dim, iters = 2, lr = 0.5)
      case "url" =>      // the url_dedup stress fixture (50M messy URLs)
        val urls = spark.range(50000000L).select(col("id"),
          concat(lit("HTTP://Site"),
            pmod(col("id"), lit(1000)).cast("string"),
            lit(".COM:80/p/"),
            pmod(col("id"), lit(100000)).cast("string"),
            lit("?utm_source=x&b="), pmod(col("id"), lit(7)).cast("string"),
            lit("&a="), pmod(col("id"), lit(3)).cast("string"),
            lit("#f")).as("url"))
        graft.operators.Corpus.urlDupClusters(urls, col("id"), col("url"))
          .write.mode("overwrite").format("noop").save()
      case "est" =>      // size-estimate calibration for self-sizing widths
        // the stagedEntropyCorpus shape (len 200, vocab 2000) at n docs
        val ec = spark.range(n)
          .withColumn("seed",
            when(pmod(col("id"), lit(100)) === 1, col("id") - 1)
              .otherwise(col("id")))
          .withColumn("blk", pmod(hash(col("seed")), lit(16)))
          .withColumn("text", concat(
            array_join(transform(sequence(lit(0), lit(199)),
              i => tok(col("seed"), i, 2000)), " "),
            when(pmod(col("id"), lit(100)) === 1, lit(" cloneextra"))
              .otherwise(lit(""))))
          .select(col("id"), col("blk"), col("text"))
        val p = s"/tmp/graft_est_corpus_$n"
        ec.write.mode("overwrite").parquet(p)
        val r = spark.read.parquet(p)
        println(s"SCRATCH est n=$n sizeInBytes=" +
          r.queryExecution.optimizedPlan.stats.sizeInBytes)
        Seq("sf0.01", "sf0.1").foreach { sf =>
          val dpath = s"/root/testdata/$sf/documents.parquet"
          val dd = spark.read.parquet(dpath)
          println(s"SCRATCH est $sf documents sizeInBytes=" +
            dd.queryExecution.optimizedPlan.stats.sizeInBytes)
        }
      case "kn_plain" => // the kneser_ney stress fixture
        graft.operators.Corpus.knScore(d, "id", "text")
          .write.mode("overwrite").format("noop").save()
      case "kn3" =>      // the kn_trigram stress fixture (SCRATCH_VOCAB dials reuse)
        val v3 = sys.env.getOrElse("SCRATCH_VOCAB", "200").toInt
        graft.operators.Corpus.knTrigramScore(corpus(v3), "id", "text")
          .write.mode("overwrite").format("noop").save()
      case "kn3_pruned" =>
        val v3 = sys.env.getOrElse("SCRATCH_VOCAB", "200").toInt
        spark.conf.set("spark.graft.kn.boundedBuild", "true")
        graft.operators.Corpus.knTrigramScore(corpus(v3), "id", "text",
          minCount = 2)
          .write.mode("overwrite").format("noop").save()
      case _ =>          // the kneser_ney_zipf stress fixture
        val hotDf = sys.env.getOrElse("SCRATCH_HOTDF", "65536").toInt
        graft.operators.Corpus.knScore(z, "id", "text", hotDf = hotDf)
          .write.mode("overwrite").format("noop").save()
    }
    val wall = (System.nanoTime() - t0) / 1e9
    Thread.sleep(1000)
    println(f"SCRATCH op=${sys.env.getOrElse("SCRATCH_OP", "kn")} " +
      f"wall=$wall%.1f s byteSkew=${m.maxByteSkew()}%.2f  per-stage:")
    println(f"${"stage"}%6s ${"tasks"}%6s ${"writeMB"}%9s " +
      f"${"readMB"}%9s ${"spillMB"}%9s ${"maxMs"}%8s ${"medMs"}%8s " +
      f"${"mxRdMB"}%8s ${"mxWrMB"}%8s")
    m.perStage.sortBy(_._1).foreach {
      case (id, tasks, w, r, sp, mx, med, mxr, mxw) =>
        println(f"$id%6d $tasks%6d ${w / 1e6}%9.0f ${r / 1e6}%9.0f " +
          f"${sp / 1e6}%9.0f $mx%8d $med%8d ${mxr / 1e6}%8.0f " +
          f"${mxw / 1e6}%8.0f")
    }
  }
}
