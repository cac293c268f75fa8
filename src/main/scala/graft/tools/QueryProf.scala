package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: run named SparkEntry queries bench-shaped (local[$CPUS],
  * shuffle = cpus, AQE on, noop sink, warm tables) with a
  * [[StressMetrics]] listener attached, and print per-stage wall/CPU/
  * byte rows per trial — the measurement seam guide §1 asks for before
  * any change. Usage:
  *   SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32 \
  *     runMain graft.tools.QueryProf q108_proximity_stream [more ...]
  * SPARK_GRAFT_PROF_TRIALS (default 2) trials per query; per-stage rows
  * print for the LAST trial (steady state).
  */
object QueryProf {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val trials = sys.env.getOrElse("SPARK_GRAFT_PROF_TRIALS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROF_AQE", "true"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.checkpoint.fileChecksum.enabled",
        sys.env.getOrElse("SPARK_GRAFT_PROF_CKSUM", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "part", "events",
      "documents", "embeddings", "nation", "region")
      .foreach(t => try spark.read.parquet(s"$sfDir/$t.parquet")
        .write.mode("overwrite").format("noop").save()
        catch { case _: Throwable => () })
    val m = new StressMetrics
    spark.sparkContext.addSparkListener(m)
    // SPARK_GRAFT_PROF_SAMPLE_MS=N: in-process stack sampler over the
    // executor task threads (jstack/jcmd cannot attach in this
    // sandbox); prints a frame histogram per query so non-CPU task
    // wall can be attributed (blocked-on-what, not just how-long).
    val sampleMs = sys.env.get("SPARK_GRAFT_PROF_SAMPLE_MS").map(_.toInt)
    val sampleHist = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = true
    val sampler = sampleMs.map { ms =>
      val t = new Thread(() => {
        while (sampling) {
          val it = Thread.getAllStackTraces.entrySet.iterator
          while (it.hasNext) {
            val e = it.next()
            val name = e.getKey.getName
            if (name.startsWith("Executor task launch")) {
              val st = e.getValue
              if (st.nonEmpty) {
                val state = e.getKey.getState.toString
                // first meaningful frame + the first spark/graft frame
                val top = st.head.toString
                val own = st.find(f => {
                  val c = f.getClassName
                  (c.startsWith("org.apache.spark") || c.startsWith("graft")) &&
                    !c.contains("Unsafe")
                }).map(_.toString).getOrElse("")
                val key = s"$state | $top | $own"
                sampleHist.merge(key, Integer.valueOf(1),
                  (a, b) => Integer.valueOf(a.intValue + b.intValue))
              }
            }
          }
          Thread.sleep(ms.toLong)
        }
      }, "graft-prof-sampler")
      t.setDaemon(true); t.start(); t
    }
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      for (t <- 1 to trials) {
        System.gc(); Thread.sleep(100)
        spark.catalog.clearCache()
        m.reset()
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.mode("overwrite").format("noop").save()
        val sec = (System.nanoTime() - t0) / 1e9
        val s = m.snapshot()
        println(f"[prof] $name trial $t wall=$sec%.3f s stages=${s.stageCount}" +
          f" tasks=${s.taskCount} shufW=${s.shuffleWriteBytes}" +
          f" shufR=${s.shuffleReadBytes} spill=${s.spillBytes}" +
          f" skew1s=${s.maxTaskSkew1s}%.2f cpuSkew1s=${s.maxTaskSkew1sCpu}%.2f")
        if (t == trials) {
          println("[prof]   stage tasks    writeB     readB    spillB " +
            "maxMs medMs | medCpu maxCpu gcOfMax")
          val cpu = m.perStageCpu.map(r => r._1 -> r).toMap
          m.perStage.sortBy(-_._6).foreach {
            case (id, n, w, r, sp, mx, med, _, _) =>
              val c = cpu.get(id)
              println(f"[prof]   $id%5d $n%5d $w%9d $r%9d $sp%9d $mx%5d $med%5d" +
                f" | ${c.map(_._4).getOrElse(0L)}%6d ${c.map(_._5).getOrElse(0L)}%6d" +
                f" ${c.map(_._6).getOrElse(0L)}%7d")
          }
        }
      }
      if (sampleMs.isDefined) {
        println(s"[prof] $name task-thread sample histogram (top 15):")
        import scala.jdk.CollectionConverters._
        sampleHist.asScala.toSeq.sortBy(-_._2.intValue).take(15).foreach {
          case (k, v) => println(s"[prof]   $v  $k")
        }
        sampleHist.clear()
      }
    }
    sampling = false
    sampler.foreach(_.join(1000))
    spark.stop()
  }
}
