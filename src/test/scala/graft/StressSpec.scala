package graft

import graft.tools.StressMetrics

/** Harness check for [[Stress]]: every scenario builds and completes
  * at ~1/2000 scale with the listener attached, and the metrics it
  * reports are coherent (tasks ran, shuffles were observed where the
  * operator must exchange). The full-scale measurements live in
  * stress_out.json / SCALE.md and run via `runMain graft.Stress` —
  * this spec pins that the scenario code itself stays runnable so the
  * measured rows stay reproducible. */
class StressSpec extends SparkSpec {

  test("all stress scenarios complete at spec scale with coherent metrics") {
    val listener = new StressMetrics
    spark.sparkContext.addSparkListener(listener)
    try {
      Stress.scenarios(0.0005).foreach { sc =>
        val (action, inputRows) = sc.build(spark)
        listener.reset()
        assert(inputRows > 0, sc.name)
        action()
        var last = -1; var stable = 0
        while (stable < 3) {
          Thread.sleep(100)
          val now = listener.snapshot().taskCount
          if (now == last) stable += 1 else { stable = 0; last = now }
        }
        val m = listener.snapshot()
        assert(m.taskCount > 0, sc.name)
        assert(m.maxTaskSkew >= 1.0, sc.name)
        // every scenario here exists BECAUSE it exchanges: a zero
        // shuffle reading means the listener (or the scenario) broke —
        // except proximity_join, whose tiny form legitimately
        // broadcasts one side
        if (sc.name != "proximity_join")
          assert(m.shuffleWriteBytes > 0, s"${sc.name}: no shuffle observed")
      }
    } finally spark.sparkContext.removeSparkListener(listener)
  }
}
