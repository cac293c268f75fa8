package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewSpec extends SparkSpec {
  import spark.implicits._

  private def skewed = (
    Seq.fill(500)(("hot", 1.0)) ++ Seq.tabulate(50)(i => (s"k$i", i.toDouble))
  ).toDF("k", "v")

  test("salted aggregate == plain aggregate (sum/count/avg)") {
    val plain = skewed.groupBy("k")
      .agg(sum($"v").as("s"), count(lit(1)).as("c"))
      .withColumn("avg", $"s" / $"c")
    val salted = Skew.saltedAggregate(skewed, Seq("k"), buckets = 8,
      partial = Seq(sum($"v").as("s"), count(lit(1)).as("c")),
      merge = Seq(sum($"s").as("s"), sum($"c").as("c")))
      .withColumn("avg", $"s" / $"c")
    assert(rows(plain) == rows(salted))
  }

  test("salted aggregate stage 1 actually splits the hot key") {
    val salted = skewed.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(8)))
    val hotSplits = salted.filter($"k" === "hot")
      .select("__salt").distinct().count()
    assert(hotSplits > 1) // the hot key spans multiple salt buckets
  }

  test("salted join == plain join") {
    val right = Seq(("hot", 99), ("k1", 1), ("k2", 2)).toDF("k", "tag")
    val plain = skewed.join(right, "k")
    val salted = Skew.saltedJoin(skewed, right, Seq("k"), buckets = 4)
    assert(plain.count() == salted.count())
    assert(rows(plain.select("k", "v", "tag")) == rows(salted.select("k", "v", "tag")))
  }
}
