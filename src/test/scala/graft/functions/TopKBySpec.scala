package graft.functions

import graft.SparkSpec
import graft.functions.TopKBy.top_k_by
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import scala.util.Random

class TopKBySpec extends SparkSpec {
  import spark.implicits._

  private def heapTopK(df: org.apache.spark.sql.DataFrame, k: Int) =
    df.groupBy($"g")
      .agg(top_k_by($"v", $"id", k).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "p")))
      .select($"g", $"p.id".as("id"), $"p.v".as("v"),
        ($"pos" + 1).cast("int").as("rank"))

  private def windowTopK(df: org.apache.spark.sql.DataFrame, k: Int) = {
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    df.withColumn("rank", row_number().over(w)).filter($"rank" <= k)
      .select($"g", $"id", $"v", $"rank")
  }

  test("matches the window form on random data, including ties") {
    val rnd = new Random(7)
    // coarse values force value-ties; 40 partitions force real merges
    val data = (0L until 5000L).map(i =>
      (rnd.nextInt(20).toLong, i, rnd.nextInt(50).toDouble))
      .toDF("g", "id", "v").repartition(40)
    assert(rows(heapTopK(data, 3)) === rows(windowTopK(data, 3)))
    assert(rows(heapTopK(data, 1)) === rows(windowTopK(data, 1)))
  }

  test("groups smaller than k return all rows, best first") {
    val data = Seq((1L, 10L, 5.0), (1L, 11L, 7.0)).toDF("g", "id", "v")
    val out = heapTopK(data, 5).orderBy($"rank").collect()
    assert(out.length === 2)
    assert(out(0).getLong(1) === 11L && out(0).getInt(3) === 1)
    assert(out(1).getLong(1) === 10L && out(1).getInt(3) === 2)
  }

  test("duplicate (value, id) rows keep multiset semantics like row_number") {
    val data = Seq((1L, 7L, 5.0), (1L, 7L, 5.0), (1L, 8L, 1.0))
      .toDF("g", "id", "v").repartition(3) // duplicates cross partials
    assert(rows(heapTopK(data, 2)) === rows(windowTopK(data, 2)))
    val out = heapTopK(data, 2).orderBy($"rank").collect()
    assert(out.map(_.getLong(1)).toSeq === Seq(7L, 7L)) // dup outranks v=1.0
  }

  test("nulls are skipped, not ranked") {
    val data = Seq[(Long, java.lang.Long, java.lang.Double)](
      (1L, 10L, null), (1L, null, 3.0), (1L, 12L, 1.0))
      .toDF("g", "id", "v")
      .select($"g", $"id".cast("long").as("id"), $"v".cast("double").as("v"))
    val out = heapTopK(data, 3).collect()
    assert(out.map(_.getLong(1)).toSet === Set(12L))
  }

  test("string ids: same (v desc, id asc) total order, survives shuffle") {
    import org.apache.spark.sql.expressions.Window
    val data = Seq(
      (1L, "bb", 5.0), (1L, "aa", 5.0), (1L, "cc", 9.0), (1L, "dd", 1.0),
      (2L, "zz", 2.0), (2L, "yy", 2.0))
      .toDF("g", "id", "v").repartition(4) // force partial merges
    val heap = data.groupBy($"g").agg(top_k_by($"v", $"id", 2).as("tk"))
      .select($"g", posexplode($"tk").as(Seq("pos", "p")))
      .select($"g", $"p.id".as("id"), $"p.v".as("v"),
        ($"pos" + 1).cast("int").as("rank"))
    val w = Window.partitionBy($"g").orderBy($"v".desc, $"id".asc)
    val win = data.withColumn("rank", row_number().over(w))
      .filter($"rank" <= 2).select($"g", $"id", $"v", $"rank")
    assert(rows(heap) === rows(win)) // ties broken by STRING id asc
  }

  test("plan: hash aggregate with partial merge, no sort, no window") {
    val data = (0L until 100L).map(i => (i % 5, i, i.toDouble)).toDF("g", "id", "v")
    val plan = data.groupBy($"g").agg(top_k_by($"v", $"id", 3).as("tk"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    // ObjectHashAggregate (TypedImperativeAggregate path) in two phases
    assert(plan.contains("ObjectHashAggregate"))
    assert(plan.contains("partial_top_k_by") || plan.contains("partial top_k_by")
      || plan.toLowerCase.contains("partial"))
  }
}
