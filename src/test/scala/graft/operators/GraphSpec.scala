package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  test("pagerank: symmetric pair gets equal ranks; hub outranks leaves") {
    val docs = (1L to 6L).toDF("doc_id")
    // star: 1 connected to 2,3,4; isolated pair 5-6
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L), (5L, 6L)).toDF("a_id", "b_id")
    val r = Graph.pageRank(docs, "doc_id", pairs, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r(1L) > r(2L)) // hub beats leaf
    assert(r(2L) === r(3L) && r(3L) === r(4L)) // symmetric leaves equal
    assert(r(5L) === r(6L)) // symmetric pair equal
    assert(r.values.forall(v => v > 0.0 && v < 1.0))
  }

  test("pagerank is partitioning-invariant (integer fixed point)") {
    val docs = (1L to 40L).toDF("doc_id")
    val pairs = (1L until 40L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val a = Graph.pageRank(docs.coalesce(1), "doc_id", pairs.coalesce(1), iters = 3)
    val b = Graph.pageRank(docs.repartition(16), "doc_id", pairs.repartition(8), iters = 3)
    assert(rows(a) === rows(b))
  }

  test("isolated vertices keep exactly the base rank") {
    val docs = (1L to 4L).toDF("doc_id")
    val pairs = Seq((1L, 2L)).toDF("a_id", "b_id")
    val r = Graph.pageRank(docs, "doc_id", pairs, iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val base = (Graph.Scale * 15L / 100L / 4L).toDouble / Graph.Scale
    assert(r(3L) === base && r(4L) === base)
  }
}
