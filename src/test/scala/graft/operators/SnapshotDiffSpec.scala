package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SnapshotDiffSpec extends SparkSpec {
  import spark.implicits._

  test("statuses: added, removed, changed, unchanged") {
    val old = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"), (4L, "delta"))
      .toDF("doc_id", "text")
    val next = Seq((1L, "alpha"), (2L, "beta EDITED"), (4L, "delta"),
      (9L, "new doc")).toDF("doc_id", "text")
    val got = Corpus.snapshotDiff(old, next, "doc_id", "text")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq === Seq((1L, "unchanged"), (2L, "changed"),
      (3L, "removed"), (4L, "unchanged"), (9L, "added")))
  }

  test("lengths ride along; absent side is null") {
    val old = Seq((1L, "abc")).toDF("doc_id", "text")
    val next = Seq((2L, "defgh")).toDF("doc_id", "text")
    val got = Corpus.snapshotDiff(old, next, "doc_id", "text")
      .orderBy("id").collect()
    assert(got(0).getInt(2) === 3 && got(0).isNullAt(3))
    assert(got(1).isNullAt(2) && got(1).getInt(3) === 5)
  }

  test("same-length different-content is changed (hash, not length, decides)") {
    val old = Seq((1L, "abcd")).toDF("doc_id", "text")
    val next = Seq((1L, "abce")).toDF("doc_id", "text")
    val got = Corpus.snapshotDiff(old, next, "doc_id", "text").collect()
    assert(got.head.getString(1) === "changed")
  }

  test("plan: only fingerprints reach the join (no text column above the scans)") {
    val old = Seq((1L, "abcd")).toDF("doc_id", "text")
    val next = Seq((1L, "abce")).toDF("doc_id", "text")
    val plan = Corpus.snapshotDiff(old, next, "doc_id", "text")
      .queryExecution.optimizedPlan
    // the join node's inputs must not carry the raw text attribute
    val join = plan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
    }.head
    val joinInputCols =
      (join.left.output ++ join.right.output).map(_.name).toSet
    assert(!joinInputCols.contains("text"), joinInputCols.toString)
  }
}
