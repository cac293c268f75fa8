package graft

/** The SQL surface: custom expressions callable from spark.sql(...). */
class GraftExtensionsSpec extends SparkSpec {

  test("registered functions evaluate correctly from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT portable_hash('abc') AS h,
        |       portable_hash(CAST('abc' AS BINARY)) AS hb,
        |       fold_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d,
        |       simhash_bits(array(portable_hash('a'), portable_hash('b'))) AS sh,
        |       minhash_signature(array(portable_hash('a')), 4) AS mh""".stripMargin)
      .collect().head
    def fold(x: String) =
      x.getBytes.foldLeft(0L)((h, b) => (h * 31 + b) % 1000000007L)
    assert(r.getLong(0) == fold("abc"))
    assert(r.getLong(1) == fold("abc")) // binary input: identical fold
    assert(r.getDouble(2) == 11.0)
    assert(r.getLong(3) >= 0 && r.getLong(3) < (1L << 30))
    assert(r.getSeq[Long](4).length == 4)
  }

  test("round-2 functions evaluate correctly from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT ngram_hashes('a b c', 2) AS ng,
        |       sorted_intersect_count(array(1L, 3L, 5L), array(3L, 4L, 5L)) AS ic,
        |       wkb_envelope_centroid(
        |         wkb_polygon(array(0.0d, 2.0d, 2.0d, 0.0d),
        |                     array(0.0d, 0.0d, 2.0d, 2.0d))) AS env""".stripMargin)
      .collect().head
    assert(r.getSeq[Long](0).length == 2) // "a_b", "b_c"
    assert(r.getLong(1) == 2L)
    val env = r.getStruct(2)
    assert(env.getDouble(2) == 2.0 && env.getDouble(4) == 1.0) // maxx, cx
  }

  test("repetition_stats evaluates correctly from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      "SELECT repetition_stats('a a a b', 2) AS st").collect().head.getStruct(0)
    assert(r.getInt(0) === 4) // tokens
    assert(r.getInt(1) === 3) // bigrams: a_a, a_a, a_b
    assert(r.getInt(2) === 2) // distinct
    assert(r.getInt(3) === 3) // top token 'a'
  }

  test("round-3 aggregates evaluate correctly from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT g, kmv_distinct(portable_hash(CAST(id AS STRING)), 64) AS nd,
        |       top_k_by(CAST(id AS DOUBLE), id, 2) AS tk
        |FROM (SELECT id % 2 AS g, id FROM range(100))
        |GROUP BY g ORDER BY g""".stripMargin).collect()
    assert(r.length == 2)
    assert(r.forall(_.getDouble(1) == 50.0)) // < k distinct -> exact
    val tk = r.head.getSeq[org.apache.spark.sql.Row](2)
    assert(tk.map(_.getLong(1)) == Seq(98L, 96L)) // g=0: best ids first
  }

  test("round-6 vector functions evaluate correctly from SQL") {
    GraftFunctions.register(spark)
    val r = spark.sql(
      """SELECT upper_tri_products(array(1.0d, 2.0d), 2) AS up,
        |       micro_vec_sum(v, 2) AS s
        |FROM (SELECT array(0.5d, 1.25d) AS v
        |      UNION ALL SELECT array(0.25d, -0.25d))
        |GROUP BY 1""".stripMargin).collect().head
    assert(r.getSeq[Double](0) === Seq(1.0, 2.0, 4.0)) // v1², v1·v2, v2²
    assert(r.getSeq[Double](1) === Seq(0.75, 1.0))
  }

  test("SQL type errors are analysis-time, not runtime") {
    GraftFunctions.register(spark)
    intercept[Exception](spark.sql("SELECT portable_hash(42)").collect())
    intercept[Exception](spark.sql("SELECT fold_dot(array('a'), array('b'))").collect())
  }
}
