package graft.sources

import graft.SparkSpec
import java.nio.file.Files

/** S3 weights CSV (both committed layouts), S6 PRMS parse, F1 lookup. */
class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private def write(name: String, content: String): String = {
    val d = Files.createTempDirectory("graft-src")
    val p = d.resolve(name)
    Files.writeString(p, content)
    p.toString
  }

  test("weights CSV with pandas index column") {
    val p = write("w1.csv",
      """,nhru_v1_1,i,j,wght
        |0,1,418,328,0.5
        |1,1,419,328,0.5
        |2,2,420,329,1.0
        |""".stripMargin)
    val w = Sources.weightsCsv(spark, p, "nhru_v1_1")
    assert(w.columns.toSeq == Seq("fid", "i", "j", "wght"))
    assert(w.count() == 3)
    val r = w.orderBy("i").as[(Long, Int, Int, Double)].collect()
    assert(r.head == ((1L, 418, 328, 0.5)))
  }

  test("weights CSV without index column") {
    val p = write("w2.csv",
      """nhru_v1_1,i,j,wght
        |7,10,20,1.0
        |""".stripMargin)
    val w = Sources.weightsCsv(spark, p, "nhru_v1_1")
    assert(w.as[(Long, Int, Int, Double)].head() == ((7L, 10, 20, 1.0)))
  }

  test("PRMS parameter file: hru_elev section, 4 header lines, #### terminator") {
    val p = write("params.txt",
      """####
        |some_other_param
        |1
        |nhru
        |2
        |1
        |9.9
        |9.8
        |####
        |hru_elev
        |1
        |nhru
        |3
        |2
        |100.5
        |200.25
        |300.0
        |####
        |trailing_param
        |""".stripMargin)
    val e = Sources.prmsElevations(spark, p)
    val out = e.orderBy("nhru").as[(Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 100.5), (2L, 200.25), (3L, 300.0)))
  }

  test("catalog lookup returns first record per requested variable") {
    val cat = Seq(
      ("gridmet", "tmmx_a", "tmmx", "http://u1"),
      ("gridmet", "tmmx_b", "tmmx", "http://u2"),
      ("gridmet", "pr_x", "pr", "http://u3"),
      ("other", "tmmx_z", "tmmx", "http://u4")
    ).toDF("id", "varname", "variable", "URL")
    val out = Sources.catalogLookup(cat, "gridmet", Seq("tmmx", "pr"))
      .orderBy("variable").as[(String, String, String)].collect()
    assert(out.toSeq == Seq(
      ("pr", "pr_x", "http://u3"), ("tmmx", "tmmx_a", "http://u1")))
  }
}
