package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class BpeSpec extends SparkSpec {
  import spark.implicits._

  private def model(merges: Seq[String], vocab: Seq[(String, Int)]): BpeModel = {
    val mr = new java.util.HashMap[String, Integer]()
    merges.zipWithIndex.foreach { case (p, r) => mr.put(p, r) }
    val v = new java.util.HashMap[String, Integer]()
    vocab.foreach { case (t, i) => v.put(t, i) }
    new BpeModel(mr, v, v.getOrDefault("<unk>", 0))
  }

  test("min-rank merge loop: lowest-ranked pair merges first, not leftmost") {
    // "abcd": ranks favor (c,d) over (a,b) — the GPT-2 loop must merge
    // cd first even though ab appears earlier in the word
    val m = model(Seq("c d", "a b", "ab cd"),
      Seq("<unk>" -> 0, "a" -> 1, "b" -> 2, "c" -> 3, "d" -> 4,
        "cd" -> 5, "ab" -> 6, "abcd" -> 7))
    assert(m.tokenizeWord("abcd").toSeq === Seq(7)) // cd, ab, then abcd
    assert(m.tokenizeWord("abc").toSeq === Seq(6, 3))
    assert(m.tokenizeWord("d").toSeq === Seq(4))
  }

  test("a==b runs merge greedily left-to-right (run parity)") {
    val m = model(Seq("l l"),
      Seq("<unk>" -> 0, "l" -> 1, "x" -> 2, "ll" -> 3))
    assert(m.tokenizeWord("lll").toSeq === Seq(3, 1))       // [ll, l]
    assert(m.tokenizeWord("llll").toSeq === Seq(3, 3))      // [ll, ll]
    assert(m.tokenizeWord("xlllx").toSeq === Seq(2, 3, 1, 2))
  }

  test("unknown symbols fall back to <unk>'s id") {
    val m = model(Seq("a b"), Seq("<unk>" -> 9, "a" -> 1, "b" -> 2))
    assert(m.tokenizeWord("ab").toSeq === Seq(9))  // merged "ab" not in vocab
    assert(m.tokenizeWord("z").toSeq === Seq(9))
  }

  test("tokenizeText: whitespace split, empties dropped, order preserved") {
    val m = model(Seq("a b"),
      Seq("<unk>" -> 0, "a" -> 1, "b" -> 2, "ab" -> 3, "c" -> 4))
    val got = m.tokenizeText(
      org.apache.spark.unsafe.types.UTF8String.fromString("ab  c ba"))
    assert(got.toIntArray().toSeq === Seq(3, 4, 2, 1))
    assert(m.tokenizeText(
      org.apache.spark.unsafe.types.UTF8String.fromString("")).numElements() === 0)
  }

  test("committed fixture loads and the expression runs codegen'd over a DataFrame") {
    val m = Bpe.load("/root/repo/data/bpe_vocab.json",
      "/root/repo/data/bpe_merges.txt")
    val df = Seq((1L, "the fast scan"), (2L, ""), (3L, "zebra?!"))
      .toDF("id", "text")
      .select(col("id"), Bpe.bpe_tokenize(col("text"), m).as("ids"))
    val got = df.as[(Long, Seq[Int])].collect().toMap
    // fixture chars are a-z so '?'/'!' hit <unk>=0
    assert(got(1L).nonEmpty && got(1L) === (
      m.tokenizeWord("the") ++ m.tokenizeWord("fast") ++
        m.tokenizeWord("scan")).toSeq)
    // a high-frequency corpus word IS a trained single-token merge
    // product (60 merges cover "column"/"scan"; "the" is rarer here)
    assert(m.tokenizeWord("column").length === 1)
    assert(m.tokenizeWord("scan").length === 1)
    assert(got(2L).isEmpty)
    assert(got(3L).contains(0))
    // vocab ids fit the uint16 .bin width by construction
    assert(got.values.flatten.forall(id => id >= 0 && id <= 65535))
  }

  test("vocab.json parser: escapes and negative guard") {
    val parsed = Bpe.parseFlatJson(
      """{"a": 1, "\"q\"": 2, "sp ace": 3, "A": 4, "tab\t": 5}""")
    assert(parsed === Seq("a" -> 1, "\"q\"" -> 2, "sp ace" -> 3,
      "A" -> 4, "tab\t" -> 5))
  }
}
