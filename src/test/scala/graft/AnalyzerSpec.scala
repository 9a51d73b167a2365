package graft

import graft.analysis.Analyzer
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen

/** Pins the analyzer spec (SURVEY.md §A.1): Unicode-whitespace split +
  * lowercase, matching Go strings.Fields + strings.ToLower
  * (reference indexing.go:83-93). */
class AnalyzerSpec extends AnyFunSuite {

  test("golden fixtures incl. Unicode whitespace edge cases") {
    val cases: Seq[(String, Seq[String])] = Seq(
      ("Hello World", Seq("hello", "world")),
      ("  leading and   trailing  ", Seq("leading", "and", "trailing")),
      ("tabs\tand\nnewlines\r\nmix", Seq("tabs", "and", "newlines", "mix")),
      ("NBSP separated", Seq("nbsp", "separated")),   // U+00A0
      ("NELseparated", Seq("nel", "separated")),     // U+0085
      ("ideographic　space", Seq("ideographic", "space")),
      ("em space", Seq("em", "space")),
      ("line and para", Seq("line", "and", "para")),
      ("MiXeD CaSe ÀÉÎ", Seq("mixed", "case", "àéî")),
      ("", Seq.empty),
      ("   ", Seq.empty),
      ("one", Seq("one"))
    )
    cases.foreach { case (in, expect) =>
      assert(Analyzer.tokenize(in).toSeq == expect, s"scala tokenize($in)")
    }
  }

  test("Column expression matches Scala tokenizer on fixtures + random strings") {
    val spark = TestSpark.spark
    import spark.implicits._
    val gen = Gen.listOfN(30, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(6)),
      Gen.oneOf(" ", "\t", "\n", " ", "", "　", "X Y", "áÉç")
    )).map(_.mkString)
    val samples = (1 to 60).flatMap(i => gen.sample) ++ Seq(
      "Hello World", "tabs\tand\nnewlines", "NBSP x", "", " a ")
    val df = samples.toDF("content")
      .select(Analyzer.tokens(col("content")).as("toks"))
    val got = df.collect().map(_.getSeq[String](0).toSeq)
    samples.zip(got).foreach { case (s, colToks) =>
      assert(colToks == Analyzer.tokenize(s).toSeq, s"mismatch on: [$s]")
    }
  }

  test("tokenization invariant under extra whitespace; lowercase idempotent") {
    PropCheck.forAllG(Gen.listOfN(10, Gen.identifier.map(_.take(8)))) { words =>
      val ws = words.filter(_.nonEmpty)
      val once = Analyzer.tokenize(ws.mkString(" "))
      val spaced = Analyzer.tokenize(ws.mkString("   \t"))
      assert(once.toSeq == spaced.toSeq)
      assert(once.forall(t => t == t.toLowerCase))
    }
  }

  test("term frequencies count exact lowercase matches") {
    val tf = Analyzer.termFrequencies("The the THE cat Cat dog")
    assert(tf("the") == 3 && tf("cat") == 2 && tf("dog") == 1)
  }
}
