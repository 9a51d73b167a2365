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

  test("scanner tokenizer == regex-split tokenizer (incl. full Unicode whitespace set)") {
    // every White_Space codepoint, planted between tokens
    val wsChars: Seq[Char] = ((0x0009 to 0x000d) ++ Seq(0x0020, 0x0085, 0x00a0,
      0x1680, 0x2028, 0x2029, 0x202f, 0x205f, 0x3000) ++ (0x2000 to 0x200a))
      .map(_.toChar)
    wsChars.foreach { w =>
      val s = s"Alpha${w}Beta$w${w}Gamma$w"
      assert(Analyzer.tokenize(s).toSeq == Analyzer.tokenizeRegex(s).toSeq,
        s"ws U+${w.toInt.toHexString}")
      assert(Analyzer.tokenize(s).toSeq == Seq("alpha", "beta", "gamma"))
    }
    // near-misses that are NOT whitespace must not split: ZWSP, WORD JOINER,
    // SOFT HYPHEN, ZWNBSP
    Seq(0x200b, 0x2060, 0x00ad, 0xfeff).map(_.toChar).foreach { w =>
      val s = s"a${w}b"
      assert(Analyzer.tokenize(s).toSeq == Analyzer.tokenizeRegex(s).toSeq, s"U+${w.toInt.toHexString}")
      assert(Analyzer.tokenize(s).length == 1, s"U+${w.toInt.toHexString} must not split")
    }
    // randomized parity
    val gen = Gen.listOfN(40, Gen.oneOf(
      Gen.alphaNumStr.map(_.take(5)),
      Gen.oneOf(wsChars.map(_.toString) ++ Seq("Mi X", "ÀÉ", "中 文", ""))
    )).map(_.mkString)
    PropCheck.forAllG(gen) { s =>
      assert(Analyzer.tokenize(s).toSeq == Analyzer.tokenizeRegex(s).toSeq, s"mismatch on [$s]")
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
