package graft.pipeline

import graft.analysis.Analyzer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data curation: language
  * identification (stopword-hit heuristic), quality scoring
  * (length/punctuation/stopword ratios), token counting (whitespace +
  * BPE-ish regex), and document fingerprinting (winnowed rolling hash).
  * All per-document, embarrassingly parallel Column plans.
  */
object TextAnalysis {

  /** Tiny per-language stopword lists (n-gram heuristic stand-in; a real
    * deployment would load fastText-style profiles — the *plumbing* is what
    * matters here: pure map-side scoring, no shuffle). */
  val StopwordSets: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "und", "ist", "das", "nicht", "ein"),
    "en" -> Seq("the", "and", "of", "to", "is", "that", "it"),
    "es" -> Seq("el", "la", "de", "que", "los", "una", "por"),
    "fr" -> Seq("le", "la", "et", "les", "des", "une", "est"),
    "zh" -> Seq("的", "是", "了", "在", "我", "有", "和")
  )

  /** Per-language stopword hit count (multiset: repeats count) over the
    * pinned tokenizer. */
  private def langScore(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isInCollection(words)))

  /** Language ID: argmax of stopword hits; deterministic alphabetical
    * tiebreak; 'und' (undetermined) when no stopword hits at all.
    * Output: (doc_id, lang_pred, best_hits). */
  def langId(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = Analyzer.tokens(col(textCol))
    val scored = docs.select(col("doc_id"), toks.as("toks"))
      .select(Seq(col("doc_id")) ++ StopwordSets.map { case (lang, words) =>
        langScore(col("toks"), words).as(s"s_$lang")
      }: _*)
    // argmax with alphabetical tiebreak = greatest(...) compare per lang,
    // first lang (alphabetical order) winning ties via strict > on later ones
    val best = StopwordSets.map { case (l, _) => col(s"s_$l") }.reduce(greatest(_, _))
    val pred = StopwordSets.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    scored.select(col("doc_id"), pred.as("lang_pred"), best.cast("long").as("best_hits"))
  }

  /** Quality features: token count, char count, mean token length,
    * stopword ratio (en), non-alphanumeric char ratio, uniqueness ratio.
    * Output one row per doc; thresholds are the caller's policy. */
  def qualityFeatures(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val en = StopwordSets.toMap.apply("en")
    docs.select(col("doc_id"), col(textCol).as("t"),
        Analyzer.tokens(col(textCol)).as("toks"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        length(col("t")).cast("long").as("n_chars"),
        (size(array_distinct(col("toks"))).cast("double") /
          greatest(size(col("toks")), lit(1))).as("uniq_ratio"),
        (size(filter(col("toks"), t => t.isInCollection(en))).cast("double") /
          greatest(size(col("toks")), lit(1))).as("stopword_ratio"),
        (length(regexp_replace(col("t"), "[a-z0-9 ]", "")).cast("double") /
          greatest(length(col("t")), lit(1))).as("nonalnum_ratio"))
  }

  /** GPT-2-style pre-tokenization split: letter runs / digit runs / single
    * other symbol. The unit BPE merges operate within. */
  val PreTokenRe = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"

  /** Token counting two ways: pinned whitespace tokens and the pre-token
    * count (an upper bound on the true BPE count — every merge only
    * shrinks; kept as the cheap approximation column). The REAL
    * merges-table count is [[bpeTokenCounts]]. */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      size(Analyzer.tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      regexp_count(col(textCol), lit(PreTokenRe))
        .cast("long").as("n_bpe_approx"))

  /** Pinned synthetic BPE merges table, rank order = list order. It is
    * WELL-FORMED: every component is a base character or the product of an
    * EARLIER merge — the property that makes one rank-ordered application
    * pass equal the classic iterative lowest-rank-first BPE (a merge can
    * only create adjacencies involving its own product, and any merge
    * consuming that product must rank later). [[validateMerges]] enforces
    * it; a user-supplied table (e.g. GPT-2's learned merges, which are
    * well-formed by construction of BPE training) goes through the same
    * check. */
  val BpeMerges: Seq[(String, String)] = Seq(
    "t" -> "h", "i" -> "n", "a" -> "n", "e" -> "r", "o" -> "n", "r" -> "e",
    "a" -> "t", "s" -> "t", "e" -> "n", "o" -> "r", "a" -> "l", "d" -> "e",
    "th" -> "e", "an" -> "d", "in" -> "g", "er" -> "s", "o" -> "u",
    "e" -> "s", "o" -> "f", "i" -> "s", "c" -> "on", "st" -> "r",
    "the" -> "n", "at" -> "e", "or" -> "t", "en" -> "t",
    "0" -> "0", "1" -> "9")

  /** Fails loudly on a merges table that is not well-formed (see
    * [[BpeMerges]]): an out-of-order component would silently make the
    * rank-ordered pass diverge from real BPE. */
  def validateMerges(merges: Seq[(String, String)]): Unit = {
    val products = scala.collection.mutable.Set.empty[String]
    val pairs = scala.collection.mutable.Set.empty[(String, String)]
    merges.foreach { case (a, b) =>
      Seq(a, b).foreach { c =>
        require(c.nonEmpty && !c.exists(_.isWhitespace) &&
          (c.codePointCount(0, c.length) == 1 || products.contains(c)),
          s"merge component '$c' is neither a base character nor the product " +
            "of an earlier merge — the table is not in learnable (rank) order")
      }
      require(pairs.add((a, b)), s"duplicate merge ($a, $b)")
      require(products.add(a + b),
        s"two merges produce '${a + b}' — ranks would be ambiguous")
    }
  }

  /** BPE symbol count of one pre-token as a Column, applying `merges` in
    * rank order. Encoding trick: the symbol sequence is a string with every
    * symbol wrapped in its OWN leading+trailing space (" a  b  c "), so
    * merging pair (a, b) is a literal replace of " a  b " with " ab " —
    * occurrences never share boundary characters, which makes the engine's
    * non-overlapping left-to-right replace merge exactly the occurrences
    * real BPE merges (including runs like "aaaa" for a self-pair). Count =
    * spaces / 2. Pure codegen'd string ops with an exact DuckDB twin. */
  private[pipeline] def bpeSymbolCount(token: Column,
                                       merges: Seq[(String, String)]): Column = {
    val spaced = regexp_replace(token, "(.)", " $1 ")
    val merged = merges.foldLeft(spaced) { case (s, (a, b)) =>
      replace(s, lit(s" $a  $b "), lit(s" $a$b "))
    }
    ((length(merged) - length(replace(merged, lit(" "), lit("")))) / 2).cast("long")
  }

  /** Total BPE token count over a PRE-TOKEN ARRAY column — the shared
    * Column core of [[bpeTokenCounts]] and the fused curation pass. */
  private[pipeline] def bpeTokenCountCol(pre: Column,
      merges: Seq[(String, String)]): Column =
    aggregate(transform(pre, t => bpeSymbolCount(t, merges)),
      lit(0L), (acc, v) => acc + v)

  /** REAL merges-table BPE token counting — what a training pipeline
    * actually reports per document: pre-tokenize ([[PreTokenRe]]), apply
    * the merges within each pre-token, sum the resulting symbol counts.
    * The merges ride into the plan as literals (broadcast with the
    * serialized plan, like the reference query constants); per-row work is
    * a fixed chain of string replaces inside whole-stage codegen — no UDF,
    * no shuffle. Output: (doc_id, n_pretokens, n_bpe_tokens). */
  def bpeTokenCounts(docs: DataFrame, textCol: String = "text",
                     merges: Seq[(String, String)] = BpeMerges): DataFrame = {
    validateMerges(merges)
    val pre = regexp_extract_all(col(textCol), lit(PreTokenRe), lit(0))
    docs.select(
      col("doc_id"),
      size(pre).cast("long").as("n_pretokens"),
      bpeTokenCountCol(pre, merges).as("n_bpe_tokens"))
  }

  /** PII patterns: kept to constructs with identical semantics in Java
    * regex (Spark codegen) and RE2 (DuckDB oracle) — no backrefs, no
    * lookaround. A real deployment extends the list; the operator shape
    * (chained global regexp_replace, map-side only) is what scales. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  val LongDigitRe = "\\b[0-9]{7,}\\b"

  /** PII scrubbing: redact emails, IPv4 addresses, and long digit runs
    * (phone/account-shaped), in that order (an IPv4 inside an email is
    * already gone when the IP pass runs). Output keeps the redaction counts
    * per class plus the cleaned text — the downstream pipeline filters on
    * counts and trains on `text_clean`. Map-side only. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val afterEmail = regexp_replace(t, EmailRe, "[EMAIL]")
    val afterIp = regexp_replace(afterEmail, Ipv4Re, "[IP]")
    val clean = regexp_replace(afterIp, LongDigitRe, "[NUM]")
    docs.select(
      col("doc_id"),
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(afterEmail, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(afterIp, lit(LongDigitRe)).cast("long").as("n_digit_runs"),
      clean.as("text_clean"))
  }

  /** Seed of the fingerprint hash family (any fixed value; pinned so the
    * oracle SQL can mirror it). */
  val FingerprintSeed: Long = 7L

  /** Winnowing document fingerprints (Schleimer et al. MOSS scheme):
    * k-token shingle rolling hashes, minimum per sliding window of w —
    * the classic near-dup/plagiarism fingerprint. Hashes use the seeded
    * [[graft.functions.PortableHash]] family so the whole operator has an
    * exact DuckDB oracle twin. Output:
    * (doc_id, n_fingerprints, fingerprints sorted). */
  def fingerprints(docs: DataFrame, textCol: String = "text",
                   k: Int = 4, w: Int = 5): DataFrame = {
    val hashes = docs
      .select(col("doc_id"), Analyzer.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= k)
      .select(col("doc_id"),
        transform(sequence(lit(0), size(col("toks")) - k),
          i => graft.functions.PortableHash.hash(
            concat_ws(" ", slice(col("toks"), i + lit(1), lit(k))),
            FingerprintSeed)).as("hs"))
    hashes.select(col("doc_id"),
        when(size(col("hs")) <= w, array(array_min(col("hs"))))
          .otherwise(array_distinct(
            transform(sequence(lit(0), size(col("hs")) - w),
              i => array_min(slice(col("hs"), i + lit(1), lit(w))))))
          .as("fps"))
      .select(col("doc_id"), size(col("fps")).cast("long").as("n_fingerprints"),
        sort_array(col("fps")).as("fingerprints"))
  }
}
