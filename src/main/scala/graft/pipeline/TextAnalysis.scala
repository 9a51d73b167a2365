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

  /** Token counting two ways: pinned whitespace tokens and a BPE-ish
    * pre-tokenization (letter runs / digit runs / single other symbol —
    * the GPT-2-style split approximation). */
  def tokenCounts(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      size(Analyzer.tokens(col(textCol))).cast("long").as("n_ws_tokens"),
      regexp_count(col(textCol), lit("[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"))
        .cast("long").as("n_bpe_tokens"))

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
