package graft.pipeline

import graft.analysis.Analyzer
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The single-pass curation operator: language ID, quality features, token
  * counts, PII scrub, and the deterministic train/val/test tag, FUSED into
  * one select over one scan of the corpus. At 100 TB the dominant cost of
  * per-document curation is reading the bytes; running the operators as
  * separate jobs (or joining their outputs) scans the corpus N times /
  * shuffles on doc_id — this plan reads each row once, stays entirely
  * inside whole-stage codegen, and shuffles nothing (asserted in
  * PlanSpec). Column semantics are pinned to the individual operators
  * ([[TextAnalysis.langId]], [[TextAnalysis.qualityFeatures]],
  * [[TextAnalysis.tokenCounts]], [[TextAnalysis.scrubPii]],
  * [[Sampling.withSplit]]) by an equality test in PipelineSpec. */
object Curation {

  def curate(docs: DataFrame, textCol: String = "text",
             trainPpm: Long = 800000L, valPpm: Long = 100000L): DataFrame = {
    require(trainPpm + valPpm <= Sampling.Buckets, "train+val rates exceed 100%")
    // stage 1: name the shared subexpressions once (tokens, scrub chain) —
    // chained selects over one scan, still a single codegen stage
    val staged = docs.select(col("doc_id"), col(textCol).as("t"),
        Analyzer.tokens(col(textCol)).as("toks"),
        regexp_extract_all(col(textCol), lit(TextAnalysis.PreTokenRe), lit(0)).as("pre"),
        regexp_replace(col(textCol), TextAnalysis.EmailRe, "[EMAIL]").as("t1"))
      .select(
        Seq(col("doc_id"), col("t"), col("toks"), col("pre"), col("t1"),
          regexp_replace(col("t1"), TextAnalysis.Ipv4Re, "[IP]").as("t2")) ++
        TextAnalysis.StopwordSets.map { case (lang, words) =>
          size(filter(col("toks"), t => t.isInCollection(words))).as(s"s_$lang")
        }: _*)
    val best = TextAnalysis.StopwordSets.map { case (l, _) => col(s"s_$l") }
      .reduce(greatest(_, _))
    val pred = TextAnalysis.StopwordSets.foldRight(lit("und")) { case ((l, _), acc) =>
      when(col(s"s_$l") === best && best > 0, lit(l)).otherwise(acc)
    }
    val b = Sampling.bucket(col("doc_id"))
    staged.select(
      col("doc_id"),
      pred.as("lang_pred"), best.cast("long").as("best_hits"),
      size(col("toks")).cast("long").as("n_tokens"),
      length(col("t")).cast("long").as("n_chars"),
      (size(array_distinct(col("toks"))).cast("double") /
        greatest(size(col("toks")), lit(1))).as("uniq_ratio"),
      (col("s_en").cast("double") /
        greatest(size(col("toks")), lit(1))).as("stopword_ratio"),
      (length(regexp_replace(col("t"), "[a-z0-9 ]", "")).cast("double") /
        greatest(length(col("t")), lit(1))).as("nonalnum_ratio"),
      // both counts derive from ONE evaluation of the pre-token regex (the
      // staged `pre` array): the approx is its length, the real count is
      // the shared merges-table core — map-side, same codegen stage
      size(col("pre")).cast("long").as("n_bpe_approx"),
      TextAnalysis.bpeTokenCountCol(col("pre"), TextAnalysis.BpeMerges)
        .as("n_bpe_tokens"),
      regexp_count(col("t"), lit(TextAnalysis.EmailRe)).cast("long").as("n_emails"),
      regexp_count(col("t1"), lit(TextAnalysis.Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(col("t2"), lit(TextAnalysis.LongDigitRe)).cast("long").as("n_digit_runs"),
      regexp_replace(col("t2"), TextAnalysis.LongDigitRe, "[NUM]").as("text_clean"),
      when(b < trainPpm, "train").when(b < trainPpm + valPpm, "val")
        .otherwise("test").as("split"))
  }
}
