package graft.analysis

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The pinned text analyzer (SURVEY.md §A.1).
  *
  * The reference analyzes text as `lowercaseTokens(tokenizeString(s))`
  * (reference: indexing.go:83-93, used identically at index time
  * indexing.go:734 and query time indexing.go:384). `tokenizeString` is Go's
  * `strings.Fields`, i.e. split on Unicode whitespace (`unicode.IsSpace`:
  * \t \n \v \f \r space U+0085 U+00A0 + category Z). The exact Java
  * equivalent is the regex `\s` under UNICODE_CHARACTER_CLASS — spelled
  * inline as `(?U)\s` — which binds to the Unicode White_Space property,
  * the same set. Both sides of the pipeline (build + query) MUST use this
  * one analyzer; fixtures lock the behavior (AnalyzerSpec).
  *
  * Everything here is Catalyst `Column` arithmetic over built-in functions
  * (split / filter / transform / lower) — fully codegen'd, no UDF.
  */
object Analyzer {

  /** Pinned tokenizer regex: Unicode whitespace runs. */
  val WhitespaceRegex = "(?U)\\s+"

  /** content -> array<string> of lowercased tokens (empty tokens from
    * leading/trailing whitespace removed — `strings.Fields` semantics). */
  def tokens(content: Column): Column =
    transform(
      filter(split(content, WhitespaceRegex), t => t =!= lit("")),
      t => lower(t)
    )

  /** content -> document length in tokens (reference: indexing.go:317-323;
    * pinned to the same tokenizer as terms, SURVEY.md §A.1). */
  def docLength(content: Column): Column = size(tokens(content))

  /** Driver/executor-side Scala twin of [[tokens]] — used by the single-node
    * oracle scorer and by query parsing. Must stay semantically identical to
    * the Column version (property-tested in AnalyzerSpec). */
  def tokenize(content: String): Array[String] = {
    val raw = content.split(WhitespaceRegex)
    val out = new scala.collection.mutable.ArrayBuffer[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) out += raw(i).toLowerCase
      i += 1
    }
    out.toArray
  }

  /** Scala-side term frequency map for one document (single pass). */
  def termFrequencies(content: String): scala.collection.Map[String, Int] = {
    val m = scala.collection.mutable.HashMap.empty[String, Int]
    tokenize(content).foreach { t => m.update(t, m.getOrElse(t, 0) + 1) }
    m
  }
}
