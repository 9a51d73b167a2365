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

  /** The Unicode White_Space property — exactly the set `(?U)\s` binds to
    * (and Go's `unicode.IsSpace`): categories Zs/Zl/Zp plus U+0009–U+000D
    * and U+0085. ASCII fast path first; `Character.isSpaceChar` covers the
    * Z categories. */
  @inline def isWhitespace(c: Char): Boolean =
    if (c < 128) c == ' ' || (c >= '\t' && c <= '\r')
    else c == '\u0085' || Character.isSpaceChar(c)

  /** Driver/executor-side Scala twin of [[tokens]] — used by the index
    * build's hot path, the single-node oracle scorer and query parsing.
    * A hand-rolled scanner rather than `split(regex)`: `String.split`
    * compiles the pattern on EVERY call and materializes an intermediate
    * array, which at millions of docs×fields dominates build allocation.
    * Must stay semantically identical to the Column version AND to the
    * regex split (both property-tested in AnalyzerSpec). */
  def tokenize(content: String): Array[String] = {
    val n = content.length
    if (n == 0) return Array.empty
    val out = new scala.collection.mutable.ArrayBuffer[String](8 + n / 8)
    var i = 0
    while (i < n) {
      while (i < n && isWhitespace(content.charAt(i))) i += 1
      val start = i
      while (i < n && !isWhitespace(content.charAt(i))) i += 1
      if (i > start) out += content.substring(start, i).toLowerCase
    }
    out.toArray
  }

  /** The original regex-split tokenizer, kept as the executable spec the
    * scanner is property-tested against. */
  private[graft] def tokenizeRegex(content: String): Array[String] = {
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
