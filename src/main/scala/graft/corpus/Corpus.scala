package graft.corpus

import graft.core.CorpusDoc
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Adapters that bring external tables into the canonical corpus shape
  * (BASELINE.json `input_hint`: repo, path, commit, lang, content + doc_id).
  */
object Corpus {

  /** Driver-provided stand-in corpus `documents.parquet`
    * `(doc_id, text, lang, source, n_chars)` → corpus shape (FIXTURES.md §2).
    * The mapping is pure Column arithmetic so Catalyst can prune/push down
    * (e.g. a query touching only `content` reads only the `text` column).
    */
  def fromDocuments(spark: SparkSession, sfDir: String,
                    lang: Option[String] = None): Dataset[CorpusDoc] = {
    import spark.implicits._
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
    lang.fold(base)(l => base.filter(col("lang") === l))
      .select(
        col("doc_id"),
        col("source").as("repo"),
        concat(lit("doc/"), col("doc_id")).as("path"),
        sha2(col("text"), 256).as("commit"),
        col("lang"),
        col("text").as("content"))
      .as[CorpusDoc]
  }

  /** Raw documents table (for pipeline ops that work on the native shape). */
  def documents(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/documents.parquet")

  /** Embeddings table `(vec_id, embedding: array<float>, label)`. */
  def embeddings(spark: SparkSession, sfDir: String): DataFrame =
    spark.read.parquet(s"$sfDir/embeddings.parquet")
}
