package graft.index

import graft.analysis.Analyzer
import graft.core._
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Batch inverted-index construction (SURVEY.md §7.1-7.2).
  *
  * Shuffle budget: exactly ONE wide dependency for the whole index build —
  * the `groupBy(field, term, shard)` that assembles posting lists. Term
  * frequencies are counted *inside each corpus row* (single-pass flatMap),
  * so no (doc, term) pre-aggregation shuffle is needed; the shuffle input is
  * already one row per distinct (field, term, doc).
  *
  * Hot-term skew (SURVEY.md §7.4): `shard = doc_id / shardSpan` bounds every
  * reduce group to ≤ shardSpan postings structurally — a term occurring in
  * half of 10^12 docs becomes ~10^6 independent groups instead of one
  * 5·10^11-row reducer. No sampling pass, no AQE dependency, and query-time
  * shard merge is free (disjoint, ascending docId ranges).
  */
object IndexBuilder {

  /** corpus → one Posting row per distinct (field, term, doc).
    *
    * A typed flatMap is used deliberately (SURVEY.md §7.3 decision table):
    * the per-row "tokenize + count into a hash map" is genuine imperative
    * per-record logic; doing it relationally (explode + groupBy(doc, term))
    * would add a full extra shuffle over ~200 tokens/doc just to compute tf.
    */
  def postings(corpus: Dataset[CorpusDoc],
               fields: Seq[String] = CorpusDoc.Fields): Dataset[Posting] = {
    import corpus.sparkSession.implicits._
    val fieldsB = fields.toArray
    corpus.flatMap { doc =>
      fieldsB.iterator.flatMap { f =>
        val toks = Analyzer.tokenize(CorpusDoc.fieldValue(doc, f))
        val dl = toks.length
        val m = new scala.collection.mutable.HashMap[String, Int]()
        var i = 0
        while (i < toks.length) { m.update(toks(i), m.getOrElse(toks(i), 0) + 1); i += 1 }
        m.iterator.map { case (t, tf) => Posting(f, t, doc.doc_id, tf, dl) }
      }
    }
  }

  /** Posting rows → compressed shard blobs. The single index-build shuffle. */
  def encodeShards(postings: Dataset[Posting], shardSpan: Long): DataFrame = {
    val blobAgg = udaf(PostingBlobAggregator, org.apache.spark.sql.Encoders.product[PostingIn])
    postings
      .withColumn("shard", floor(col("doc_id") / lit(shardSpan)).cast("long"))
      .groupBy(col("field"), col("term"), col("shard"))
      .agg(blobAgg(col("doc_id"), col("tf"), col("dl")).as("enc"))
      .select(col("field"), col("term"), col("shard"),
        col("enc.count").as("count"), col("enc.sum_tf").as("sum_tf"),
        col("enc.max_tf").as("max_tf"), col("enc.blocks").as("blocks"),
        col("enc.blob").as("blob"))
  }

  /** Per-(field, term) document frequency, derived from the shard table —
    * each encoded posting is a distinct (field, term, doc), so df is a plain
    * sum of shard counts. Reads only 3 pruned columns of the postings table. */
  def termDf(shards: DataFrame): DataFrame =
    shards.groupBy(col("field"), col("term"))
      .agg(sum(col("count")).as("df"))

  /** Per-field (n, sum_dl). sum_dl(field) = Σ_docs dl = Σ_postings tf, so it
    * falls out of the shard table's `sum_tf` column without decoding blobs. */
  def fieldStats(shards: DataFrame, numDocs: Long): DataFrame =
    shards.groupBy(col("field"))
      .agg(sum(col("sum_tf")).as("sum_dl"))
      .withColumn("n", lit(numDocs))
      .select(col("field"), col("n"), col("sum_dl"))

  /** Per-doc content checksum (input_hint per-row invariant). */
  def docStats(corpus: Dataset[CorpusDoc]): DataFrame =
    corpus.select(col("doc_id"), sha2(col("content"), 256).as("content_sha"))

  /** Column-only tokenization of the corpus — the relational twin of the
    * flatMap path, used by SQL-oracle-facing queries (DuckDB parity) and
    * cross-checked against `postings` in tests. */
  def tokensDF(corpus: DataFrame, textCol: String = "content"): DataFrame =
    corpus.select(col("doc_id"),
      explode(Analyzer.tokens(col(textCol))).as("term"))

  /** Relational (doc, term, tf, dl) — explode + two-level agg; oracle twin. */
  def termFrequenciesDF(corpus: DataFrame, textCol: String = "content"): DataFrame = {
    val withDl = corpus.select(col("doc_id"),
      Analyzer.tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), size(col("toks")).as("dl"), explode(col("toks")).as("term"))
    withDl.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"), first(col("dl")).as("dl"))
  }
}
