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
    * the per-row "tokenize + count" is genuine imperative per-record logic;
    * doing it relationally (explode + groupBy(doc, term)) would add a full
    * extra shuffle over ~200 tokens/doc just to compute tf.
    *
    * tf is counted by sorting the token array in place and walking runs —
    * zero allocation beyond the tokens themselves. The earlier
    * HashMap[String, Int] variant boxed a fresh Integer + map entry per
    * distinct term; at build scale that garbage was a measurable share of
    * the memory-bandwidth wall this VM hits above ~8 threads. Emission
    * order changes (sorted vs hash order) but the downstream range
    * repartition + sort makes the build output byte-identical either way.
    */
  def postings(corpus: Dataset[CorpusDoc],
               fields: Seq[String] = CorpusDoc.Fields): Dataset[Posting] = {
    import corpus.sparkSession.implicits._
    val fieldsB = fields.toArray
    corpus.flatMap { doc =>
      fieldsB.iterator.flatMap { f =>
        val toks = Analyzer.tokenize(CorpusDoc.fieldValue(doc, f))
        val dl = toks.length
        if (dl == 0) Iterator.empty
        else {
          java.util.Arrays.sort(toks.asInstanceOf[Array[AnyRef]])
          new Iterator[Posting] {
            private var i = 0
            def hasNext: Boolean = i < dl
            def next(): Posting = {
              val t = toks(i)
              var j = i + 1
              while (j < dl && toks(j) == t) j += 1
              val tf = j - i
              i = j
              Posting(f, t, doc.doc_id, tf, dl)
            }
          }
        }
      }
    }
  }

  /** Posting rows → compressed shard blobs. The single index-build shuffle,
    * sort-based (the classic bulk inverted-index build):
    *
    *   range shuffle on (field, term, shard)   — raw UnsafeRows, one pass
    *   → Tungsten partition-local sort (+ doc_id) — off-heap radix sort
    *   → streaming group-walk encode (mapPartitions, reused buffers)
    *
    * Rationale vs groupBy+Aggregator: an object-hash aggregation buffers
    * every group as a JVM ArrayBuffer serialized through Kryo — measured
    * GC-bound above ~8 concurrent tasks on this box. The sorted stream walk
    * allocates one reusable buffer per task and emits blobs whose postings
    * are docId-sorted by construction (deterministic bytes at any
    * parallelism). RangePartitioning also leaves the output laid out in
    * term order, so the subsequent parquet write gets min/max file pruning
    * for exact and prefix term scans with no extra exchange. */
  def encodeShards(postings: Dataset[Posting], shardSpan: Long): DataFrame = {
    import postings.sparkSession.implicits._
    postings
      .withColumn("shard", floor(col("doc_id") / lit(shardSpan)).cast("long"))
      .repartitionByRange(col("field"), col("term"), col("shard"))
      .sortWithinPartitions("field", "term", "shard", "doc_id")
      .select(col("field"), col("term"), col("shard"),
        col("doc_id"), col("tf"), col("dl"))
      .as[(String, String, Long, Long, Int, Int)]
      .mapPartitions(ShardEncoder.encodeSortedRun)
      .toDF()
  }

  /** Per-(field, term) document frequency. Posting rows are one per
    * distinct (field, term, doc), so df is a row count. Computed from the
    * (cached) token rows — independent of the postings write, so it runs
    * concurrently with it. Carries sum_tf so fieldStats derives from THIS
    * vocabulary-sized table. */
  def termDf(postings: Dataset[Posting]): DataFrame =
    postings.groupBy(col("field"), col("term"))
      .agg(count(lit(1)).as("df"), sum(col("tf")).as("sum_tf"))

  /** Per-field (n, sum_dl). sum_dl(field) = Σ_docs dl = Σ_postings tf, so it
    * falls out of the df table's `sum_tf` column — one scan of a table whose
    * row count is the vocabulary size, not the posting count. */
  def fieldStats(df: DataFrame, numDocs: Long): DataFrame =
    df.groupBy(col("field"))
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
