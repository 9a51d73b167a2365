package graft.api

import graft.core._
import graft.corpus.Corpus
import graft.index.{IndexBuilder, IndexStore}
import graft.search.{SearchEngine, SearchMode}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract query registry: every public operator gets a named query
  * plus, where SQL-expressible, an ANSI-SQL oracle that DuckDB evaluates on
  * the same parquet tables (SURVEY.md §5 item 8).
  *
  * Column names and result ordering are kept byte-identical between the
  * Spark plan and the oracle SQL; float columns are rounded on BOTH sides
  * before the final ordering so cross-engine summation-order noise cannot
  * flip ranks or hashes.
  */
object QueryRegistry {

  final case class QueryDef(
      name: String,
      fn: (SparkSession, String) => DataFrame,
      oracle: Option[String])

  // ---------- engine/store caches (one build per JVM per variant) ----------

  private val cache = scala.collection.concurrent.TrieMap.empty[String, SearchEngine]

  private def tempIndexDir(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-$tag").toString

  /** Full five-field store over the documents adapter. */
  def engineFor(spark: SparkSession, sfDir: String): SearchEngine =
    cache.getOrElseUpdate(s"full:$sfDir", {
      val store = new IndexStore(spark, tempIndexDir("full"), IndexConfig(shardSpan = 256))
      store.createSegment(Corpus.fromDocuments(spark, sfDir))
      new SearchEngine(store)
    })

  /** Content-only store variants used by the CRUD parity queries. */
  private def contentCfg = IndexConfig(shardSpan = 256, fields = Seq("content"))

  def engineDeleted(spark: SparkSession, sfDir: String): SearchEngine =
    cache.getOrElseUpdate(s"del:$sfDir", {
      val store = new IndexStore(spark, tempIndexDir("del"), contentCfg)
      store.createSegment(Corpus.fromDocuments(spark, sfDir))
      val victims = Corpus.documents(spark, sfDir)
        .filter(col("doc_id") % 7 === 0).select("doc_id")
        .collect().map(_.getLong(0)).toSeq
      store.delete(victims)
      new SearchEngine(store)
    })

  val UpdatedText = "graftupdated graftupdated spark join"
  val AddedText = "graftadded stream merge spark"

  def engineUpdated(spark: SparkSession, sfDir: String): SearchEngine =
    cache.getOrElseUpdate(s"upd:$sfDir", {
      import spark.implicits._
      val store = new IndexStore(spark, tempIndexDir("upd"), contentCfg)
      store.createSegment(Corpus.fromDocuments(spark, sfDir))
      val modified = Corpus.fromDocuments(spark, sfDir)
        .filter($"doc_id" === 1L).collect()
        .map(d => d.copy(content = UpdatedText, commit = "u" * 40)).toSeq
      store.update(spark.createDataset(modified))
      new SearchEngine(store)
    })

  def engineAdded(spark: SparkSession, sfDir: String): SearchEngine =
    cache.getOrElseUpdate(s"add:$sfDir", {
      import spark.implicits._
      val store = new IndexStore(spark, tempIndexDir("add"), contentCfg)
      store.createSegment(Corpus.fromDocuments(spark, sfDir))
      val extra = (0 until 3).map(i =>
        CorpusDoc(1000000L + i, "srcX", s"doc/new$i", "a" * 40, "en", AddedText))
      store.add(spark.createDataset(extra))
      new SearchEngine(store)
    })

  // ---------- SQL oracle builders (DuckDB dialect, ANSI-compatible) ----------

  /** Common CTE prefix: tokenization, tf, dl, df, corpus stats — the SQL twin
    * of Analyzer + IndexBuilder over a given docs relation. */
  private def baseCtes(docs: String): String =
    s"""WITH docs AS ($docs),
       |toks AS (
       |  SELECT doc_id, lower(t) AS term
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM docs)
       |  WHERE t <> ''
       |),
       |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
       |dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY doc_id),
       |stats AS (SELECT count(*) AS n, avg(dl) AS avgdl FROM dl),
       |df AS (SELECT term, count(*) AS df FROM tf GROUP BY term)""".stripMargin

  private def quoteList(terms: Seq[String]): String =
    terms.map(t => s"'$t'").mkString("(", ", ", ")")

  /** BM25 top-k oracle (k1=1.2, b=0.75; SURVEY.md §A.4). */
  def bm25Sql(terms: Seq[String], k: Int, and: Boolean = false,
              prefixes: Seq[String] = Seq.empty,
              termSubquery: Option[String] = None,
              docs: String = "SELECT doc_id, text FROM documents"): String = {
    val termPred =
      if (termSubquery.isDefined) s"tf.term IN (${termSubquery.get})"
      else if (prefixes.nonEmpty)
        s"tf.term IN (SELECT term FROM df WHERE " +
          prefixes.map(p => s"term LIKE '$p%'").mkString(" OR ") +
          " ORDER BY term LIMIT 100)"
      else s"tf.term IN ${quoteList(terms)}"
    val having = if (and) s"HAVING count(DISTINCT tf.term) = ${terms.size}" else ""
    s"""${baseCtes(docs)},
       |scores AS (
       |  SELECT tf.doc_id,
       |         sum( ln(1.0 + (stats.n - df.df + 0.5) / (df.df + 0.5))
       |              * (tf.tf * (1.2 + 1.0))
       |              / (tf.tf + 1.2 * (1.0 - 0.75 + 0.75 * dl.dl / stats.avgdl)) ) AS s
       |  FROM tf
       |  JOIN df ON tf.term = df.term
       |  JOIN dl ON tf.doc_id = dl.doc_id
       |  CROSS JOIN stats
       |  WHERE $termPred
       |  GROUP BY tf.doc_id
       |  $having
       |)
       |SELECT doc_id, round(s, 4) AS score FROM scores
       |ORDER BY round(s, 4) DESC, doc_id LIMIT $k""".stripMargin
  }

  /** Spark-side wrapper applying the identical rounding + ordering. */
  private def roundHits(hits: DataFrame, k: Int): DataFrame =
    hits.select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)

  private def searchQuery(name: String, terms: Seq[String], k: Int,
                          mode: SearchMode,
                          engineOf: (SparkSession, String) => SearchEngine = engineFor,
                          docs: String = "SELECT doc_id, text FROM documents"): QueryDef =
    QueryDef(name,
      (s, dir) => roundHits(
        engineOf(s, dir).search(terms.mkString(" "), Seq("content"), beginsWith = false,
          k = k, mode = mode), k),
      Some(bm25Sql(terms, k, and = mode == SearchMode.And, docs = docs)))

  // ---------- registry ----------

  def all: Seq[QueryDef] = Seq(
    // --- analysis / index-statistics operators (O1, O2, O5, O6, O13) ---
    QueryDef("q_tokenize_tf",
      (s, dir) => IndexBuilder.termFrequenciesDF(Corpus.documents(s, dir), "text")
        .select(col("doc_id"), col("term"), col("tf"))
        .orderBy("doc_id", "term"),
      Some(s"""${baseCtes("SELECT doc_id, text FROM documents")}
              |SELECT doc_id, term, tf FROM tf ORDER BY doc_id, term""".stripMargin)),

    QueryDef("q_doc_stats",
      (s, dir) => Corpus.documents(s, dir)
        .select(col("doc_id"), graft.analysis.Analyzer.docLength(col("text")).cast("long").as("dl"))
        .orderBy("doc_id"),
      Some(s"""${baseCtes("SELECT doc_id, text FROM documents")}
              |SELECT doc_id, dl FROM dl ORDER BY doc_id""".stripMargin)),

    QueryDef("q_term_df",
      (s, dir) => engineFor(s, dir).store.termDf()
        .filter(col("field") === "content").select(col("term"), col("df"))
        .orderBy("term"),
      Some(s"""${baseCtes("SELECT doc_id, text FROM documents")}
              |SELECT term, df FROM df ORDER BY term""".stripMargin)),

    QueryDef("q_corpus_stats",
      (s, dir) => {
        val fs = engineFor(s, dir).store.fieldStats()("content")
        import s.implicits._
        Seq((fs._1, BigDecimal(fs._2.toDouble / fs._1).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble))
          .toDF("n", "avgdl")
      },
      Some(s"""${baseCtes("SELECT doc_id, text FROM documents")}
              |SELECT n, round(avgdl, 4) AS avgdl FROM stats""".stripMargin)),

    // --- exact postings content (O7, O8) ---
    QueryDef("q_postings",
      (s, dir) => {
        val eng = engineFor(s, dir)
        eng.decode(eng.matchedShards(Seq(("content", "spark"), ("content", "join"))))
          .select(col("term"), col("doc_id"), col("tf").cast("long").as("tf"),
            col("dl").cast("long").as("dl"))
          .orderBy("term", "doc_id")
      },
      Some(s"""${baseCtes("SELECT doc_id, text FROM documents")}
              |SELECT tf.term, tf.doc_id, tf.tf, dl.dl
              |FROM tf JOIN dl ON tf.doc_id = dl.doc_id
              |WHERE tf.term IN ('spark', 'join')
              |ORDER BY tf.term, tf.doc_id""".stripMargin)),

    // --- search operators (O12-O17) ---
    searchQuery("q_search_single", Seq("spark"), 10, SearchMode.Or),
    searchQuery("q_search_or", Seq("spark", "join", "merge"), 10, SearchMode.Or),
    searchQuery("q_search_and", Seq("spark", "join"), 10, SearchMode.And),
    searchQuery("q_search_wand", Seq("spark", "join", "merge"), 10, SearchMode.Wand),
    searchQuery("q_search_wide_or", Seq("the", "data", "query", "window", "batch"),
      25, SearchMode.Or),
    searchQuery("q_search_miss", Seq("zzzabsentterm"), 10, SearchMode.Or),

    // prefix search (O9)
    QueryDef("q_search_prefix",
      (s, dir) => roundHits(
        engineFor(s, dir).search("jo", Seq("content"), beginsWith = true,
          k = 10, mode = SearchMode.Or), 10),
      Some(bm25Sql(Seq.empty, 10, prefixes = Seq("jo")))),

    // --- CRUD parity (O18-O20) ---
    searchQuery("q_crud_delete", Seq("spark", "join"), 10, SearchMode.Or,
      engineOf = engineDeleted,
      docs = "SELECT doc_id, text FROM documents WHERE doc_id % 7 <> 0"),

    searchQuery("q_crud_update", Seq("graftupdated", "spark"), 10, SearchMode.Or,
      engineOf = engineUpdated,
      docs = "SELECT doc_id, CASE WHEN doc_id = 1 THEN " +
        s"'$UpdatedText' ELSE text END AS text FROM documents"),

    searchQuery("q_crud_add", Seq("graftadded", "merge"), 10, SearchMode.Or,
      engineOf = engineAdded,
      docs = "SELECT doc_id, text FROM documents UNION ALL " +
        (0 until 3).map(i => s"SELECT ${1000000 + i} AS doc_id, '$AddedText' AS text")
          .mkString(" UNION ALL ")),

    // per-row sha256 invariant (input_hint)
    QueryDef("q_sha_invariant",
      (s, dir) => engineFor(s, dir).store.docStats()
        .select(col("doc_id"), col("content_sha")).orderBy("doc_id"),
      Some("SELECT doc_id, sha256(text) AS content_sha FROM documents ORDER BY doc_id"))
  ) ++ PipelineQueries.all ++ ExtraQueries.all

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
