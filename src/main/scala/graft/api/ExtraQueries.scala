package graft.api

import graft.api.QueryRegistry.QueryDef
import graft.core.IndexConfig
import graft.corpus.Corpus
import graft.functions.JsonShape
import graft.index.IndexStore
import graft.search.{SearchEngine, SearchMode}
import graft.streaming.StreamingIndex
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the remaining operator surface: fuzzy search
  * (O10), catalog listing (O21), JSON flatten/nest (O3/O4), and the
  * Structured Streaming surface (§7.6). */
object ExtraQueries {

  // ---------- streaming engine cache ----------

  private val streamCache = scala.collection.concurrent.TrieMap.empty[String, SearchEngine]

  /** Builds an index by STREAMING the documents corpus in three micro-batch
    * files — each batch commits one segment — then searches across segments.
    * Results must equal a batch build over the same rows (same oracle SQL). */
  def streamEngine(s: SparkSession, dir: String): SearchEngine =
    streamCache.getOrElseUpdate(dir, {
      val work = java.nio.file.Files.createTempDirectory("graft-stream").toString
      val docs = Corpus.fromDocuments(s, dir)
      (0 until 3).foreach { i =>
        docs.filter(col("doc_id") % 3 === i)
          .coalesce(1).write.mode("overwrite").parquet(s"$work/in/chunk=$i")
      }
      // flatten chunk files into one stream dir (the stream sees 3 files)
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      val streamDir = new org.apache.hadoop.fs.Path(s"$work/stream")
      fs.mkdirs(streamDir)
      (0 until 3).foreach { i =>
        val src = fs.globStatus(new org.apache.hadoop.fs.Path(s"$work/in/chunk=$i/*.parquet")).head.getPath
        fs.rename(src, new org.apache.hadoop.fs.Path(streamDir, s"chunk-$i.parquet"))
      }
      val store = new IndexStore(s, s"$work/idx",
        IndexConfig(shardSpan = 256, fields = Seq("content")))
      val q = StreamingIndex.indexStream(s, streamDir.toString, store)
      q.awaitTermination()
      new SearchEngine(store)
    })

  /** File streams require a DIRECTORY source; stage the events parquet file
    * into one (memoized per sf dir). */
  private val eventsDirCache = scala.collection.concurrent.TrieMap.empty[String, String]
  private def eventsStreamDir(s: SparkSession, dir: String): String =
    eventsDirCache.getOrElseUpdate(dir, {
      val work = java.nio.file.Files.createTempDirectory("graft-events").toString
      val fs = org.apache.hadoop.fs.FileSystem.getLocal(s.sparkContext.hadoopConfiguration)
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(s"$dir/events.parquet"),
        fs, new org.apache.hadoop.fs.Path(s"$work/events-0.parquet"),
        false, s.sparkContext.hadoopConfiguration)
      work
    })

  private def roundHits(hits: DataFrame, k: Int): DataFrame =
    hits.select(col("doc_id"), round(col("score"), 4).as("score"))
      .orderBy(desc("score"), asc("doc_id")).limit(k)

  // ---------- registry ----------

  def all: Seq[QueryDef] = Seq(

    // fuzzy search (O10): first-char subtree + all-chars-contained filter,
    // capped at 100 expansions in term order (mirrors expandFuzzy's cap)
    QueryDef("q_search_fuzzy",
      (s, dir) => roundHits(
        QueryRegistry.engineFor(s, dir).searchFuzzy("jion", Seq("content"), k = 10), 10),
      Some(QueryRegistry.bm25Sql(Seq.empty, 10, termSubquery = Some(
        "SELECT term FROM df WHERE term LIKE 'j%' AND contains(term, 'i') " +
          "AND contains(term, 'o') AND contains(term, 'n') " +
          "ORDER BY term LIMIT 100")))),

    // catalog (O21): per-field doc and term counts over the 5-field store
    QueryDef("q_list_indexes",
      (s, dir) => QueryRegistry.engineFor(s, dir).store.listFields(),
      Some(
        """WITH f AS (
          |  SELECT 'repo' AS field, source AS v, doc_id FROM documents
          |  UNION ALL SELECT 'path', 'doc/' || doc_id, doc_id FROM documents
          |  UNION ALL SELECT 'commit', sha256(text), doc_id FROM documents
          |  UNION ALL SELECT 'lang', lang, doc_id FROM documents
          |),
          |single AS (
          |  SELECT field, count(DISTINCT doc_id) AS n_docs,
          |         count(DISTINCT lower(v)) AS n_terms
          |  FROM f GROUP BY field
          |),
          |ctoks AS (
          |  SELECT doc_id, lower(t) AS term
          |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents)
          |  WHERE t <> ''
          |),
          |content AS (
          |  SELECT 'content' AS field, count(DISTINCT doc_id) AS n_docs,
          |         count(DISTINCT term) AS n_terms FROM ctoks
          |)
          |SELECT * FROM single UNION ALL SELECT * FROM content ORDER BY field""".stripMargin)),

    // JSON flatten + nest round trip (O3/O4): build a nested shape, flatten
    // to `a\.b` leaves, nest back, and project the restored leaves
    QueryDef("q_flatten_nest",
      (s, dir) => {
        val nested = Corpus.documents(s, dir).select(col("doc_id"),
          struct(col("lang"),
            struct(col("n_chars"), col("source")).as("meta")).as("info"))
        val restored = JsonShape.nest(JsonShape.flatten(nested))
        restored.select(col("doc_id"), col("info.lang").as("lang"),
          col("info.meta.n_chars").as("n_chars"),
          col("info.meta.source").as("source"))
          .orderBy("doc_id")
      },
      Some("SELECT doc_id, lang, n_chars, source FROM documents ORDER BY doc_id")),

    // streaming micro-batch index maintenance (§7.6): 3 file-batches -> 3
    // segments; search must equal a single batch build (same oracle)
    QueryDef("q_stream_index",
      (s, dir) => roundHits(
        streamEngine(s, dir).search("spark join merge", Seq("content"),
          k = 10, mode = SearchMode.Wand), 10),
      Some(QueryRegistry.bm25Sql(Seq("spark", "join", "merge"), 10))),

    // watermarked tumbling-window aggregation over the events stream
    QueryDef("q_stream_window",
      (s, dir) => {
        val name = s"win_${math.abs(dir.hashCode)}"
        if (!s.catalog.tableExists(name)) {
          val q = StreamingIndex.windowedEventCounts(s, eventsStreamDir(s, dir), name)
          q.awaitTermination()
        }
        s.table(name).orderBy("window_start", "event_type")
      },
      Some(
        """SELECT epoch(date_trunc('hour', ts))::BIGINT AS window_start,
          |       event_type, count(*) AS n, round(sum(value), 4) AS sum_value
          |FROM events GROUP BY 1, 2 ORDER BY window_start, event_type""".stripMargin)),

    // stateful streaming (flatMapGroupsWithState): per-user running totals
    QueryDef("q_stream_user_totals",
      (s, dir) => {
        val name = s"usr_${math.abs(dir.hashCode)}"
        if (!s.catalog.tableExists(name)) {
          val q = StreamingIndex.userTotalsStream(s, eventsStreamDir(s, dir), name)
          q.awaitTermination()
        }
        // update-mode sink may hold one row per user per micro-batch; the
        // final state per user is the max event count
        s.table(name).groupBy(col("user_id"))
          .agg(max(col("n_events")).as("n_events"),
            round(max(col("total_value")), 4).as("total_value"))
          .orderBy("user_id")
      },
      Some(
        """SELECT user_id, count(*) AS n_events, round(sum(value), 4) AS total_value
          |FROM events GROUP BY user_id ORDER BY user_id""".stripMargin))
  )
}
