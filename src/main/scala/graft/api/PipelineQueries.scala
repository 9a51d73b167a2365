package graft.api

import graft.api.QueryRegistry.QueryDef
import graft.corpus.Corpus
import graft.pipeline._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver-contract queries for the training-data pipeline operators
  * (dedup / similarity / text analysis / multimodal). The test corpora have
  * no natural duplicates (max trigram Jaccard ≈ 0.03, max cosine ≈ 0.44),
  * so dup queries run over a derived corpus with deterministically injected
  * duplicates — the derivation is expressed identically in the Spark plan
  * and the DuckDB oracle SQL. */
object PipelineQueries {

  // ---------- derived corpora (Spark + SQL twins) ----------

  /** documents ∪ exact copies of every 10th doc (ids +100000). */
  private def exactDupDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Corpus.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"), col("text")))
  }
  private val exactDupSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000 AS doc_id, text FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** documents ∪ near-copies (two appended tokens) of every 10th doc. */
  private def nearDupDocs(s: SparkSession, dir: String): DataFrame = {
    val d = Corpus.documents(s, dir).select(col("doc_id"), col("text"))
    d.unionByName(d.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + 100000).as("doc_id"),
        concat(col("text"), lit(" graftdup graftdup")).as("text")))
  }
  private val nearDupSql =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 100000 AS doc_id, text || ' graftdup graftdup' AS text
      |FROM documents WHERE doc_id % 10 = 0""".stripMargin

  /** embeddings ∪ exact copies of every 20th vector (ids +100000). */
  private def dupEmbeddings(s: SparkSession, dir: String): DataFrame = {
    val e = Corpus.embeddings(s, dir).select(col("vec_id"), col("embedding"))
    e.unionByName(e.filter(col("vec_id") % 20 === 0)
      .select((col("vec_id") + 100000).as("vec_id"), col("embedding")))
  }
  private val dupEmbSql =
    """SELECT vec_id, embedding FROM embeddings
      |UNION ALL SELECT vec_id + 100000 AS vec_id, embedding FROM embeddings WHERE vec_id % 20 = 0""".stripMargin

  /** SQL twin of the tokenizer over a derived docs relation. */
  private def toksCte(docs: String): String =
    s"""WITH docs AS ($docs),
       |toks AS (
       |  SELECT doc_id, lower(t) AS term
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM docs)
       |  WHERE t <> ''
       |)""".stripMargin

  /** SQL twin of Dedup.shingles (k=3) + pairwise Jaccard ≥ minJ. */
  private def jaccardSql(docs: String, minJ: Double): String =
    s"""WITH docs AS ($docs),
       |t AS (SELECT doc_id, list_filter(string_split(lower(text),' '), x -> x <> '') AS ts FROM docs),
       |idx AS (SELECT doc_id, ts, unnest(generate_series(1, greatest(len(ts) - 2, 0))) AS i
       |        FROM t WHERE len(ts) >= 3),
       |sh AS (SELECT DISTINCT doc_id, ts[i] || ' ' || ts[i+1] || ' ' || ts[i+2] AS s FROM idx),
       |sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
       |          FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
       |          GROUP BY a.doc_id, b.doc_id)
       |SELECT id_a, id_b, round(c * 1.0 / (x.n + y.n - c), 4) AS jaccard
       |FROM inter JOIN sz x ON id_a = x.doc_id JOIN sz y ON id_b = y.doc_id
       |WHERE c * 1.0 / (x.n + y.n - c) >= $minJ
       |ORDER BY id_a, id_b""".stripMargin

  // ---------- registry ----------

  def all: Seq[QueryDef] = Seq(

    QueryDef("q_dedup_exact",
      (s, dir) => Dedup.exactGroups(exactDupDocs(s, dir))
        .select(col("keep_id"), col("n_dups")).orderBy("keep_id"),
      Some(s"""WITH dup AS ($exactDupSql)
              |SELECT min(doc_id) AS keep_id, count(*) AS n_dups
              |FROM dup GROUP BY text HAVING count(*) > 1 ORDER BY keep_id""".stripMargin)),

    QueryDef("q_dedup_ngram_jaccard",
      (s, dir) => Dedup.ngramJaccardPairs(nearDupDocs(s, dir), minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b"),
      Some(jaccardSql(nearDupSql, 0.5))),

    // MinHash-LSH candidates verified with exact Jaccard: with 64 hashes /
    // 16 bands the injected near-dups (J ≈ 0.97) are caught with probability
    // 1 - (1 - 0.97^4)^16 ≈ 1 - 1e-13 — deterministic seeded hashes, checked
    // equal to the exact-Jaccard oracle on the test corpora.
    QueryDef("q_dedup_minhash_lsh",
      (s, dir) => Dedup.minHashLshPairs(nearDupDocs(s, dir),
          numHashes = 64, bands = 16, minJaccard = 0.5)
        .select(col("id_a"), col("id_b"), round(col("jaccard"), 4).as("jaccard"))
        .orderBy("id_a", "id_b"),
      Some(jaccardSql(nearDupSql, 0.5))),

    // SimHash uses xxhash64 bit votes — not expressible in the oracle;
    // validated against brute-force Hamming in PipelineSpec (rows-only here).
    QueryDef("q_dedup_simhash",
      (s, dir) => Dedup.simHashPairs(nearDupDocs(s, dir), maxDist = 7)
        .orderBy("id_a", "id_b"),
      None),

    QueryDef("q_dedup_embedding",
      (s, dir) => Similarity.embeddingDupPairs(dupEmbeddings(s, dir),
          tau = 0.95, exact = true)
        .select(col("id_a"), col("id_b"), round(col("cos"), 4).as("cos"))
        .orderBy("id_a", "id_b"),
      Some(s"""WITH dup AS ($dupEmbSql)
              |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
              |       round(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 4) AS cos
              |FROM dup a JOIN dup b ON a.vec_id < b.vec_id
              |WHERE list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) >= 0.95
              |ORDER BY id_a, id_b""".stripMargin)),

    QueryDef("q_ann_brute_cosine",
      (s, dir) => {
        val emb = Corpus.embeddings(s, dir)
        Similarity.bruteForceTopK(emb.filter(col("vec_id") < 8), emb, k = 5)
          .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
          .orderBy("qid", "rank")
      },
      Some("""SELECT q.vec_id AS qid,
             |       row_number() OVER (PARTITION BY q.vec_id
             |         ORDER BY list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) DESC, c.vec_id) AS rank,
             |       c.vec_id,
             |       round(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]), 4) AS cos
             |FROM embeddings q JOIN embeddings c ON q.vec_id < 8 AND c.vec_id <> q.vec_id
             |QUALIFY rank <= 5
             |ORDER BY qid, rank""".stripMargin)),

    // IVF ANN (k-means coarse quantizer): approximate, recall asserted in
    // PipelineSpec vs brute force; rows-only driver check.
    QueryDef("q_ann_ivf_cosine",
      (s, dir) => {
        val emb = Corpus.embeddings(s, dir)
        Similarity.ivfTopK(emb.filter(col("vec_id") < 8), emb, k = 5,
            nLists = 16, nProbe = 4)
          .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
          .orderBy("qid", "rank")
      },
      None),

    // LSH ANN is approximate by design — recall vs brute force is asserted
    // in PipelineSpec; the driver check is rows-only.
    QueryDef("q_ann_lsh_cosine",
      (s, dir) => {
        val emb = Corpus.embeddings(s, dir)
        Similarity.lshTopK(emb.filter(col("vec_id") < 8), emb, k = 5,
            nBits = 16, bands = 8)
          .select(col("qid"), col("rank"), col("vec_id"), round(col("cos"), 4).as("cos"))
          .orderBy("qid", "rank")
      },
      None),

    QueryDef("q_lang_id",
      (s, dir) => {
        // derived text: per-row language marker appended 5x so the stopword
        // heuristic has signal (the synthetic docs are language-agnostic)
        val marked = Corpus.documents(s, dir).select(col("doc_id"), col("lang"),
          concat(col("text"), repeat(
            when(col("lang") === "de", lit(" der die und ist"))
              .when(col("lang") === "en", lit(" the and of is"))
              .when(col("lang") === "es", lit(" el la que por"))
              .when(col("lang") === "fr", lit(" le les des une"))
              .otherwise(lit(" 的 是 了 在")), 5)).as("text"))
        TextAnalysis.langId(marked).join(
            marked.select(col("doc_id"), col("lang")), Seq("doc_id"))
          .select(col("doc_id"), col("lang"), col("lang_pred"), col("best_hits"))
          .orderBy("doc_id")
      },
      Some {
        val marker = """CASE lang WHEN 'de' THEN ' der die und ist' WHEN 'en' THEN ' the and of is'
                       | WHEN 'es' THEN ' el la que por' WHEN 'fr' THEN ' le les des une'
                       | ELSE ' 的 是 了 在' END""".stripMargin.replace("\n", "")
        val sets = TextAnalysis.StopwordSets.map { case (l, ws) =>
          l -> ws.map(w => s"'$w'").mkString("(", ",", ")")
        }
        val hitCols = sets.map { case (l, inList) =>
          s"count(*) FILTER (WHERE term IN $inList) AS s_$l"
        }.mkString(", ")
        val best = sets.map { case (l, _) => s"s_$l" }.mkString("greatest(", ", ", ")")
        val pred = sets.map { case (l, _) => s"WHEN s_$l = best THEN '$l'" }.mkString(" ")
        s"""${toksCte(s"SELECT doc_id, lang, text || repeat($marker, 5) AS text FROM documents")},
           |hits AS (SELECT doc_id, $hitCols FROM toks GROUP BY doc_id),
           |scored AS (SELECT doc_id, $best AS best, * FROM hits)
           |SELECT s.doc_id, d.lang,
           |       CASE WHEN best = 0 THEN 'und' $pred END AS lang_pred,
           |       best AS best_hits
           |FROM scored s JOIN documents d ON s.doc_id = d.doc_id
           |ORDER BY s.doc_id""".stripMargin
      }),

    QueryDef("q_quality_features",
      (s, dir) => TextAnalysis.qualityFeatures(Corpus.documents(s, dir))
        .select(col("doc_id"), col("n_tokens"), col("n_chars"),
          round(col("uniq_ratio"), 4).as("uniq_ratio"),
          round(col("stopword_ratio"), 4).as("stopword_ratio"),
          round(col("nonalnum_ratio"), 4).as("nonalnum_ratio"))
        .orderBy("doc_id"),
      Some(s"""${toksCte("SELECT doc_id, text FROM documents")},
              |agg AS (SELECT doc_id, count(*) AS n_tokens,
              |               count(DISTINCT term) AS n_uniq,
              |               count(*) FILTER (WHERE term IN ('the','and','of','to','is','that','it')) AS n_stop
              |        FROM toks GROUP BY doc_id)
              |SELECT d.doc_id, a.n_tokens, length(d.text) AS n_chars,
              |       round(a.n_uniq * 1.0 / greatest(a.n_tokens, 1), 4) AS uniq_ratio,
              |       round(a.n_stop * 1.0 / greatest(a.n_tokens, 1), 4) AS stopword_ratio,
              |       round(length(regexp_replace(d.text, '[a-z0-9 ]', '', 'g')) * 1.0 / greatest(length(d.text), 1), 4) AS nonalnum_ratio
              |FROM documents d JOIN agg a ON d.doc_id = a.doc_id
              |ORDER BY d.doc_id""".stripMargin)),

    QueryDef("q_token_counts",
      (s, dir) => TextAnalysis.tokenCounts(Corpus.documents(s, dir))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       len(list_filter(string_split(text, ' '), x -> x <> '')) AS n_ws_tokens,
             |       len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]')) AS n_bpe_tokens
             |FROM documents ORDER BY doc_id""".stripMargin)),

    // winnowed fingerprints use xxhash64 — validated by property tests in
    // PipelineSpec; rows-only driver check
    QueryDef("q_fingerprints",
      (s, dir) => TextAnalysis.fingerprints(Corpus.documents(s, dir))
        .select(col("doc_id"), col("n_fingerprints")).orderBy("doc_id"),
      None),

    QueryDef("q_multimodal_meta",
      (s, dir) => Multimodal.extractMeta(
          Multimodal.withPayload(Corpus.documents(s, dir)))
        .select(col("doc_id"), col("n_bytes"), col("magic"),
          col("width").cast("long").as("width"), col("height").cast("long").as("height"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id, strlen(text) AS n_bytes,
             |       lower(hex(substr(text, 1, 4)::BLOB)) AS magic,
             |       ascii(substr(text, 1, 1)) * 256 + ascii(substr(text, 2, 1)) AS width,
             |       ascii(substr(text, 3, 1)) * 256 + ascii(substr(text, 4, 1)) AS height
             |FROM documents ORDER BY doc_id""".stripMargin)),

    QueryDef("q_frame_sample",
      (s, dir) => Multimodal.sampleFrames(
          Multimodal.withPayload(Corpus.documents(s, dir)))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_frames"))
        .orderBy("doc_id"),
      Some("""SELECT doc_id,
             |       (strlen(text) // 16 + 3) // 4 AS n_frames
             |FROM documents WHERE strlen(text) // 16 > 0 ORDER BY doc_id""".stripMargin))
  )
}
