package graft.search

import graft.analysis.Analyzer
import graft.core._

/** Single-node reference scorer (SURVEY.md §A.4): a direct, readable
  * transcription of the pinned BM25 semantics over the pinned analyzer.
  * Tests require the distributed engine (exhaustive and WAND paths) to be
  * rank-identical to this oracle with |Δscore| ≤ 1e-5 (FIXTURES.md §4).
  *
  * Determinism contract shared with WandExecutor: a document's score sums
  * its (field, term) contributions in ascending (field, term) order.
  */
object OracleScorer {

  final case class Analyzed(doc: CorpusDoc, tf: Map[(String, String), Int],
                            dl: Map[String, Int])

  def analyze(corpus: Seq[CorpusDoc],
              fields: Seq[String] = CorpusDoc.Fields): Seq[Analyzed] =
    corpus.map { d =>
      val tf = scala.collection.mutable.HashMap.empty[(String, String), Int]
      val dl = scala.collection.mutable.HashMap.empty[String, Int]
      fields.foreach { f =>
        val toks = Analyzer.tokenize(CorpusDoc.fieldValue(d, f))
        dl(f) = toks.length
        toks.foreach(t => tf.update((f, t), tf.getOrElse((f, t), 0) + 1))
      }
      Analyzed(d, tf.toMap, dl.toMap)
    }

  /** Exhaustive BM25 top-k over an in-memory corpus. `beginsWith` expands
    * each query term to all index terms with that prefix, capped at 100 in
    * ascending term order (reference indexing.go:773-785 semantics). */
  def search(corpus: Seq[CorpusDoc], query: String,
             fields: Seq[String] = CorpusDoc.Fields,
             beginsWith: Boolean = false, k: Int = 100,
             andSemantics: Boolean = false,
             params: Bm25Params = Bm25Params()): Seq[Hit] = {
    val analyzed = analyze(corpus, fields)
    val qTerms = Analyzer.tokenize(query).distinct.sorted.toSeq
    if (qTerms.isEmpty || corpus.isEmpty) return Seq.empty

    val n = corpus.size.toLong
    val avgdl: Map[String, Double] = fields.map { f =>
      f -> analyzed.map(_.dl(f)).sum.toDouble / n
    }.toMap

    // matched (field, term) pairs
    val vocab: Map[String, Seq[String]] =
      fields.map(f => f -> analyzed.flatMap(_.tf.keys.collect { case (`f`, t) => t })
        .distinct.sorted.toSeq).toMap
    val matched: Seq[(String, String)] =
      if (beginsWith)
        qTerms.flatMap { p =>
          fields.flatMap(f => vocab(f).filter(_.startsWith(p)).map((f, _)))
            .sortBy { case (f, t) => (t, f) }.take(100)
        }.distinct.sorted
      else fields.flatMap(f => qTerms.map(t => (f, t))).sorted

    val df: Map[(String, String), Long] = matched.map { case (f, t) =>
      (f, t) -> analyzed.count(_.tf.contains((f, t))).toLong
    }.toMap

    def idf(f: String, t: String): Double = {
      val d = df((f, t))
      math.log(1.0 + (n - d + 0.5) / (d + 0.5))
    }

    val hits = analyzed.flatMap { a =>
      var score = 0.0
      var matchedTerms = Set.empty[String]
      var any = false
      matched.foreach { case (f, t) =>
        a.tf.get((f, t)).foreach { tf =>
          if (df((f, t)) > 0) {
            val dl = a.dl(f).toDouble
            score += idf(f, t) * (tf * (params.k1 + 1.0)) /
              (tf + params.k1 * (1.0 - params.b + params.b * dl / avgdl(f)))
            matchedTerms += t
            any = true
          }
        }
      }
      if (!any) None
      else if (andSemantics && matchedTerms.size != qTerms.size) None
      else Some(Hit(a.doc.doc_id, score))
    }
    hits.sortBy(h => (-h.score, h.doc_id)).take(k)
  }
}
