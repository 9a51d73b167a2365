package graft

import graft.core._
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.search.{OracleScorer, SearchEngine, SearchMode}
import org.scalatest.funsuite.AnyFunSuite

/** Edge cases and the many-segment incremental regime. */
class EdgeSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark
  import spark.implicits._

  test("empty store, empty query, whitespace query, unknown field") {
    val store = new IndexStore(spark, TestSpark.tempDir("empty"), IndexConfig(shardSpan = 64))
    val engine = new SearchEngine(store)
    assert(engine.search("anything").isEmpty)
    store.createSegment(CorpusGen.generate(spark, 20, seed = 2))
    assert(engine.search("").isEmpty)
    assert(engine.search("   \t\n ").isEmpty)
    assert(engine.search("import", Seq("content"), k = 0).isEmpty)
  }

  test("delete of unknown ids is a no-op; double delete does not double-count") {
    val store = new IndexStore(spark, TestSpark.tempDir("noop"), IndexConfig(shardSpan = 64))
    store.createSegment(CorpusGen.generate(spark, 30, seed = 3))
    val before = store.fieldStats()("content")
    store.delete(Seq(999999L, 888888L))
    assert(store.fieldStats()("content") == before)
    store.delete(Seq(5L))
    val afterOne = store.fieldStats()("content")
    store.delete(Seq(5L))
    assert(store.fieldStats()("content") == afterOne, "second delete must be a no-op")
  }

  test("ten incremental segments search identically to one batch segment") {
    val docs = CorpusGen.generate(spark, 200, seed = 77).collect().toSeq
    val cfg = IndexConfig(shardSpan = 32, fields = Seq("content"))
    val multi = new IndexStore(spark, TestSpark.tempDir("multi"), cfg)
    docs.grouped(20).foreach(batch => multi.add(spark.createDataset(batch)))
    assert(multi.segments.size == 10)
    val single = new IndexStore(spark, TestSpark.tempDir("single"), cfg)
    single.createSegment(spark.createDataset(docs))
    Seq(("import the", SearchMode.Wand), ("class def val", SearchMode.Or),
        ("import val", SearchMode.And)).foreach { case (q, mode) =>
      val a = new SearchEngine(multi).search(q, Seq("content"), k = 15, mode = mode)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
      val b = new SearchEngine(single).search(q, Seq("content"), k = 15, mode = mode)
        .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
      assert(a == b, s"multi-segment result differs for [$q]")
      // and both equal the oracle
      val oracle = OracleScorer.search(docs, q, Seq("content"), k = 15,
        andSemantics = mode == SearchMode.And)
      assert(a.map(_._1) == oracle.map(_.doc_id))
    }
    // compaction of 10 segments preserves results
    multi.compact()
    val compacted = new IndexStore(spark, multi.baseDir, cfg)
    assert(compacted.segments.size == 1)
    val c = new SearchEngine(compacted).search("import the", Seq("content"), k = 15,
      mode = SearchMode.Wand)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    val b = new SearchEngine(single).search("import the", Seq("content"), k = 15,
      mode = SearchMode.Wand)
      .collect().map(r => (r.getLong(0), math.round(r.getDouble(1) * 1e9))).toSeq
    assert(c == b)
  }

  test("commit-field exact lookup (40-hex unique terms)") {
    val docs = CorpusGen.generate(spark, 50, seed = 12).collect().toSeq
    val store = new IndexStore(spark, TestSpark.tempDir("commit"), IndexConfig(shardSpan = 64))
    store.createSegment(spark.createDataset(docs))
    val engine = new SearchEngine(store)
    val target = docs(17)
    val hits = engine.search(target.commit, Seq("commit"), k = 5)
      .collect().map(_.getLong(0))
    assert(hits.contains(target.doc_id))
  }
}
