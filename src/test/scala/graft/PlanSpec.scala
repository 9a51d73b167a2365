package graft

import graft.core.IndexConfig
import graft.corpus.CorpusGen
import graft.index.IndexStore
import graft.search.{SearchEngine, SearchMode}
import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan audits: the scale story only holds if the plans are what we
  * think they are. Checks parquet filter pushdown on the term dictionary,
  * broadcast of the tiny stats relation, and top-k via
  * TakeOrderedAndProject (no global sort). */
class PlanSpec extends AnyFunSuite {

  private lazy val spark = TestSpark.spark

  private lazy val engine: SearchEngine = {
    // fast path off: the audits target the DISTRIBUTED plans
    val store = new IndexStore(spark, TestSpark.tempDir("plan"),
      IndexConfig(shardSpan = 64, fields = Seq("content"), driverWandMaxBytes = 0))
    store.createSegment(CorpusGen.generate(spark, 120, seed = 31))
    new SearchEngine(store)
  }

  private def physicalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("exact-term search pushes term equality into the parquet scan") {
    val plan = physicalPlan(engine.search("import", Seq("content"), k = 10))
    assert(plan.contains("PushedFilters"), plan.take(2000))
    assert(plan.contains("In(term") || plan.contains("EqualTo(term") ||
      plan.contains("IsNotNull(term"), "term filter must reach the scan:\n" + plan.take(3000))
    // no pushed-filter-free full scan of the postings table
    assert(!plan.contains("PushedFilters: []") ||
      plan.split("PushedFilters").length <= 2,
      "postings scan must carry pushed filters:\n" + plan.take(3000))
  }

  test("prefix search pushes the term range into the df-table scan") {
    val dfScan = engine.store.termDf()
      .filter(org.apache.spark.sql.functions.col("term") >= "im" &&
        org.apache.spark.sql.functions.col("term") < "in")
    val plan = physicalPlan(dfScan)
    assert(plan.contains("GreaterThanOrEqual(term,im)") && plan.contains("LessThan(term,in)"),
      "range predicate must be pushed:\n" + plan.take(3000))
  }

  test("scoring uses a broadcast join for term stats and TakeOrderedAndProject for top-k") {
    val df = engine.search("import class", Seq("content"), k = 10)
    val plan = physicalPlan(df)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"),
      "stats join must broadcast:\n" + plan.take(3000))
    assert(plan.contains("TakeOrderedAndProject"),
      "top-k must not materialize a global sort:\n" + plan.take(3000))
    assert(!plan.contains("SortExec") || !plan.contains("GlobalLimit"),
      "no global sort expected")
  }

  test("distributed WAND exchanges on shard and sorts within partitions (streaming group-walk)") {
    val df = engine.search("import the", Seq("content"), k = 10, mode = SearchMode.Wand)
    val plan = physicalPlan(df)
    assert(plan.contains("hashpartitioning(shard"),
      "WAND stage must exchange on shard:\n" + plan.take(3000))
    assert(plan.matches("(?s).*Sort \\[shard#\\d+L? ASC NULLS FIRST\\], false.*"),
      "WAND stage must sort WITHIN partitions on shard (streamed group-walk):\n" + plan.take(3000))
  }

  test("OR-mode exhaustive aggregation carries no per-doc set aggregate") {
    val df = engine.search("import class", Seq("content"), k = 10, mode = SearchMode.Or)
    val plan = physicalPlan(df)
    assert(!plan.contains("collect_set"),
      "OR mode must not aggregate a term set per doc:\n" + plan.take(3000))
  }

  test("AND-mode aggregation is a single shuffle (bit_or mask, no distinct rewrite)") {
    val df = engine.search("import class", Seq("content"), k = 10, mode = SearchMode.And)
    val plan = physicalPlan(df)
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1,
      s"AND plan must shuffle exactly once (got $exchanges):\n" + plan.take(3000))
    assert(!plan.contains("count(distinct"), "AND must not use a distinct aggregate")
  }

  test("whole-stage codegen covers the BM25 scoring expression (final AQE plan)") {
    val df = engine.search("import the", Seq("content"), k = 10)
    df.collect() // AQE finalizes the plan on execution
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("isFinalPlan=true"), plan.take(500))
    // in the final-plan rendering codegen stages print as "*(n) Operator"
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("), plan.take(3000))
  }

  test("fused curate is ONE parquet scan, zero shuffles, inside codegen") {
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select(col("doc_id"), col("text"))
    val plan = physicalPlan(graft.pipeline.Curation.curate(docs))
    // "Scan parquet" also matches inside "FileScan parquet" — one count
    // per scan node either way
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans == 1, s"curate must read the corpus exactly once (got $scans):\n" +
      plan.take(2000))
    assert(!plan.contains("Exchange"), "curate must not shuffle:\n" + plan.take(2000))
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      "curate must stay inside codegen:\n" + plan.take(2000))
  }

  test("curation operators (sampling, split, PII scrub) are shuffle-free codegen'd maps") {
    import org.apache.spark.sql.functions._
    val docs = spark.range(0, 1000).select(col("id").as("doc_id"),
      concat(lit("text of doc "), col("id").cast("string")).as("text"),
      when(col("id") % 2 === 0, "en").otherwise("fr").as("lang"))
    val plans = Seq(
      graft.pipeline.Sampling.stratifiedSample(docs, "lang", "doc_id",
        Map("en" -> 500000L, "fr" -> 250000L)),
      graft.pipeline.Sampling.withSplit(docs, "doc_id", 800000L, 100000L),
      graft.pipeline.TextAnalysis.scrubPii(docs)).map(physicalPlan)
    plans.foreach { plan =>
      assert(!plan.contains("Exchange"),
        "curation op must not shuffle:\n" + plan.take(2000))
      assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
        "curation op must stay inside codegen:\n" + plan.take(2000))
    }
  }
}
