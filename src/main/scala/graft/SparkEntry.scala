package graft

import graft.api.QueryRegistry
import graft.search.SearchMode
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001: build the five-field inverted
    * index over the documents corpus and run a hydrated block-max-WAND BM25
    * top-10 (driver smoke-checks rows > 0). */
  def entry(spark: SparkSession): DataFrame = {
    val eng = QueryRegistry.engineFor(spark, "/root/testdata/sf0.001")
    eng.searchDocs("spark join merge", Seq("content"), beginsWith = false,
      k = 10, mode = SearchMode.Wand)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    QueryRegistry.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = QueryRegistry.oracleSql
}
