package graft

import graft.queries._
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Every named query here is one operator family from SURVEY.md §2; every
  * entry with DuckDB-expressible semantics also appears in [[oracleSql]] with
  * IDENTICAL column names and a total-order ORDER BY so the driver's hash
  * compare is deterministic.
  */
object SparkEntry {

  /** Flagship: the reference's decode→enrich→prune→route path
    * (lambda_function.py:43-54,80-81) on sf=0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    EventQueries.q60(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    RelationalQueries.queries ++
      EventQueries.queries ++
      DedupQueries.queries ++
      SimilarityQueries.queries ++
      TextQueries.queries ++
      MultimodalQueries.queries ++
      CorpusQueries.queries ++
      GraphQueries.queries ++
      WarehouseQueries.queries ++
      CurationQueries.queries ++
      DriftQueries.queries

  /** Bench-only queries: fast twins whose hash family (xxhash64) has no
    * DuckDB equivalent. Their algorithmic correctness is proven by the
    * oracle-verified portable twins (q66/q67); these stay in the bench so
    * the production hot path keeps a measured number. */
  def perfQueries: Map[String, (SparkSession, String) => DataFrame] =
    DedupQueries.perfQueries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    RelationalQueries.oracle ++
      EventQueries.oracle ++
      DedupQueries.oracle ++
      SimilarityQueries.oracle ++
      TextQueries.oracle ++
      MultimodalQueries.oracle ++
      CorpusQueries.oracle ++
      GraphQueries.oracle ++
      WarehouseQueries.oracle ++
      CurationQueries.oracle ++
      DriftQueries.oracle
}
