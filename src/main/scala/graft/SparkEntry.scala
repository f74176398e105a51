package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.queries.{ExtQueries, JoinQueries, Q, ReferenceQueries, StreamingReplayQueries, WindowQueries}

/** Driver contract — see /root/repo/SURVEY.md §5.2/§7.
  *
  * `queries` carries one entry per implemented operator id from SURVEY §2;
  * `oracleSql` the DuckDB-equivalent SQL for every SQL-expressible one.
  * Query definitions live in graft.queries.* as `Q` values so the Spark
  * build and its oracle stay side by side.
  */
object SparkEntry {

  private def all: Map[String, Q] =
    ReferenceQueries.defs ++ JoinQueries.defs ++ ExtQueries.defs ++
      WindowQueries.defs ++ StreamingReplayQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape (j1) — scan → filter → hash aggregate, the canonical
    * partial+final codegen'd pipeline. */
  def entry(spark: SparkSession): DataFrame =
    JoinQueries.defs("j1_pricing_summary").build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map { case (k, q) => k -> q.build }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys → driver rows-only check. */
  def oracleSql: Map[String, String] =
    all.collect { case (k, q) if q.oracle.isDefined => k -> q.oracle.get }
}
