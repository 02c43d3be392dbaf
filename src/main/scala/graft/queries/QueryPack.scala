package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** A named group of driver-checkable queries.
  *
  * Contract (driver, see SparkEntry): each query is
  * `(spark, sfDir) => DataFrame`; where SQL-expressible, `oracle` holds
  * ANSI SQL that DuckDB evaluates over the same parquet tables and whose
  * result must hash-match the Spark result (columns sorted by name,
  * values compared exactly).
  *
  * House rules that make hash-equality achievable:
  *   1. Every query ends in a total-order `orderBy` mirrored by SQL
  *      `ORDER BY` with full tie-breaking.
  *   2. No order-dependent double aggregation — use [[graft.core.Exact]]
  *      and mirror the exact expression structure in SQL.
  *   3. Column names and 64-bit-ness aligned (counts LONG/BIGINT, ranks
  *      cast to LONG, doubles stay double end-to-end).
  */
trait QueryPack {
  def all: Map[String, (SparkSession, String) => DataFrame]
  def oracle: Map[String, String]
}
