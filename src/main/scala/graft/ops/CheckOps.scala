package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality constraint checks (the Deequ-shaped
  * validation pass a pipeline runs before trusting an ingest): each
  * check is ONE aggregation over the table producing a uniform report
  * row (check, n_rows, n_violations, passed) — union the rows for the
  * full report (q116). Counting violations instead of failing fast
  * keeps every check a single linear scan/aggregate; the caller
  * decides the severity policy on the report.
  *
  * Scale shape: completeness/predicate are map-side-combinable
  * aggregates; uniqueness is one exact distinct-count shuffle on the
  * key; referential integrity probes a (typically broadcast-sized)
  * distinct parent-key set with a left join — none of them is ever
  * row-quadratic.
  */
object CheckOps {

  private def report(name: String, nRows: Column, nViol: Column)(
      df: DataFrame): DataFrame =
    df.agg(nRows.cast("long").as("n_rows"), nViol.cast("long")
        .as("n_violations"))
      .select(lit(name).as("check_name"), col("n_rows"), col("n_violations"),
        (col("n_violations") === 0L).as("passed"))

  /** No NULLs in `c`. */
  def completeness(df: DataFrame, c: String, name: String): DataFrame =
    report(name, count(lit(1)),
      sum(when(col(c).isNull, 1L).otherwise(0L)))(df)

  /** `keys` form a primary key: violations = surplus rows beyond one
    * per distinct key (NULL-keyed rows count as violations too, since
    * count_distinct drops NULL groups a PK must not contain).
    */
  def uniqueness(df: DataFrame, keys: Seq[String], name: String)
      : DataFrame =
    report(name, count(lit(1)),
      count(lit(1)) - count_distinct(col(keys.head),
        keys.tail.map(col): _*))(df)

  /** Every `childKey` value appears in `parent.parentKey` (orphan
    * count; NULL child keys are orphans — use [[completeness]] first
    * if NULLs are legal).
    */
  def referential(child: DataFrame, childKey: String, parent: DataFrame,
      parentKey: String, name: String): DataFrame = {
    val pk = parent.select(col(parentKey).as(childKey)).distinct()
      .withColumn("__present", lit(1L))
    report(name, count(lit(1)),
      sum(when(col("__present").isNull, 1L).otherwise(0L)))(
      child.select(col(childKey)).join(pk, Seq(childKey), "left"))
  }

  /** Row-level predicate holds everywhere: violations = rows where
    * `pred` is false OR NULL (a constraint that cannot be evaluated
    * has not been satisfied).
    */
  def predicate(df: DataFrame, pred: Column, name: String): DataFrame =
    report(name, count(lit(1)),
      sum(when(pred, 0L).otherwise(1L)))(df)
}
