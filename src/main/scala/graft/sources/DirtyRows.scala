package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** First-class dirty-row policy (SURVEY §1.3): every reference unit
  * hand-rolled one of these — sentinel fill (hw0/hw0_1.py:22-24),
  * null-fill (hw2/BDM_hw2_final.py:42), cast-then-isNotNull drop
  * (FinalProject/BDM_Final.py:216-220). The engine makes the policy an
  * explicit, testable transform.
  *
  * All three policies are single-pass projections/filters — no extra
  * scan, no driver involvement; `quarantine` produces two DataFrames
  * off one cached validity predicate.
  */
object DirtyRows {

  /** Drop rows failing `valid`. */
  def drop(df: DataFrame, valid: Column): DataFrame = df.filter(valid)

  /** Keep all rows; overwrite the named columns with `sentinel` on rows
    * failing `valid` (hw0 semantics: row count preserved, bad rows
    * detectable by sentinel).
    */
  def sentinel(
      df: DataFrame,
      valid: Column,
      sentinelValue: Column,
      cols: Seq[String]): DataFrame =
    cols.foldLeft(df) { (acc, c) =>
      acc.withColumn(c, when(valid, col(c)).otherwise(sentinelValue))
    }

  /** Split into (clean, quarantined) for side-channel auditing. */
  def quarantine(df: DataFrame, valid: Column): (DataFrame, DataFrame) =
    (df.filter(valid), df.filter(!coalesce(valid, lit(false))))
}
