package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Wide-column horizontal re-bucketing (SURVEY §2.4 A6): the reference
  * rebuilt hourly/daily averages from TS1..TS144 with 48 iterated
  * full-outer joins (hw2/BDM_hw2_final.py:149-180); here the whole
  * re-bucketing is ONE projection — zero joins, zero shuffles, fused
  * into the scan at any scale.
  */
object BucketOps {

  /** Average consecutive groups of `groupSize` columns: bucket i =
    * (cols(i*g) + … + cols(i*g+g-1)) / g, named `prefix{i+1}`.
    */
  def bucketAverage(
      df: DataFrame,
      idCols: Seq[Column],
      cols: Seq[String],
      groupSize: Int,
      prefix: String): DataFrame = {
    require(cols.nonEmpty && cols.size % groupSize == 0,
      s"${cols.size} columns do not divide into groups of $groupSize")
    val buckets = cols.grouped(groupSize).zipWithIndex.map {
      case (grp, i) =>
        (grp.map(col).reduce(_ + _) / groupSize.toDouble)
          .as(s"$prefix${i + 1}")
    }.toSeq
    df.select(idCols ++ buckets: _*)
  }
}
