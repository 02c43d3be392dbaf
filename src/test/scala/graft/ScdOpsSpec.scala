package graft

import graft.core.GraftSession
import graft.ops.ScdOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ScdOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private val T0 = "2024-01-01 00:00:00"
  private val T1 = "2024-06-01 00:00:00"
  private val T2 = "2024-12-01 00:00:00"

  private def seed(rows: Seq[(Long, String, Option[Double])]): DataFrame = {
    val sq = spark
    import sq.implicits._
    rows.toDF("id", "seg", "bal")
      .withColumn("valid_from", to_timestamp(lit(T0)))
      .withColumn("valid_to", lit(null).cast("timestamp"))
      .withColumn("version", lit(1L))
  }

  private def snap(rows: Seq[(Long, String, Option[Double])]): DataFrame = {
    val sq = spark
    import sq.implicits._
    rows.toDF("id", "seg", "bal")
  }

  private def applyAt(h: DataFrame, s: DataFrame, at: String): DataFrame =
    ScdOps.scd2Apply(h, s, Seq("id"), Seq("seg", "bal"),
      to_timestamp(lit(at)))

  private def rowsOf(df: DataFrame) = df
    .select(col("id"), col("seg"), col("bal"),
      date_format(col("valid_from"), "yyyy-MM-dd").as("vf"),
      date_format(col("valid_to"), "yyyy-MM-dd").as("vt"),
      col("version"))
    .collect()
    .map(r => (r.getLong(0), r.getString(1), Option(r.get(2)),
      r.getString(3), Option(r.getString(4)), r.getLong(5)))
    .toSet

  test("update / delete / insert / no-change in one application") {
    val history = seed(Seq(
      (1L, "A", Some(10.0)), // unchanged
      (2L, "B", Some(20.0)), // seg changes
      (3L, "C", Some(30.0)), // deleted
      (4L, "D", None)))      // null bal, unchanged (null-safe compare)
    val snapshot = snap(Seq(
      (1L, "A", Some(10.0)),
      (2L, "B2", Some(20.0)),
      (4L, "D", None),
      (5L, "E", Some(50.0)))) // new key
    val got = rowsOf(applyAt(history, snapshot, T1))
    assert(got === Set(
      (1L, "A", Some(10.0), "2024-01-01", None, 1L),
      (2L, "B", Some(20.0), "2024-01-01", Some("2024-06-01"), 1L),
      (2L, "B2", Some(20.0), "2024-06-01", None, 2L),
      (3L, "C", Some(30.0), "2024-01-01", Some("2024-06-01"), 1L),
      (4L, "D", None, "2024-01-01", None, 1L),
      (5L, "E", Some(50.0), "2024-06-01", None, 1L)))
  }

  test("closed history passes through untouched across applications") {
    val history = seed(Seq((1L, "A", Some(1.0))))
    val step1 = applyAt(history, snap(Seq((1L, "B", Some(1.0)))), T1)
    val step2 = applyAt(step1, snap(Seq((1L, "C", Some(1.0)))), T2)
    val got = rowsOf(step2)
    assert(got === Set(
      (1L, "A", Some(1.0), "2024-01-01", Some("2024-06-01"), 1L),
      (1L, "B", Some(1.0), "2024-06-01", Some("2024-12-01"), 2L),
      (1L, "C", Some(1.0), "2024-12-01", None, 3L)))
    // exactly one current row per key survives any chain of applies
    assert(step2.filter(col("valid_to").isNull).count() === 1L)
  }

  test("null-flip on a tracked column opens a new version") {
    val history = seed(Seq((1L, "A", Some(1.0)), (2L, "A", None)))
    val got = rowsOf(applyAt(history,
      snap(Seq((1L, "A", None), (2L, "A", Some(2.0)))), T1))
    assert(got === Set(
      (1L, "A", Some(1.0), "2024-01-01", Some("2024-06-01"), 1L),
      (1L, "A", None, "2024-06-01", None, 2L),
      (2L, "A", None, "2024-01-01", Some("2024-06-01"), 1L),
      (2L, "A", Some(2.0), "2024-06-01", None, 2L)))
  }

  test("idempotent: re-applying the same snapshot changes nothing") {
    val history = seed(Seq((1L, "A", Some(1.0)), (2L, "B", Some(2.0))))
    val s = snap(Seq((1L, "A2", Some(1.0)), (2L, "B", Some(2.0))))
    val once = applyAt(history, s, T1)
    val twice = applyAt(once, s, T2)
    assert(rowsOf(once) === rowsOf(twice))
  }
}
