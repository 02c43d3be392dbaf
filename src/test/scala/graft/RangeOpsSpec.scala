package graft

import graft.core.GraftSession
import graft.ops.RangeOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class RangeOpsSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def mkIntervals(rows: Seq[(Long, Long, Long, Long)]) = {
    val sq = spark
    import sq.implicits._
    rows.toDF("k", "iid", "lo", "hi")
  }

  private def mkPoints(rows: Seq[(Long, Long, Long)]) = {
    val sq = spark
    import sq.implicits._
    rows.toDF("k", "pid", "p")
  }

  test("intervalJoin matches exactly the theta-join semantics") {
    val intervals = mkIntervals(Seq(
      (1L, 10L, 100L, 200L), (1L, 11L, 150L, 160L), (2L, 20L, 0L, 50L)))
    val points = mkPoints(Seq(
      (1L, 1L, 100L), (1L, 2L, 155L), (1L, 3L, 201L),
      (2L, 4L, 50L), (2L, 5L, 51L), (3L, 6L, 100L)))
    val got = RangeOps
      .intervalJoin(intervals, points, Seq("k"), "lo", "hi", "p", 30L)
      .select(col("iid"), col("pid")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // brute-force reference: same key and lo <= p <= hi, inclusive
    assert(got === Set((10L, 1L), (10L, 2L), (11L, 2L), (20L, 4L)))
  }

  test("intervalJoin pairs match at most once regardless of bin span") {
    // a wide interval spans many bins; the point lives in one bin, so
    // replication must not duplicate the match
    val intervals = mkIntervals(Seq((1L, 10L, 0L, 1000L)))
    val points = mkPoints(Seq((1L, 1L, 500L)))
    val out = RangeOps
      .intervalJoin(intervals, points, Seq("k"), "lo", "hi", "p", 7L)
    assert(out.count() === 1L)
  }

  test("intervalJoin drops corrupt hi < lo rows instead of exploding them") {
    val intervals = mkIntervals(Seq(
      (1L, 10L, 1000000000L, 0L), // corrupt: would be ~10^8 bins
      (1L, 11L, 100L, 200L)))
    val points = mkPoints(Seq((1L, 1L, 150L)))
    val out = RangeOps
      .intervalJoin(intervals, points, Seq("k"), "lo", "hi", "p", 10L)
      .select(col("iid")).collect().map(_.getLong(0)).toSeq
    assert(out === Seq(11L), "the corrupt interval must match nothing")
  }

  test("intervalJoin rejects reserved and ambiguous column names") {
    val intervals = mkIntervals(Seq((1L, 10L, 0L, 10L)))
    val points = mkPoints(Seq((1L, 1L, 5L)))
    val e1 = intercept[IllegalArgumentException] {
      RangeOps.intervalJoin(intervals.withColumn("__bin", lit(0)),
        points, Seq("k"), "lo", "hi", "p", 10L)
    }
    assert(e1.getMessage.contains("__bin"))
    val e2 = intercept[IllegalArgumentException] {
      RangeOps.intervalJoin(intervals,
        points.withColumnRenamed("pid", "iid"), Seq("k"),
        "lo", "hi", "p", 10L)
    }
    assert(e2.getMessage.contains("ambiguous"))
  }

  test("intervalJoin fails loudly on an interval exceeding the bin cap") {
    // one corrupt interval spanning ~10^5 bins must kill the job with a
    // diagnostic, not silently fan out the replicas
    val intervals = mkIntervals(Seq(
      (1L, 10L, 0L, 1000000L), (1L, 11L, 100L, 200L)))
    val points = mkPoints(Seq((1L, 1L, 150L)))
    val e = intercept[Exception] {
      RangeOps.intervalJoin(intervals, points, Seq("k"),
        "lo", "hi", "p", 10L).count()
    }
    assert(e.getMessage.contains("maxBinsPerInterval"))
    // a raised cap lets the same call through (correct result: the
    // point matches both the narrow and the wide interval)
    val ok = RangeOps.intervalJoin(intervals, points, Seq("k"),
      "lo", "hi", "p", 10L, maxBinsPerInterval = 200000L)
    assert(ok.count() === 2L)
  }
}
