package graft

import graft.core.GraftSession
import graft.ops.BucketOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Reference-fidelity golden test (SURVEY §5.2): the reference's only
  * machine-checkable artifacts are the `*_popular_day.csv` outputs of
  * its TS1..TS144 ÷72 day-bucketing (hw2/BDM_hw2_final.py:167-184,
  * 83k–88k rows of exact doubles). The original input CSVs are not
  * shipped, but every golden value is an integer TS-sum divided by
  * 72 (verified: all 260,515 day values satisfy round(v*72)/72 == v),
  * so the fixture is reconstructed by inverting: TS(1)=round(day1*72),
  * TS(73)=round(day2*72), all other TS columns 0. The reference sums
  * the 72 columns left-to-right then divides by 72; zeros are exact
  * under FP addition, so [[BucketOps.bucketAverage]] must reproduce
  * every golden double BIT-exactly — any divergence in summation
  * order, division, or column grouping fails here.
  */
class GoldenParitySpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val refDir = "/root/reference/hw2"
  private val tsCols = (1 to 144).map(i => s"TS$i")

  for (platform <- Seq("Facebook", "GooglePlus", "LinkedIn")) {
    test(s"$platform popular-day: bucketAverage matches the golden CSV bit-exactly") {
      val golden = spark.read
        .option("header", "true")
        .schema("IDLink DOUBLE, day1 DOUBLE, day2 DOUBLE")
        .csv(s"$refDir/${platform}_popular_day.csv")
      val nGolden = golden.count()
      assert(nGolden > 80000, s"unexpected golden row count $nGolden")

      val ts = (1 to 144).map {
        case 1  => round(col("day1") * 72).as("TS1")
        case 73 => round(col("day2") * 72).as("TS73")
        case i  => lit(0.0).as(s"TS$i")
      }
      val fixture = golden.select(col("IDLink") +: ts: _*)
      val got = BucketOps.bucketAverage(
        fixture, Seq(col("IDLink")), tsCols, 72, "day")

      val want = golden.select(col("IDLink"),
        col("day1").as("want_day1"), col("day2").as("want_day2"))
      val joined = got.join(want, Seq("IDLink"))
      assert(joined.count() === nGolden)
      val mismatches = joined
        .filter(col("day1") =!= col("want_day1") ||
          col("day2") =!= col("want_day2"))
        .count()
      assert(mismatches === 0L,
        s"$mismatches/$nGolden rows diverge from the reference golden output")
    }
  }

  test("hour bucketing (÷3 into 48 columns) mirrors the reference's hour path") {
    // the reference also emitted *_popular_hour.csv (48 hourly ÷3
    // averages, hw2/BDM_hw2_final.py:149-163) — those goldens are in
    // .MISSING_LARGE_BLOBS, so this asserts the operator shape: same
    // BucketOps, groupSize 3, hour1..hour48 naming, exact means
    val sq = spark
    import sq.implicits._
    val row = (1 to 144).map(_.toDouble)
    val df = Seq(Tuple1(7.0)).toDF("IDLink")
      .select(col("IDLink") +: row.zipWithIndex.map {
        case (v, i) => lit(v).as(s"TS${i + 1}")
      }: _*)
    val out = BucketOps.bucketAverage(
      df, Seq(col("IDLink")), tsCols, 3, "hour")
    assert(out.columns.toSeq === "IDLink" +: (1 to 48).map(i => s"hour$i"))
    val r = out.collect().head
    // hour k over TS(3k-2..3k) of the 1..144 ramp has mean 3k-1
    (1 to 48).foreach { k =>
      assert(r.getDouble(k) === (3.0 * k - 1.0), s"hour$k")
    }
  }

  test("Facebook IDLink 1.0 anchors to the published 8.527777777777779") {
    val golden = spark.read
      .option("header", "true")
      .schema("IDLink DOUBLE, day1 DOUBLE, day2 DOUBLE")
      .csv(s"$refDir/Facebook_popular_day.csv")
    val row = golden.filter(col("IDLink") === 1.0).collect().head
    assert(row.getDouble(1) === 8.527777777777779)
    assert(row.getDouble(2) === 12.25)
    // and the reconstruction reproduces it through the operator
    val fixture = golden.filter(col("IDLink") === 1.0)
      .select(col("IDLink") +: (1 to 144).map {
        case 1  => round(col("day1") * 72).as("TS1")
        case 73 => round(col("day2") * 72).as("TS73")
        case i  => lit(0.0).as(s"TS$i")
      }: _*)
    val out = BucketOps
      .bucketAverage(fixture, Seq(col("IDLink")), tsCols, 72, "day")
      .collect().head
    assert(out.getDouble(1) === 8.527777777777779)
    assert(out.getDouble(2) === 12.25)
  }
}
