package graft

import java.nio.file.Files

import graft.core.GraftSession
import graft.queries.{Analytics, Profiling}
import graft.sources.Sources
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the profiling pack that the DuckDB oracle
  * can't express (sketch error bounds, layout-pruning advantage) plus
  * the ORC round trip.
  */
class ProfilingSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("q126: CMS estimates are one-sided and within eps*N for the probe set") {
    val rows = Profiling.all("q126_cms_error")(spark, sf).collect()
    assert(rows.length === 20)
    rows.foreach { r =>
      assert(r.getAs[Long]("never_undercounts") === 1L,
        s"${r.getAs[String]("word")}: CMS undercounted")
      assert(r.getAs[Long]("within_eps") === 1L,
        s"${r.getAs[String]("word")}: overcount beyond eps*N")
    }
  }

  test("q125: z-order files bound BOTH dims; x-sort leaves y unbounded") {
    val layout = Analytics.all("q125_zorder_layout")(spark, sf)
      .withColumn("x_span", col("x_hi") - col("x_lo") + 1L)
      .withColumn("y_span", col("y_hi") - col("y_lo") + 1L)
      .cache()
    val zmax = layout.filter(col("layout") === "zorder")
      .agg(max(col("x_span")), max(col("y_span"))).head()
    assert(zmax.getLong(0) <= 8L && zmax.getLong(1) <= 8L,
      "z-order file bounding boxes must stay within the 8x8 tile")
    // pruning for a point predicate y = 7: z-order touches only the
    // files whose y range covers it, x-sort every file.
    val zTouch = layout.filter(col("layout") === "zorder" &&
      col("y_lo") <= 7L && col("y_hi") >= 7L).count()
    val zFiles = layout.filter(col("layout") === "zorder").count()
    val xTouch = layout.filter(col("layout") === "xsort" &&
      col("y_lo") <= 7L && col("y_hi") >= 7L).count()
    val xFiles = layout.filter(col("layout") === "xsort").count()
    assert(xTouch === xFiles, "x-sorted layout cannot prune on y")
    // at sf0.001 the key space is sparse (few distinct supp keys), so
    // the guaranteed ratio is >=50%; dense 64x64 coverage gives 8/64.
    assert(zTouch * 2 <= zFiles,
      s"z-order should prune >=50% of files on a y point predicate " +
        s"(touched $zTouch of $zFiles)")
    layout.unpersist()
  }

  test("q122: the rule bundle actually splits the corpus") {
    val flags = Profiling.all("q122_gopher_rules")(spark, sf)
      .agg(
        sum(when(col("pass_all"), 1L).otherwise(0L)),
        count(lit(1))).head()
    val (kept, total) = (flags.getLong(0), flags.getLong(1))
    assert(kept > 0L, "no document passes the bundle: thresholds vacuous")
    assert(kept < total, "every document passes the bundle: thresholds vacuous")
  }

  test("fixed-width source parses declared offsets; short rows yield empty fields") {
    val dir = Files.createTempDirectory("graft-fw")
    Files.writeString(dir.resolve("ledger.txt"),
      "0001ALICE     00420\n0002BOB       00017\n0003X\n")
    val df = Sources.readFixedWidth(spark, dir.toString + "/ledger.txt",
      Seq(("id", 1, 4), ("name", 5, 10), ("amount", 15, 5)))
    assert(df.count() === 3)
    val r = df.filter(col("id") === "0002").head()
    assert(r.getAs[String]("name") === "BOB")
    assert(r.getAs[String]("amount") === "00017")
    val short = df.filter(col("id") === "0003").head()
    assert(short.getAs[String]("name") === "X" ||
      short.getAs[String]("name") === "")
    assert(short.getAs[String]("amount") === "")
  }

  test("ORC: sorted round trip preserves rows and pushes filters to the scan") {
    val dir = Files.createTempDirectory("graft-orc").toString + "/t"
    val src = spark.read.parquet(s"$sf/orders.parquet")
    Sources.writeOrcSorted(src, dir, Seq("o_totalprice"))
    val back = Sources.readOrc(spark, dir)
    assert(back.count() === src.count())
    assert(back.schema === src.schema)
    val plan = back.filter(col("o_totalprice") > 50000.0)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") &&
      plan.contains("o_totalprice"),
      s"ORC scan did not push the predicate:\n$plan")
  }
}
