package graft.queries

import graft.core.{GraftSession, Tables}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q245's planner invariants independently of the DuckDB gate:
  * the strategy column is exactly the selectivity rule applied to the
  * true language counts, both plans are exercised by the test corpus,
  * the pre-filter path has perfect recall by construction (it scans
  * the same set the ground truth scans), and the post-filter scan is
  * never larger than the unselective language subset it avoids.
  */
class FilteredAnnSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = graft.SparkEntry
    .queries("q245_filtered_ann")(spark, dir)
    .collect()

  private lazy val langCounts: Map[String, Long] = {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"))
    Tables(spark, dir, "documents")
      .select(col("doc_id").as("vec_id"), col("lang"))
      .join(emb, Seq("vec_id"))
      .groupBy(col("lang")).count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
  }

  test("strategy column matches the selectivity rule") {
    val total = langCounts.values.sum
    out.foreach { r =>
      val want =
        if (langCounts(r.getAs[String]("qlang")) * 4 <= total) "pre"
        else "post"
      assert(r.getAs[String]("strategy") === want)
    }
  }

  test("both plans are exercised") {
    val strategies = out.map(_.getAs[String]("strategy")).toSet
    assert(strategies === Set("pre", "post"))
  }

  test("pre-filter recall is perfect and scans the whole subset") {
    out.filter(_.getAs[String]("strategy") === "pre").foreach { r =>
      val subset = langCounts(r.getAs[String]("qlang")) - 1 // minus self
      assert(r.getAs[Long]("n_scanned") === subset)
      assert(r.getAs[Long]("n_hits") >= math.min(5L, subset))
    }
  }

  test("post-filter scan is bounded by the language subset") {
    out.filter(_.getAs[String]("strategy") === "post").foreach { r =>
      assert(r.getAs[Long]("n_scanned") <
        langCounts(r.getAs[String]("qlang")))
      assert(r.getAs[Long]("n_hits") >= 0L &&
        r.getAs[Long]("n_hits") <= r.getAs[Long]("n_scanned"))
    }
  }
}
