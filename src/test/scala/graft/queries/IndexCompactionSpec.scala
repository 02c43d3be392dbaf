package graft.queries

import graft.core.{GraftSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Pins q244's compaction invariants independently of the DuckDB gate:
  * the compacted cells partition the corpus exactly, churn is bounded
  * by membership, and the old→new centroid drift is a valid cosine
  * that the delta actually caused (cells with no delta members cannot
  * drift — their member set, hence their exact fixed-point centroid,
  * is unchanged).
  */
class IndexCompactionSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = graft.SparkEntry
    .queries("q244_index_compaction")(spark, dir)
    .collect()

  test("compacted cells partition the corpus") {
    val total = Tables(spark, dir, "embeddings").count()
    assert(out.map(_.getAs[Long]("n_total")).sum === total)
    assert(out.forall(r => r.getAs[Long]("n_total") ===
      r.getAs[Long]("n_base") + r.getAs[Long]("n_delta")))
  }

  test("churn and drift are bounded") {
    assert(out.forall(r => r.getAs[Long]("n_moved") >= 0L &&
      r.getAs[Long]("n_moved") <= r.getAs[Long]("n_total")))
    assert(out.forall(r => math.abs(r.getAs[Double]("centroid_cos")) <= 1.0))
  }

  test("cells without delta members do not drift") {
    out.filter(_.getAs[Long]("n_delta") === 0L).foreach { r =>
      assert(r.getAs[Double]("centroid_cos") === 1.0)
    }
  }
}
