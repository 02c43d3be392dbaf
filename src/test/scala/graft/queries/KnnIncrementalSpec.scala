package graft.queries

import graft.core.{GraftSession, Tables}
import org.scalatest.funsuite.AnyFunSuite

/** Pins q250's maintenance contract independently of the DuckDB gate:
  * the incrementally-merged graph IS the rebuild (the in_rebuild
  * verdict column is all-1s — the provable property the query carries
  * as data), the delta genuinely lands in the graph (new edges exist,
  * and every delta node got neighbors), and base-only edges survive
  * where the delta didn't displace them.
  */
class KnnIncrementalSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val dir = "/root/testdata/sf0.001"

  private lazy val out = graft.SparkEntry
    .queries("q250_knn_incremental")(spark, dir)
    .collect()

  test("the incremental merge equals the full rebuild") {
    assert(out.forall(_.getAs[Long]("in_rebuild") === 1L))
  }

  test("the delta lands: new edges exist and every delta node has them") {
    assert(out.exists(_.getAs[Long]("new_edge") === 1L))
    val deltaNodes = Tables(spark, dir, "embeddings")
      .filter(org.apache.spark.sql.functions.col("vec_id") % 5 === 4)
      .count()
    val deltaQids = out.map(_.getAs[Long]("qid")).distinct
      .count(_ % 5 === 4)
    assert(deltaQids === deltaNodes.toInt)
  }

  test("surviving base-only edges are marked as not new") {
    val kept = out.filter(r => r.getAs[Long]("qid") % 5 != 4 &&
      r.getAs[Long]("cid") % 5 != 4)
    assert(kept.nonEmpty)
    assert(kept.forall(_.getAs[Long]("new_edge") === 0L))
  }
}
