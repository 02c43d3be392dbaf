package graft

import graft.core.GraftSession
import graft.queries.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants of greedy k-center coreset selection (q200) beyond the
  * oracle's exact-trajectory check: the covering radius is
  * non-increasing round over round (each new center can only shrink
  * some point's min-distance), centers are distinct, and every
  * non-center vector really is within the final covering radius of
  * some selected center (the 2-approximation's guarantee).
  */
class KcenterSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  lazy val sel = Similarity.all("q200_kcenter_coreset")(spark, sf)
    .collect().sortBy(_.getLong(0))

  test("selects 8 distinct centers, seeded at the min vec_id") {
    assert(sel.length === 8)
    assert(sel.map(_.getLong(1)).distinct.length === 8)
    assert(sel.head.getLong(1) === 0L)
    assert(sel.head.getLong(2) === 0L)
  }

  test("covering radius is non-increasing over rounds") {
    val radii = sel.drop(1).map(_.getLong(2))
    radii.sliding(2).foreach { case Array(a, b) => assert(b <= a) }
    assert(radii.forall(_ > 0L))
  }

  test("q201 cells partition the corpus and stay within q200's radius") {
    val cells = Similarity.all("q201_coreset_cells")(spark, sf).collect()
    assert(cells.length === 8)
    val corpus = graft.core.Tables(spark, sf, "embeddings").count()
    assert(cells.map(_.getAs[Long]("n_members")).sum === corpus)
    val lastRadius = sel.last.getLong(2)
    cells.foreach(r => assert(r.getAs[Long]("cell_radius_e14") <= lastRadius))
  }

  test("every vector is within the final selection radius of a center") {
    import graft.core.{Exact, Tables}
    import graft.ops.VectorOps
    val centers = sel.map(_.getLong(1)).toSeq
    val lastRadius = sel.last.getLong(2)
    val f = Tables(spark, sf, "embeddings").select(col("vec_id"),
      transform(VectorOps.toDouble(col("embedding")),
        x => Exact.fixed(x, 7)).as("v7"))
    val c = f.filter(col("vec_id").isin(centers: _*))
      .withColumnRenamed("vec_id", "cid")
      .withColumnRenamed("v7", "c7")
    val minDist = f.crossJoin(broadcast(c))
      .select(col("vec_id"), aggregate(
        zip_with(col("v7"), col("c7"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x).as("dd"))
      .groupBy(col("vec_id")).agg(min(col("dd")).as("dmin"))
    // after the final round every point's min distance to the selected
    // set is <= the LAST selected point's distance at selection time
    assert(minDist.filter(col("dmin") > lastRadius).count() === 0L)
  }
}
