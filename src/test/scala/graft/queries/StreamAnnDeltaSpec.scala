package graft.queries

import graft.core.{Exact, GraftSession, Tables}
import graft.ops.{TopKOps, VectorOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins q243's stream↔batch parity independently of the DuckDB gate:
  * the in-stream nearest-centroid assignment (stateless argmax over
  * the broadcast base quantizer) must agree, row for row, with a
  * batch recomputation of the same round-6dp cosine argmax — asserted
  * through the `delta_checksum`/`n_delta_total` columns the query
  * carries, plus the serving-report invariants (16 base queries,
  * 0 ≤ n_hits ≤ 5, probed candidates a strict subset of the corpus).
  */
class StreamAnnDeltaSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val dir = "/root/testdata/sf0.001"
  private val DIM = 64

  private lazy val out = graft.SparkEntry
    .queries("q243_stream_ann_delta")(spark, dir)
    .collect()

  test("serving report shape: one row per base query, bounded recall") {
    assert(out.length === 16) // vec_id < 20 minus the 4 delta ids
    assert(out.forall(r => r.getAs[Long]("n_hits") >= 0L &&
      r.getAs[Long]("n_hits") <= 5L))
    assert(out.forall(r =>
      r.getAs[Long]("n_delta_scanned") <= r.getAs[Long]("n_scanned")))
  }

  test("routing prunes: probed candidates strictly fewer than the corpus") {
    val total = Tables(spark, dir, "embeddings").count()
    assert(out.forall(_.getAs[Long]("n_scanned") < total - 1))
  }

  test("streamed delta assignments match a batch argmax recomputation") {
    val emb = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"),
        VectorOps.toDouble(col("embedding")).as("v"))
      .withColumn("nrm", VectorOps.norm(col("v")))
    val base = emb.filter(col("vec_id") % 5 =!= 4)
    val delta = emb.filter(col("vec_id") % 5 === 4)
    val cents = base.groupBy(col("label"))
      .agg(array((0 until DIM).map(i =>
        Exact.avgFixed(element_at(col("v"), i + 1), 7)): _*).as("cv"))
      .select(col("label").as("clabel"), col("cv"),
        VectorOps.norm(col("cv")).as("cn"))
    val assigned = TopKOps.topKPerGroup(
      delta.crossJoin(broadcast(cents))
        .select(col("vec_id"), col("clabel"),
          round(VectorOps.dot(col("v"), col("cv")) /
            (col("nrm") * col("cn")), 6).as("ccos")),
      Seq(col("vec_id")), Seq(col("ccos").desc, col("clabel").asc), 1)
    val exp = assigned
      .agg(count(lit(1)), coalesce(sum(col("vec_id") * col("clabel")),
        lit(0L)))
      .collect()(0)
    assert(out.head.getAs[Long]("n_delta_total") === exp.getLong(0))
    assert(out.head.getAs[Long]("delta_checksum") === exp.getLong(1))
    // the checksum columns are constant across the report
    assert(out.map(_.getAs[Long]("delta_checksum")).distinct.length === 1)
  }
}
