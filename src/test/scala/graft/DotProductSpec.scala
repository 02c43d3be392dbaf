package graft

import graft.core.GraftSession
import graft.ops.VectorOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The codegen'd graft_dot expression must be bit-identical to the
  * interpreted higher-order fold it replaced (same strict sequential
  * accumulation) — this is what keeps the DuckDB oracle mirror exact.
  */
class DotProductSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  val sf = "/root/testdata/sf0.001"

  test("graft_dot == interpreted fold, bit for bit, on real embeddings") {
    val vecs = spark.read.parquet(s"$sf/embeddings.parquet")
      .select(col("vec_id"), VectorOps.toDouble(col("embedding")).as("v"))
    val a = vecs.select(col("vec_id").as("i"), col("v").as("va"))
    val b = vecs.select(col("vec_id").as("j"), col("v").as("vb"))
    val pairs = a.join(b, col("i") < col("j") && col("j") < col("i") + 5)
    val diff = pairs
      .select(
        VectorOps.dot(col("va"), col("vb")).as("native"),
        VectorOps.dotFold(col("va"), col("vb")).as("fold"))
      .filter(col("native") =!= col("fold"))
    assert(diff.count() === 0)
  }

  test("graft_dot is registered for SQL use") {
    val sq = spark
    import sq.implicits._
    val r = spark.sql(
      "SELECT graft_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("null array yields null; mismatched lengths use the shorter") {
    val r = spark.sql(
      """SELECT graft_dot(CAST(NULL AS ARRAY<DOUBLE>), array(1.0d)) AS a,
                graft_dot(array(1.0d, 2.0d, 9.0d), array(3.0d, 4.0d)) AS b""")
      .head()
    assert(r.isNullAt(0))
    assert(r.getDouble(1) === 11.0)
  }
}
