package graft

import graft.core.GraftSession
import org.scalatest.funsuite.AnyFunSuite

/** Enforcement for the 13 rows-only queries (the ones with no DuckDB
  * mirror — RNG, ML model internals, codec pipelines, pHash): each
  * embeds a machine-checkable `verdict` column stating its own
  * contract (split ratios, orthonormality, threshold bounds, twin
  * recall, ...). This spec runs every one of them on the sf0.001
  * fixture and asserts EVERY verdict value is 1 — a silently flipped
  * verdict now turns the build red instead of riding along unread.
  * (Verify additionally deletes a flipped query's gate output so the
  * driver's correctness artifact goes red too.)
  */
class RowsOnlyVerdictSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)
  private val dir = "/root/testdata/sf0.001"

  private val rowsOnly =
    (SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet).toSeq.sorted

  test("the rows-only inventory is exactly the 13 sanctioned queries") {
    assert(rowsOnly === Seq(
      "q157_phash_dedup", "q17_sample", "q50_kmeans_clusters",
      "q51_pca_projection", "q52_logreg_accuracy", "q53_als_recommend",
      "q54_ml_lsh_pairs", "q55_kmeans_elbow", "q56_als_all_recommend",
      "q61_media_features", "q63_media_pipeline", "q65_binaryfile_ingest",
      "q95_quality_classifier"))
  }

  rowsOnly.foreach { name =>
    test(s"$name self-verdict is all-green on the fixture") {
      val df = SparkEntry.queries(name)(spark, dir)
      assert(df.columns.contains("verdict"),
        s"rows-only query $name must carry a verdict column")
      val verdicts = df.select("verdict").collect().map(_.get(0))
      assert(verdicts.nonEmpty, s"$name returned no rows")
      assert(verdicts.forall(_.toString == "1"),
        s"$name flipped verdicts: ${verdicts.filterNot(_.toString == "1").mkString(",")}")
      spark.catalog.clearCache()
    }
  }
}
