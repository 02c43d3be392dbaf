package graft.ops

import graft.core.GraftSession
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts for the write-once artifact registry the curation audit
  * family reads through: (a) staleness safety — an input parquet
  * overwritten IN PLACE must re-derive on the next call with no manual
  * `clear()` (the silent-stale-answer trap); (b) cross-session
  * durability — with `spark.graft.artifactDir` pinned, a second
  * "session" (fresh registry) over the same unchanged input reads the
  * committed artifact back without building at all.
  */
class ArtifactStoreSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def tmp(tag: String): String =
    java.nio.file.Files
      .createTempDirectory(s"graft-artifact-spec-$tag").toString

  test("in-place input overwrite re-derives without clearArtifacts") {
    val sq = spark
    val input = tmp("stale") + "/in.parquet"
    var builds = 0
    def derive(): Long = {
      val d = sq.read.parquet(input)
      ArtifactStore.materializedOnce(
        d, ArtifactStore.key(d, "spec-stale", "p1")) {
        builds += 1
        d.groupBy().agg(sum(col("v")).as("s"))
      }.collect()(0).getLong(0)
    }
    sq.range(10).select(col("id"), (col("id") * 2).as("v"))
      .write.mode("overwrite").parquet(input)
    assert(derive() === 90L)
    assert(derive() === 90L)
    assert(builds === 1, "unchanged input must not rebuild")
    // overwrite the input IN PLACE — different rows, same path
    sq.range(20).select(col("id"), (col("id") * 2).as("v"))
      .write.mode("overwrite").parquet(input)
    assert(derive() === 380L,
      "post-overwrite call must see the NEW input, not a stale artifact")
    assert(builds === 2, "in-place overwrite must trigger a re-derive")
  }

  test("pinned artifactDir serves a fresh session without rebuilding") {
    val sq = spark
    val input = tmp("durable") + "/in.parquet"
    sq.range(15).select(col("id"), (col("id") + 1).as("v"))
      .write.mode("overwrite").parquet(input)
    val cacheDir = tmp("durable-cache")
    sq.conf.set("spark.graft.artifactDir", cacheDir)
    try {
      var builds = 0
      def derive(): Long = {
        val d = sq.read.parquet(input)
        ArtifactStore.materializedOnce(
          d, ArtifactStore.key(d, "spec-durable", "p1")) {
          builds += 1
          d.groupBy().agg(sum(col("v")).as("s"))
        }.collect()(0).getLong(0)
      }
      assert(derive() === 120L)
      assert(builds === 1)
      // a NEW session starts with an empty registry; same unchanged
      // input + same pinned dir must resolve to the committed artifact
      // and plan a bare file scan — zero derivation work
      ArtifactStore.clear()
      assert(derive() === 120L)
      assert(builds === 1,
        "second session must read the durable artifact, not rebuild")
    } finally {
      sq.conf.unset("spark.graft.artifactDir")
      ArtifactStore.clear()
    }
  }

  test("vacuum reclaims aged dead cache entries, keeps live and young") {
    val sq = spark
    val input = tmp("vacuum") + "/in.parquet"
    sq.range(8).select(col("id"), col("id").as("v"))
      .write.mode("overwrite").parquet(input)
    val cacheDir = tmp("vacuum-cache")
    sq.conf.set("spark.graft.artifactDir", cacheDir)
    try {
      def derive(params: String): Unit = {
        val d = sq.read.parquet(input)
        ArtifactStore.materializedOnce(
          d, ArtifactStore.key(d, "spec-vacuum", params)) {
          d.groupBy().agg(sum(col("v")).as("s"))
        }.collect()
      }
      derive("live")
      derive("dead")
      // simulate "dead" being from an earlier run: evict it from the
      // registry and age its commit marker past the retention window
      ArtifactStore.clear()
      derive("live") // re-registers the live key (cache hit, no build)
      val deadDir = new java.io.File(cacheDir).listFiles()
        .filter(_.getName.endsWith("-dead")).head
      val old = System.currentTimeMillis() - 10L * 24 * 3600 * 1000
      new java.io.File(deadDir, "_SUCCESS").setLastModified(old)
      val deleted = ArtifactStore.vacuum(sq)
      assert(deleted.exists(_.endsWith("-dead")),
        s"aged dead entry must be reclaimed, got $deleted")
      assert(new java.io.File(cacheDir).listFiles()
        .exists(_.getName.endsWith("-live")),
        "live entry must survive vacuum")
      // a dead-but-YOUNG entry survives (retention window)
      ArtifactStore.clear()
      derive("young")
      ArtifactStore.clear()
      assert(ArtifactStore.vacuum(sq) === Nil,
        "entries younger than the retention window must survive")
      // no durable dir configured → no-op
      sq.conf.unset("spark.graft.artifactDir")
      assert(ArtifactStore.vacuum(sq) === Nil)
    } finally {
      sq.conf.unset("spark.graft.artifactDir")
      ArtifactStore.clear()
    }
  }
}
