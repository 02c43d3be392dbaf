package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}

/** Per-query physical-execution profile: wall time plus the plan's
  * actual shuffle-write / file-read / spill byte counters, summed from
  * the executed plan's SQLMetrics after each run (accumulator values
  * are final once the action returns — no listener-drain races).
  *
  * This artifact (`PERF_r{N}.json`) turns the engine's "shuffle-light,
  * scan-pruned" design claims into measured numbers per query: a
  * per-row kernel shows ~0 shuffle bytes, a candidate-driven join
  * shows shuffle volume proportional to candidates rather than the
  * corpus, and a pushed-down scan reads less than the file footprint.
  */
object PerfProfile {

  /** Flatten the executed plan across AQE stage boundaries. */
  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case q: QueryStageExec => q +: flatten(q.plan)
    case other => other +: other.children.flatMap(flatten)
  }

  /** Sum every metric whose display name contains `needle`. Metrics
    * dedupe by accumulator id first: AQE stage reuse (ReusedExchange /
    * reused shuffle stages) surfaces the SAME SQLMetric object under
    * more than one flattened node, and summing it twice would inflate
    * the reported bytes.
    */
  private def sumMetric(plans: Seq[SparkPlan], needle: String): Long =
    plans.flatMap(_.metrics.values)
      .distinctBy(_.id)
      .filter(_.name.exists(_.toLowerCase.contains(needle)))
      .map(_.value).filter(_ > 0).sum

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse(
      "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.ansi.enabled", "true")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .config("spark.graft.failOnCartesian", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").write
      .format("noop").mode("overwrite").save()

    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))

    // Materialize THROUGH df.queryExecution (not DataFrameWriter,
    // which re-plans into a separate QueryExecution whose metrics we
    // can't reach) so the SQLMetrics we read afterwards are the ones
    // this execution populated.
    def drain(df: org.apache.spark.sql.DataFrame): Unit =
      df.queryExecution.toRdd.foreachPartition { it =>
        while (it.hasNext) it.next(); ()
      }

    if (sys.env.contains("SPARK_GRAFT_DUMP_METRICS")) {
      // calibration mode: print the distinct metric names one query
      // produces, to pin the needles below against this Spark version
      val df = SparkEntry.queries(names.head)(spark, sfDir)
      drain(df)
      val plans = flatten(df.queryExecution.executedPlan)
      plans.flatMap(_.metrics.values).flatMap(_.name).distinct.sorted
        .foreach(n => System.err.println(s"[metric] $n"))
      spark.stop(); return
    }

    // Pre-derive the write-once corpus artifacts (the pair/label
    // tables of CurationOps and their SemanticOps embedding twins)
    // exactly as a production pipeline schedules them: they are batch
    // artifacts consumed by the whole audit family, not per-query
    // work, so their one-time build cost is reported as its own
    // `artifact_build_sec` entry instead of being charged to
    // whichever audit query happens to run first. Skipped under
    // SPARK_GRAFT_ONLY (a subset may not consume them at all).
    val artifactSec = if (only.isEmpty) {
      val t0 = System.nanoTime()
      // degrade, don't abort: a broken table fails here exactly as it
      // would inside each audit query's own try — record the profile
      // for the rest of the pack and let those queries report the error
      try {
        graft.ops.CurationOps.labelsTable(
          graft.core.Tables(spark, sfDir, "documents")).count()
        graft.ops.SemanticOps.labelsTable(
          graft.core.Tables(spark, sfDir, "embeddings")).count()
        // the standing ANN-index artifacts (trained IVF centroids,
        // PQ/SQ8 codes, label-cell quantizer, LSH buckets, kNN graph):
        // index builds are scheduled batch work, serving queries then
        // profile as probe-only cost
        graft.queries.Similarity.prebuildIndexArtifacts(spark, sfDir)
        Some((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          System.err.println(s"[perf] artifact build failed: ${e.getMessage}")
          None
      }
    } else None

    val entries = names.map { name =>
      val t0 = System.nanoTime()
      val df = SparkEntry.queries(name)(spark, sfDir)
      try {
        drain(df)
        val sec = (System.nanoTime() - t0) / 1e9
        val plans = flatten(df.queryExecution.executedPlan)
        val shuffle = sumMetric(plans, "shuffle bytes written")
        val read = sumMetric(plans, "size of files read")
        val spill = sumMetric(plans, "spill size")
        f"""\"$name\":{\"sec\":$sec%.3f,\"shuffle_write_bytes\":$shuffle,\"files_read_bytes\":$read,\"spill_bytes\":$spill}"""
      } catch {
        case e: Throwable =>
          System.err.println(s"[perf] $name failed: ${e.getMessage}")
          s""""$name":{"error":true}"""
      } finally spark.catalog.clearCache()
    }
    val buildEntry = artifactSec
      .map(s => f""""artifact_build_sec":$s%.3f,""").getOrElse("")
    println(
      s"""{"sf":"$sfDir",$buildEntry"queries":{${entries.mkString(",")}}}""")
    spark.stop()
  }
}
