package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.FormattedMode

/** Round-13 plan evidence tool: dumps `explain("formatted")` for the
  * named queries into plans/<tag>/<query>_<suffix>.txt, under the same
  * session configuration as Bench. Usage:
  *
  *   sbt "runMain graft.PlanSnap <tag> <suffix> <query> [query ...]"
  *
  * (PLANS.md remains the curated, marker-audited artifact; this is the
  * raw before/after evidence for optimization rounds.)
  */
object PlanSnap {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanSnap <tag> <suffix> <query>...")
    val (tag, suffix, queries) = (args(0), args(1), args.drop(2))
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
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
    val dir = java.nio.file.Paths.get(s"plans/$tag")
    java.nio.file.Files.createDirectories(dir)
    for (q <- queries) {
      val df = SparkEntry.queries(q)(spark, sfDir)
      val p = df.queryExecution.explainString(FormattedMode)
      java.nio.file.Files.writeString(dir.resolve(s"${q}_$suffix.txt"), p)
      println(s"[plansnap] $q -> plans/$tag/${q}_$suffix.txt (${p.length} chars)")
    }
    spark.stop()
  }
}
