package graft

import java.nio.file.Files

import graft.core.GraftSession
import graft.sources.{DirtyRows, Sources}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Fixture-driven tests of the reference file-format surface
  * (FIXTURES.md §1/§2/§5 shapes, tiny and deterministic).
  */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = GraftSession.local("graft-test", cores = 4)

  private def tmpFile(name: String, content: String): String = {
    val dir = Files.createTempDirectory("graft-fixture")
    val f = dir.resolve(name)
    Files.writeString(f, content)
    f.toString
  }

  test("S1: ;-delimited scan poisons unparseable rows with the sentinel") {
    // hw0 household-power shape: header row + '?' missing markers
    val path = tmpFile("power.txt",
      """Date;Time;Global_active_power;Global_reactive_power;Voltage;Global_intensity
        |16/12/2006;17:24:00;4.216;0.418;234.840;18.400
        |16/12/2006;17:25:00;?;0.436;233.630;23.000
        |16/12/2006;17:26:00;5.360;0.498;233.290;23.000""".stripMargin)
    val df = Sources.delimitedWithSentinel(spark, path, ";",
      usedIdx = Seq(2, 3, 4, 5), sentinel = -1.0)
    assert(df.count() === 4, "row count preserved (header + 3 data rows)")
    assert(df.filter(col("c2") === -1.0).count() === 2,
      "header and '?' rows both sentineled")
    assert(df.agg(max(col("c2"))).head().getDouble(0) === 5.36)
  }

  test("S6: multi-char :: delimiter parses without driver collect") {
    val path = tmpFile("ratings.dat",
      """1::1193::5::978300760
        |1::661::3::978302109
        |2::1357::5::978298709""".stripMargin)
    val df = Sources.multiCharDelimited(spark, path, "::",
      Seq("UserID", "MovieID", "Rating", "Timestamp"))
    assert(df.columns.toSeq === Seq("UserID", "MovieID", "Rating", "Timestamp"))
    assert(df.filter(col("UserID") === "1").count() === 2)
  }

  test("S5: wholetext scan splits files into documents distributively") {
    val dir = Files.createTempDirectory("graft-sgm")
    Files.writeString(dir.resolve("a.sgm"),
      "<REUTERS>doc one</REUTERS><REUTERS>doc two</REUTERS>")
    Files.writeString(dir.resolve("b.sgm"),
      "<REUTERS>doc three</REUTERS>")
    val df = Sources.wholeTextDocs(spark, dir.toString + "/*.sgm",
      "</REUTERS>")
    assert(df.count() === 3)
    assert(df.filter(col("doc").contains("doc two")).count() === 1)
  }

  test("S2: quoted CSV with explicit schema honors escapes") {
    val path = tmpFile("news.csv",
      "IDLink,Title\n1.0,\"say \"\"hi\"\", world\"\n2.0,plain")
    val schema = StructType(Seq(
      StructField("IDLink", DoubleType),
      StructField("Title", StringType)))
    val df = Sources.quotedCsv(spark, schema, path)
    assert(df.count() === 2)
    assert(df.filter(col("IDLink") === 1.0).head().getString(1)
      === "say \"hi\", world")
  }

  test("S9 sink round-trip: quoteAll CSV") {
    val sq = spark
    import sq.implicits._
    val df = Seq((1L, "a,b"), (2L, "c")).toDF("id", "s")
    val out = Files.createTempDirectory("graft-out").toString + "/csv"
    Sources.writeQuotedCsv(df, out, coalesce1 = true)
    val back = spark.read.option("header", "true").csv(out)
    assert(back.count() === 2)
    assert(back.filter(col("s") === "a,b").count() === 1)
  }

  test("partitioned parquet write prunes directories on partition filters") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    val out = Files.createTempDirectory("graft-part").toString + "/docs"
    Sources.writePartitionedParquet(docs, out, Seq("lang"))
    // layout: one directory per lang value
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("lang=")).sorted
    assert(dirs.length >= 2, s"expected lang= dirs, got ${dirs.toSeq}")
    // read back with a partition filter: the scan must prune at the
    // PLANNING level (PartitionFilters), before any file I/O
    val back = spark.read.parquet(out).filter(col("lang") === "en")
    val scan = back.queryExecution.executedPlan.toString
    // "PartitionFilters: [...]" prints even when empty — assert lang
    // is INSIDE the brackets (actually pruned), not merely mentioned
    assert("PartitionFilters: \\[[^\\]]*lang".r.findFirstIn(scan).isDefined,
      scan.take(1500))
    val want = docs.filter(col("lang") === "en").count()
    assert(back.count() === want)
    assert(back.select(org.apache.spark.sql.functions.sum("doc_id")).head.getLong(0) ===
      docs.filter(col("lang") === "en")
        .select(org.apache.spark.sql.functions.sum("doc_id")).head.getLong(0))
  }

  test("compaction collapses a small-files table preserving every row") {
    val sq = spark
    import sq.implicits._
    val out = Files.createTempDirectory("graft-compact").toString + "/t"
    // simulate a streaming ingest: 40 tiny files
    spark.range(4000).toDF("id").repartition(40)
      .write.mode("overwrite").parquet(out)
    val filesBefore = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesBefore >= 30, s"fixture should be fragmented: $filesBefore")
    val compacted = Sources.compact(spark, out, targetFileBytes = 1L << 30)
    val filesAfter = new java.io.File(out).listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(filesAfter < filesBefore / 4,
      s"compaction must collapse files: $filesBefore -> $filesAfter")
    assert(compacted.count() === 4000)
    assert(compacted.agg(org.apache.spark.sql.functions.sum("id"))
      .head.getLong(0) === (0L until 4000L).sum)
  }

  test("compaction preserves a partitioned table's col=value layout") {
    val sq = spark
    import sq.implicits._
    val out = Files.createTempDirectory("graft-compact-p").toString + "/t"
    val src = spark.range(1000).toDF("id")
      .withColumn("bucket", col("id") % 4)
    Sources.writePartitionedParquet(
      src.repartition(20), out, Seq("bucket"))
    // small target → several write tasks; the partition-col shuffle
    // must still produce ~one file per bucket=N directory, not
    // nFiles × |values| round-robin slices
    val compacted = Sources.compact(spark, out, targetFileBytes = 16L << 10)
    // the bucket=N directories must survive compaction
    val dirs = new java.io.File(out).listFiles().filter(_.isDirectory)
      .map(_.getName).filter(_.startsWith("bucket=")).sorted
    assert(dirs.length === 4, s"partition dirs lost: ${dirs.toSeq}")
    assert(compacted.count() === 1000)
    dirs.foreach { dn =>
      val files = new java.io.File(s"$out/$dn").listFiles()
        .filter(_.getName.endsWith(".parquet"))
      assert(files.length === 1,
        s"$dn holds ${files.length} files — compaction re-fragmented it")
    }
    // and pruning still works on the compacted table
    val scan = spark.read.parquet(out).filter(col("bucket") === 1)
      .queryExecution.executedPlan.toString
    assert("PartitionFilters: \\[[^\\]]*bucket".r.findFirstIn(scan).isDefined,
      scan.take(1500))
  }

  test("dirty-row policies: drop / sentinel / quarantine") {
    val sq = spark
    import sq.implicits._
    val df = Seq(("1", "10.5"), ("2", "oops"), ("3", "2.25"))
      .toDF("id", "v")
      .withColumn("v", col("v").try_cast("double"))
    val valid = col("v").isNotNull
    assert(DirtyRows.drop(df, valid).count() === 2)
    val sent = DirtyRows.sentinel(df, valid, lit(-1.0), Seq("v"))
    assert(sent.count() === 3)
    assert(sent.filter(col("v") === -1.0).count() === 1)
    val (clean, dirty) = DirtyRows.quarantine(df, valid)
    assert(clean.count() === 2 && dirty.count() === 1)
  }

  test("JSONL sink/source round-trip incl. gzip and corrupt-line quarantine") {
    val sq = spark
    import sq.implicits._
    val docs = Seq((1L, "alpha", "en"), (2L, "beta", "de"))
      .toDF("doc_id", "text", "lang")
    val dir = Files.createTempDirectory("graft-jsonl").toString
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType)))

    Sources.writeJsonl(docs, s"$dir/plain")
    // Spark disallows filtering the corrupt-record column straight off
    // the file scan (the parser would have to run twice) — persist
    // first, as callers routing to quarantine would.
    val back = Sources.readJsonl(spark, schema, s"$dir/plain").cache()
    assert(back.filter(col("_corrupt_record").isNotNull).count() === 0)
    assert(back.select("doc_id", "text", "lang").orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
      .toSeq === Seq((1L, "alpha", "en"), (2L, "beta", "de")))
    back.unpersist()

    Sources.writeJsonl(docs, s"$dir/gz", compression = "gzip")
    val gzFiles = new java.io.File(s"$dir/gz").listFiles()
      .filter(_.getName.endsWith(".json.gz"))
    assert(gzFiles.nonEmpty, "gzip sink must write .json.gz parts")
    assert(Sources.readJsonl(spark, schema, s"$dir/gz").count() === 2)

    // a malformed line must quarantine, not fail the job (ANSI on)
    val mixed = tmpFile("mixed.jsonl",
      """{"doc_id": 7, "text": "ok", "lang": "en"}
        |{not json at all
        |{"doc_id": 8, "text": "also ok", "lang": "fr"}""".stripMargin)
    val parsed = Sources.readJsonl(spark, schema, mixed).cache()
    assert(parsed.filter(col("_corrupt_record").isNull).count() === 2)
    val bad = parsed.filter(col("_corrupt_record").isNotNull)
    assert(bad.count() === 1 && bad.head.getAs[Long]("doc_id") === null)
    parsed.unpersist()
  }

  test("mergeSchema read backfills NULL for columns older files predate") {
    val sq = spark
    import sq.implicits._
    val dir = Files.createTempDirectory("graft-evolve").toString
    // generation 1: (doc_id, text); generation 2 adds quality
    Seq((1L, "old gen")).toDF("doc_id", "text")
      .write.parquet(s"$dir/t/gen=1")
    Seq((2L, "new gen", 0.9)).toDF("doc_id", "text", "quality")
      .write.parquet(s"$dir/t/gen=2")
    val merged = Sources.readParquetMerged(spark, s"$dir/t")
    assert(merged.columns.toSet === Set("doc_id", "text", "quality", "gen"))
    val rows = merged.orderBy("doc_id").collect()
    assert(rows(0).isNullAt(rows(0).fieldIndex("quality")))
    assert(rows(1).getDouble(rows(1).fieldIndex("quality")) === 0.9)
  }
}
