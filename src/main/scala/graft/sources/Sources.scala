package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** File-format source/sink surface of the reference (SURVEY §2.1
  * S1-S11), re-expressed declaratively.
  *
  * Where the reference collected to the driver to work around reader
  * gaps (hw4/hw4.py:25-41 `collect()` + `createDataFrame`; hw3/hw3.py:
  * 27-31 per-file driver loop), these stay fully distributed: a
  * `Dataset[String]` parse pipeline for multi-char delimiters, and
  * wholetext + explode for document splitting.
  */
object Sources {

  /** S1: `sep`-delimited text where the listed 0-based field indexes are
    * parsed as double; unparseable rows (headers, `?` markers) get the
    * sentinel in every parsed field (hw0/hw0_1.py:10-27 semantics —
    * sentinel, not drop, so row counts are preserved).
    */
  def delimitedWithSentinel(
      spark: SparkSession,
      path: String,
      sep: String,
      usedIdx: Seq[Int],
      sentinel: Double): DataFrame = {
    val raw = spark.read.textFile(path)
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep))
    // try_cast, not cast: ANSI mode (Spark 4 default) makes a plain cast
    // *throw* on the first malformed field — dirty ingestion must yield
    // NULL per row instead and let the policy decide.
    val parsed = usedIdx.map { i =>
      try_element_at(parts, lit(i + 1)).try_cast("double").as(s"c$i")
    }
    val row = raw.select(parsed: _*)
    // any unparseable used field poisons the whole row → sentinel
    val anyNull = usedIdx.map(i => col(s"c$i").isNull).reduce(_ || _)
    row.select(usedIdx.map { i =>
      when(anyNull, lit(sentinel)).otherwise(col(s"c$i")).as(s"c$i")
    }: _*)
  }

  /** S2/S3: quoted/escaped CSV with header and an EXPLICIT schema (never
    * inferSchema in production paths — SURVEY §1.3). Accepts globs and
    * multiple paths (S4 multi-file union without the reduce(union) loop).
    */
  def quotedCsv(
      spark: SparkSession,
      schema: StructType,
      paths: String*): DataFrame =
    spark.read
      .option("header", "true")
      .option("escape", "\"")
      .schema(schema)
      .csv(paths: _*)

  /** S6: multi-char `::`-delimited text (MovieLens shape) → named
    * columns, no driver collect. Spark's csv reader rejects multi-char
    * separators, so parse as a Dataset[String] projection.
    */
  def multiCharDelimited(
      spark: SparkSession,
      path: String,
      sep: String,
      names: Seq[String]): DataFrame = {
    val parts = split(col("value"), java.util.regex.Pattern.quote(sep))
    spark.read.textFile(path)
      .select(names.zipWithIndex.map { case (n, i) =>
        element_at(parts, i + 1).as(n)
      }: _*)
  }

  /** S5: whole-file text scan + in-file document splitting (hw3 Reuters
    * `*.sgm` shape): one row per document, fully distributed (the
    * reference looped files on the driver — hw3/hw3.py:27-31).
    */
  def wholeTextDocs(
      spark: SparkSession,
      globPath: String,
      docDelimiter: String): DataFrame =
    spark.read
      .option("wholetext", "true")
      .text(globPath)
      .select(explode(split(col("value"),
        java.util.regex.Pattern.quote(docDelimiter))).as("doc"))
      .filter(trim(col("doc")) =!= "")

  /** S7: local-collection source (API edge for tests/small dims). */
  def fromSeq[T <: Product : org.apache.spark.sql.Encoder](
      spark: SparkSession, rows: Seq[T]): Dataset[T] =
    spark.createDataset(rows)

  /** S9: quoted CSV sink (hw3/hw3.py:99-106 shape). `coalesce1` only
    * for tiny outputs — a large result keeps its partitioning.
    */
  def writeQuotedCsv(df: DataFrame, path: String,
      coalesce1: Boolean = false): Unit = {
    val out = if (coalesce1) df.coalesce(1) else df
    out.write.mode("overwrite")
      .option("header", "true")
      .option("quoteAll", "true")
      .csv(path)
  }

  /** S8: text sink. */
  def writeText(df: DataFrame, path: String,
      coalesce1: Boolean = false): Unit = {
    val out = if (coalesce1) df.coalesce(1) else df
    out.write.mode("overwrite").text(path)
  }

  /** JSONL (newline-delimited JSON) source — the interchange format
    * LLM corpora actually ship in: one document object per line,
    * splittable (a 100 TB corpus parallelizes by line ranges without
    * coordination), appendable, streamable. Schema is EXPLICIT, never
    * inferred — inference is a full extra pass over the data before
    * the real read. PERMISSIVE parse: a malformed line becomes a row
    * whose `_corrupt_record` carries the raw text (and data fields are
    * NULL) instead of failing the job — callers route those to the
    * same quarantine policies as [[DirtyRows]].
    */
  def readJsonl(
      spark: SparkSession,
      schema: StructType,
      paths: String*): DataFrame =
    spark.read
      .schema(schema.add("_corrupt_record",
        org.apache.spark.sql.types.StringType))
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(paths: _*)

  /** JSONL sink, optionally compressed. gzip'd JSONL is the common
    * corpus publishing shape; note gzip files are NOT splittable — one
    * reader task per file — so writers must keep individual files at
    * a task-sized granularity (the partitioning of `df` decides file
    * count; [[compact]] fixes it after the fact for parquet tables).
    */
  def writeJsonl(df: DataFrame, path: String,
      compression: String = "none"): Unit =
    df.write.mode("overwrite")
      .option("compression", compression)
      .json(path)

  /** Schema-evolution read: a long-lived table accumulates file
    * generations with added columns; `mergeSchema` unions the parquet
    * footers' schemas and backfills NULL for columns a generation
    * predates — the read-side half of additive schema evolution
    * (rename/retype still needs a migration rewrite). Off by default
    * in Spark because footer-merging lists every file's footer; cost
    * it per-table, not globally.
    */
  def readParquetMerged(spark: SparkSession, path: String): DataFrame =
    spark.read.option("mergeSchema", "true").parquet(path)

  /** Partitioned parquet sink — the standard 100 TB table layout:
    * `path/col=value/part-*.parquet` directories so reads filtering on
    * the partition column scan only matching directories (partition
    * pruning, visible as `PartitionFilters` in the scan plan, prunes
    * BEFORE any I/O — the single most important data-skipping
    * mechanism at scale). Partition by low-cardinality columns only;
    * a high-cardinality partition key produces a small-files explosion
    * (see [[compact]]).
    */
  def writePartitionedParquet(
      df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)

  /** Small-files compaction — the maintenance pass every long-lived
    * ingest table needs: streaming/append writers leave thousands of
    * KB-sized files whose per-file open/footer cost dominates scans.
    * Rewrites the table into ~`bytes/targetFileBytes` files via a
    * rebalancing repartition (a real shuffle, paid once, amortized
    * over every later scan), PRESERVING any `col=value` partition
    * layout (auto-detected from the table), then swaps the compacted
    * copy in with filesystem renames — metadata-only on HDFS/local,
    * so the unavailability window is two namenode ops, not a second
    * full rewrite. Returns the compacted reader.
    */
  def compact(
      spark: SparkSession,
      path: String,
      targetFileBytes: Long = 128L * 1024 * 1024): DataFrame = {
    val df = spark.read.parquet(path)
    // preserve the partition layout: directory-derived columns come
    // back from the relation's partitionSchema
    val partCols = df.queryExecution.analyzed.collectFirst {
      case org.apache.spark.sql.execution.datasources.LogicalRelation(
          h: org.apache.spark.sql.execution.datasources.HadoopFsRelation,
          _, _, _, _) =>
        h.partitionSchema.fieldNames.toSeq
    }.getOrElse(Nil)
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val nFiles = math.max(1,
      (bytes / BigInt(targetFileBytes)).toLong +
        (if (bytes % BigInt(targetFileBytes) > 0) 1 else 0)).toInt
    val tmp = path.stripSuffix("/") + "__compacting"
    // For a partitioned table, shuffle BY the partition columns (plus
    // nFiles as the slot count): a plain round-robin repartition sends
    // every task a slice of every col=value directory, writing up to
    // nFiles × |values| files — the small-files problem reborn.
    // Hash-partitioned, each value's rows land in one task → one
    // ~target-sized file per directory (per-VALUE sizing; a single
    // giant partition value needs a subsplit key, which is a schema
    // decision, not a compaction one).
    val balanced =
      if (partCols.nonEmpty)
        df.repartition(nFiles, partCols.map(df.col): _*)
      else df.repartition(nFiles)
    val writer = balanced.write.mode("overwrite")
    (if (partCols.nonEmpty) writer.partitionBy(partCols: _*) else writer)
      .parquet(tmp)
    // Swap via renames, not a second rewrite: the tmp copy already has
    // the target file sizing, and re-reading it would re-split by
    // maxPartitionBytes and silently undo targetFileBytes. Rename the
    // live table ASIDE first (never delete-then-rename: a crash in
    // that window would leave no table at the primary path) — on any
    // failure the original is recoverable at `path__old`.
    val conf = spark.sparkContext.hadoopConfiguration
    val target = new org.apache.hadoop.fs.Path(path)
    val tmpPath = new org.apache.hadoop.fs.Path(tmp)
    val oldPath = new org.apache.hadoop.fs.Path(
      path.stripSuffix("/") + "__old")
    val fs = target.getFileSystem(conf)
    fs.delete(oldPath, true) // stale leftover from a prior crash
    require(fs.rename(target, oldPath),
      s"compaction swap failed moving the live table aside: $path " +
        s"-> $oldPath; table untouched, compacted copy at $tmp")
    if (!fs.rename(tmpPath, target)) {
      // restore the original before failing — readers keep a table
      fs.rename(oldPath, target)
      sys.error(s"compaction swap failed: restored original at $path, " +
        s"compacted copy left at $tmp")
    }
    fs.delete(oldPath, true)
    spark.read.parquet(path)
  }

  /** ORC sink, sorted within partitions by `sortCols`. ORC is the
    * second first-class columnar format (Hive-ecosystem tables arrive
    * in it); Spark's reader pushes predicates to stripe/row-group
    * min–max stats exactly as with parquet. Sorting within partitions
    * by the dominant filter column tightens those per-stripe ranges —
    * the same data-skipping lever the q125 Z-order audit measures,
    * single-column edition. `sortWithinPartitions` is a local sort:
    * no shuffle added to the write.
    */
  def writeOrcSorted(df: DataFrame, path: String,
      sortCols: Seq[String]): Unit = {
    val out =
      if (sortCols.nonEmpty)
        df.sortWithinPartitions(sortCols.map(df.col): _*)
      else df
    out.write.mode("overwrite").orc(path)
  }

  /** ORC source — explicit schema-free read (ORC files carry their
    * schema; no inference pass needed, unlike JSONL).
    */
  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** Bucketed-table sink — the storage-layout lever for repeated
    * LARGE-large joins at 100 TB: both sides written with
    * `bucketBy(n, key)` + `sortBy(key)` land co-partitioned AND
    * pre-sorted on disk, so a later sort-merge join on the key needs
    * NO shuffle exchange and no sort on either side (PlanSpec pins
    * this; eliding the SORTS additionally needs
    * `spark.sql.legacy.bucketedTableScan.outputOrdering=true` —
    * since 3.1 Spark only advertises bucket-file ordering under that
    * flag — while the exchange elision is unconditional). Broadcast covers small dims; bucketing covers the
    * fact-to-fact case (orders⋈lineitem every night) where a 100 TB
    * shuffle per run is the dominant cost — pay the shuffle once at
    * write time, amortize it over every subsequent join. Bucket count
    * is a real knob: files-per-write = partitions × buckets, so
    * callers repartition on the bucket key first (done here) to keep
    * one file per bucket.
    */
  def writeBucketed(df: DataFrame, table: String, key: String,
      buckets: Int): Unit =
    df.repartition(buckets, df.col(key))
      .write.mode("overwrite")
      .bucketBy(buckets, key).sortBy(key)
      .format("parquet").saveAsTable(table)

  /** Fixed-width source — mainframe/export layouts where each field
    * lives at a declared 1-based (start, length) offset. One text scan +
    * per-row substring projection (codegen'd, shuffle-free); short rows
    * yield empty-string fields rather than errors, matching the
    * [[DirtyRows]] philosophy of never failing the scan on a bad row.
    */
  def readFixedWidth(
      spark: SparkSession,
      path: String,
      fields: Seq[(String, Int, Int)]): DataFrame = {
    import org.apache.spark.sql.functions.{col, substring, trim}
    spark.read.text(path)
      .select(fields.map { case (name, start, len) =>
        trim(substring(col("value"), start, len)).as(name)
      }: _*)
  }
}
