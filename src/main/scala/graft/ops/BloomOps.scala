package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter membership prefilter — the admission-control primitive
  * a 100 TB dedup pipeline runs BEFORE any join: a compact bitmap over
  * the historical corpus's content hashes, broadcast to every executor,
  * answers "definitely new" per row with zero shuffle. Only the rows
  * the bloom cannot rule out ("maybe seen") proceed to the exact
  * membership join, so the expensive path is proportional to the
  * (tiny) collision + true-duplicate set, not the batch.
  *
  * No false negatives by construction: a row the bloom calls new IS
  * new, so prefilter + exact-confirm is semantically identical to the
  * plain exact anti-join (the q115 gate query pins this against the
  * DuckDB oracle; the spec pins the FPR bound).
  *
  * Implementation is pure `org.apache.spark.sql.functions` —
  * codegen'd end to end, no UDF: k seeded xxhash64 probes mod m bits,
  * the build aggregates per-64-bit-word ORs distributed and collects
  * only the m/64-long bitmap (driver edge bounded by the bitmap size,
  * never the corpus — 2^27 bits = 16 MiB covers ~10^7 keys/executor
  * broadcast; shard the corpus into multiple blooms beyond that).
  */
object BloomOps {

  /** Size a bloom from the (already materialized) corpus key count:
    * m = next power of two ≥ bitsPerKey·n (≥ 1024, ≤ 2²⁷ — the 16 MiB
    * broadcast ceiling documented above; shard beyond that), k =
    * 0.6·(m/n) — deliberately a hair BELOW the FPR-optimal
    * (m/n)·ln 2 ≈ 0.69·(m/n), because the optimum lands fill at
    * exactly 0.5 and this sizing pins fill ≈ 0.45 as the saturation
    * margin (FPR stays ≪ 1% at ≥10 bits/key either way). A
    * hand-picked constant m is the classic silent-degradation trap:
    * at 10× the keys the fill crosses saturation, FPR → ~1, and the
    * "no-join fast path" quietly stops filtering anything while
    * staying correct.
    */
  def sizeFor(n: Long, bitsPerKey: Int = 10): (Int, Int) = {
    require(n >= 1, s"need at least one key, got $n")
    val target = math.min(1L << 27, math.max(1024L, bitsPerKey * n))
    val m = java.lang.Long.highestOneBit(target) match {
      case h if h >= target => h
      case h => h << 1
    }
    val k = math.max(1, math.round(0.6 * m / n).toInt)
    (m.toInt, k)
  }

  /** Fraction of set bits — the saturation diagnostic. A healthy
    * bloom sits well under 0.5 (the optimum fill for k = (m/n)·ln 2);
    * approaching 1.0 means every probe answers "maybe" and the fast
    * path has degenerated to the plain exact join.
    */
  def fill(bitmap: Array[Long]): Double =
    bitmap.iterator.map(java.lang.Long.bitCount).sum.toDouble /
      (bitmap.length * 64L)

  /** Bit positions of `key` under `k` seeded hash probes mod `m`. */
  private def positions(key: Column, m: Int, k: Int): Seq[Column] =
    (0 until k).map(i => pmod(xxhash64(lit(i), key), lit(m.toLong)))

  /** Build the bitmap: one long per 64-bit word, dense, length m/64.
    * Distributed bit-set: explode the probe positions, OR the words
    * per index (a uniform tiny-key aggregation), then assemble the
    * dense array on the driver (m/64 values — the sanctioned bounded
    * driver edge, like q74's vocabulary literal).
    */
  def build(keys: DataFrame, keyCol: String, m: Int, k: Int): Array[Long] = {
    require(m % 64 == 0 && m > 0, s"m must be a positive multiple of 64: $m")
    require(k >= 1, s"k must be >= 1, got $k")
    val pos = keys
      .select(explode(array(positions(col(keyCol), m, k): _*)).as("p"))
      .select((col("p") / 64L).cast("long").as("w"),
        pmod(col("p"), lit(64L)).cast("int").as("b"))
      .groupBy(col("w"))
      // call_function: the Scala shiftleft() wrapper only takes a
      // literal bit count; the underlying SQL expression shifts by a
      // column just fine
      .agg(bit_or(call_function("shiftleft", lit(1L), col("b"))).as("word"))
      .collect()
    val bitmap = new Array[Long](m / 64)
    pos.foreach(r => bitmap(r.getLong(0).toInt) = r.getLong(1))
    bitmap
  }

  /** Probe column: true iff every seeded bit of `key` is set in
    * `bitmap` — i.e. "maybe seen"; false is a certainty of novelty.
    * The bitmap embeds as an array literal, so the whole probe stays
    * inside whole-stage codegen on the scan.
    */
  def mightContain(bitmap: Array[Long], key: Column, m: Int, k: Int)
      : Column = {
    require(bitmap.length * 64 == m, s"bitmap has ${bitmap.length} words, " +
      s"expected ${m / 64}")
    val words = typedlit(bitmap.toSeq)
    // ONE copy of the word-table literal in the plan: the k probe
    // positions form an array and the table is referenced once inside
    // the higher-order forall lambda. The previous shape repeated the
    // m/64-word literal per probe, inflating the analyzed plan (and,
    // on the streaming seam, EVERY micro-batch's re-codegen and task
    // broadcast) to k·m/8 bytes — 1.2 MB at the q234 gate's
    // runtime-sized 2^20-bit / k=9 bloom.
    forall(array(positions(key, m, k): _*), p =>
      (call_function("shiftright",
        element_at(words, (p / 64L).cast("int") + 1),
        pmod(p, lit(64L)).cast("int"))
        .bitwiseAND(lit(1L))) === lit(1L))
  }

  /** Bloom-accelerated novelty split of `batch` against a historical
    * key set: rows the bloom clears skip the join entirely; only the
    * "maybe" rows are exactly confirmed via a left-semi probe of the
    * corpus keys. Returns `batch` plus `is_new` (1 = not in corpus) —
    * bit-identical to the plain exact anti-join, but the shuffled side
    * is the maybe subset (collisions + true dups), not the batch.
    */
  def noveltySplit(corpusKeys: DataFrame, batch: DataFrame,
      keyCol: String, m: Int = 1 << 16, k: Int = 3): DataFrame = {
    val bitmap = build(corpusKeys, keyCol, m, k)
    val flagged = batch
      .withColumn("__maybe", mightContain(bitmap, col(keyCol), m, k))
    val maybe = flagged.filter(col("__maybe"))
    val confirmedDup = maybe
      .join(corpusKeys.select(col(keyCol)), Seq(keyCol), "left_semi")
      .select(col(keyCol)).distinct()
      .withColumn("__dup", lit(1L))
    flagged
      .join(confirmedDup, Seq(keyCol), "left")
      .withColumn("is_new",
        when(col("__dup").isNotNull, 0L).otherwise(1L))
      .drop("__maybe", "__dup")
  }
}
