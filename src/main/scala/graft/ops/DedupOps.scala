package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Near-duplicate detection primitives: word n-gram shingles, MinHash
  * signatures, LSH banding, SimHash — the scalable dedup toolkit a
  * training-data pipeline needs (reference analogue: hw3/hw3.py MinHash
  * LSH over Reuters; re-designed here as pure Catalyst expressions).
  *
  * Design for scale:
  *   - Signatures are *per-row expressions* (`transform`/`array_min`
  *     over the shingle array), NOT explode→groupBy — zero shuffles to
  *     compute signatures at any scale, and they fuse with the scan.
  *   - Candidate pairing is a self-equi-join on (band_id, band_key): the
  *     shuffle is keyed on a uniform hash, per-bucket fan-out is bounded
  *     by design (r rows per band), so no O(n²) blow-up — the only
  *     quadratic step is inside a bucket, which LSH keeps tiny.
  *   - Exact Jaccard runs only on surviving candidates.
  *
  * Every builder has a DuckDB SQL mirror (same expression structure →
  * identical integers, since all hash arithmetic is exact LONG math).
  */
object DedupOps {

  /** Large prime < 2^31 for the universal-hash family. */
  val P: Long = 2038074743L
  /** MinHash hash-family coefficients (K = 8 permutations). */
  val as: Seq[Long] = Seq(1000003L, 1000033L, 1000037L, 1000039L,
    1000081L, 1000099L, 1000117L, 1000121L)
  val bs: Seq[Long] = Seq(12345L, 54321L, 192837L, 918273L,
    564738L, 837465L, 102938L, 292827L)
  /** Banding: 4 bands × 2 rows over the 8-value signature. */
  val bands: Int = 4
  val rowsPerBand: Int = 2

  /** Word n-gram shingles of a token array, duplicates KEPT (the raw
    * sequence — what repetition metrics need).
    */
  def shinglesRaw(toks: Column, n: Int = 3): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j + 1)): _*)))
      .otherwise(array())

  def shinglesRawSql(tok: String, n: Int = 3): String = {
    val parts = (1 to n).map(j => s"$tok[i+$j]").mkString(" || ' ' || ")
    s"""list_transform(
        range(0, greatest(len($tok) - ${n - 1}, 0)),
        i -> $parts)"""
  }

  /** Word n-gram shingles of a token array (distinct). */
  def shingles(toks: Column, n: Int = 3): Column =
    array_distinct(shinglesRaw(toks, n))

  /** SQL mirror; `tok` must be a *simple column/alias name* (it is
    * indexed inside the lambda — use a CTE to alias the token list).
    */
  def shinglesSql(tok: String, n: Int = 3): String =
    s"list_distinct(${shinglesRawSql(tok, n)})"

  /** 31-bit shingle hashes (md5-prefix mod P — portable, uniform). */
  def shingleHashes(sh: Column): Column =
    transform(sh, s => pmod(TextOps.tokenHash(s), lit(P)))

  def shingleHashesSql(shSql: String): String =
    s"list_transform($shSql, s -> ${TextOps.tokenHashSql("s")} % $P)"

  /** MinHash signature value i over pre-hashed shingles `hs`:
    * min over shingles of (a_i·h + b_i) mod P. Empty set → P (sentinel
    * larger than any real hash, identical on both engines).
    */
  def minhash(hs: Column, i: Int): Column =
    coalesce(
      array_min(transform(hs, h => pmod(h * lit(as(i)) + lit(bs(i)), lit(P)))),
      lit(P))

  def minhashSql(hsSql: String, i: Int): String =
    s"""coalesce(list_aggregate(
        list_transform($hsSql, h -> (h * ${as(i)} + ${bs(i)}) % $P),
        'min'), $P)"""

  /** All K MinHash values in ONE traversal of the shingle array —
    * the native codegen'd kernel
    * ([[graft.plans.MinHashAllExpr]]; HOF lambdas evaluate interpreted
    * and allocate an accumulator array per element). Same integers as
    * K separate [[minhash]] calls (min is order-independent) and as
    * [[minhashAllFold]], both property-pinned — materialize the
    * result once and `element_at` the components (the two-projection
    * pattern CollapseProject preserves for multiply-referenced
    * non-cheap expressions).
    */
  def minhashAll(hs: Column): Column =
    call_function("graft_minhash_all", hs)

  /** Builtin-composition reference form (no extensions needed): an
    * `aggregate` whose accumulator is the 8-long running-min array.
    * Bit-identical to [[minhashAll]] (PropertySpec).
    */
  def minhashAllFold(hs: Column): Column =
    aggregate(hs,
      array_repeat(lit(P), as.size),
      (acc, h) => array((0 until as.size).map(i =>
        least(element_at(acc, i + 1),
          pmod(h * lit(as(i)) + lit(bs(i)), lit(P)))): _*))

  /** 32-bit SimHash over pre-hashed shingles: bit j is set iff more than
    * half the shingle hashes have bit j set — the native codegen'd
    * kernel ([[graft.plans.SimHashExpr]]), bit-identical to
    * [[simhashFold]] (PropertySpec).
    */
  def simhash(hs: Column): Column =
    call_function("graft_simhash", hs)

  /** Builtin-composition reference form: ONE traversal accumulating
    * the 32 per-bit counts (the naive form — a filter+size per bit —
    * walks and allocates the array 32 times per row), then a finish
    * step folding counts into the bit mask.
    */
  def simhashFold(hs: Column): Column =
    aggregate(hs,
      array_repeat(lit(0L), 32),
      (acc, h) => array((0 until 32).map(j =>
        element_at(acc, j + 1) +
          shiftright(h, j).bitwiseAND(lit(1L))): _*),
      counts => (0 until 32).map(j =>
        when(element_at(counts, j + 1) * 2 > size(hs), lit(1L << j))
          .otherwise(lit(0L))).reduce(_ + _))

  /** Second-fingerprint rehash coefficients: one more member of the
    * same universal-hash family, applied to the shingle hashes before
    * a second [[simhash]] pass. The 32-bit simhash has exactly 8 bits
    * per band for 4 bands — no spare resolution — so when the
    * count-scaled banding rule needs keys wider than 8 bits (past
    * n ≈ 2^8·32 ≈ 8k docs) the extra bits come from this independent
    * fingerprint: band key = simhash byte | simhash2 byte << 8, masked
    * to the derived r. Near-dups agree on most simhash2 bits for the
    * same reason they agree on simhash (both are majority votes over
    * largely-shared shingle sets), so banding recall degrades
    * gracefully rather than cliffing.
    */
  val a2: Long = 1000151L
  val b2: Long = 777777L

  /** The rehashed shingle-hash list feeding the second fingerprint. */
  def rehash2(hs: Column): Column =
    transform(hs, h => pmod(h * lit(a2) + lit(b2), lit(P)))

  def rehash2Sql(hs: String): String =
    s"list_transform($hs, h -> (h * $a2 + $b2) % $P)"

  /** SQL mirror; `hs` must be a simple column/alias name (see CTE note
    * on [[shinglesSql]]).
    */
  def simhashSql(hs: String): String =
    (0 until 32)
      .map { j =>
        s"""(CASE WHEN 2 * len(list_filter($hs, h -> ((h >> $j) & 1) = 1))
             > len($hs) THEN ${1L << j} ELSE 0 END)"""
      }
      .mkString("(", " + ", ")")
}
