package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Subword (BPE-style) tokenization — the unit an LLM data pipeline
  * actually budgets in (token counts, batch packing, pricing are all
  * subword-denominated; the reference's closest analogue is the
  * CountVectorizer vocabulary build, FinalProject/BDM_Final.py:666,
  * which stops at whole words).
  *
  * Two halves:
  *   - [[trainMerges]]: byte-pair-encoding merge training as a bounded
  *     iterative Spark job. ONE corpus-scale pass builds the
  *     word-frequency table; every iteration after that runs over that
  *     small table only (count adjacent symbol pairs → argmax → apply
  *     the merge), with `localCheckpoint` truncating the growing
  *     lineage each round exactly like [[GraphOps]]. The per-round
  *     argmax is a 1-row collect (the sanctioned broadcast-scalar
  *     driver edge). At 100 TB you train on the word-frequency table
  *     of a sample — the table is vocabulary-sized either way.
  *   - [[subwordTokens]]: the apply side as pure per-row expressions
  *     over a STATIC learned merge list — shuffle-free, codegen'd,
  *     and oracle-mirrorable because the merge replay is a chain of
  *     plain string `replace` calls with identical semantics in
  *     DuckDB ([[encodeWordSql]] generates the mirror from the SAME
  *     merge list, so the two sides cannot drift).
  *
  * Merge replay uses a `<sym>`-wrapped representation ("hello" →
  * "<h><e><l><l><o>"; merge (a,b) = replace("<a><b>" → "<ab>")):
  * every match is self-contained, so left-to-right non-overlapping
  * replace-all — the semantics of BOTH Spark's and DuckDB's `replace`
  * — is exactly BPE's leftmost-first merge scan. A space-joined form
  * would share the delimiter between adjacent matches and silently
  * skip every second merge in runs. Tokens are `[a-z]+` by
  * construction ([[TextOps.clean]]), so the wrapper characters can
  * never collide with symbol text.
  */
object SubwordOps {

  /** Apply one merge (a, b) → "ab" to a symbol array: the sequential
    * left-to-right non-overlapping scan, as a fold — once the pair
    * merges, the combined symbol can't left-match `a` again, which is
    * precisely BPE's non-overlap rule.
    */
  private[ops] def mergeOnce(arr: Column, a: String, b: String): Column =
    aggregate(arr, array().cast("array<string>"), (out, x) =>
      when(size(out) > 0,
        when(element_at(out, -1) === a && x === b,
          concat(slice(out, lit(1), size(out) - 1), array(lit(a + b))))
          .otherwise(concat(out, array(x))))
        .otherwise(array(x)))

  /** Train `nMerges` BPE merges over the corpus. Deterministic:
    * pair counts weight by word frequency (adjacent positions, the
    * classic Sennrich counting), argmax ties break on (pair_count
    * desc, a asc, b asc). Stops early when no pair reaches `minFreq`.
    */
  def trainMerges(docs: DataFrame, textCol: String = "text",
      nMerges: Int = 16, minFreq: Long = 2L): Seq[(String, String)] = {
    // the ONLY corpus-scale pass: corpus → word-frequency table
    var cur = docs
      .select(explode(TextOps.tokens(col(textCol))).as("w"))
      .groupBy(col("w")).agg(count(lit(1)).as("freq"))
      .select(col("freq"),
        regexp_extract_all(col("w"), lit("."), lit(0)).as("syms"))
      .localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var done = false
    var i = 0
    while (i < nMerges && !done) {
      val top = cur
        .select(col("freq"), explode(zip_with(
          slice(col("syms"), lit(1), size(col("syms")) - 1),
          slice(col("syms"), lit(2), size(col("syms")) - 1),
          (x, y) => struct(x.as("a"), y.as("b")))).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("cnt"))
        .orderBy(col("cnt").desc, col("a").asc, col("b").asc)
        .limit(1)
        .collect() // 1 row: the argmax pair — the per-round driver edge
      if (top.isEmpty || top.head.getLong(2) < minFreq) done = true
      else {
        val a = top.head.getString(0)
        val b = top.head.getString(1)
        merges += ((a, b))
        // localCheckpoint per round: without it the plan nests one
        // aggregate-fold per merge and analysis cost grows quadratically
        cur = cur
          .select(col("freq"), mergeOnce(col("syms"), a, b).as("syms"))
          .localCheckpoint()
      }
      i += 1
    }
    merges.toSeq
  }

  /** One word → its subword tokens under `merges` (wrapped-replace
    * replay; see object doc). Linear chain — each intermediate is used
    * exactly once, so HOF-lambda re-evaluation can't multiply it.
    */
  def encodeWord(word: Column, merges: Seq[(String, String)]): Column = {
    val wrapped = regexp_replace(word, "(.)", "<$1>")
    val merged = merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      org.apache.spark.sql.functions.replace(
        acc, lit(s"<$a><$b>"), lit(s"<$a$b>"))
    }
    regexp_extract_all(merged, lit("[^<>]+"), lit(0))
  }

  /** DuckDB mirror of [[encodeWord]], generated from the SAME merge
    * list (`w` is the word-level SQL expression, e.g. a lambda var).
    */
  def encodeWordSql(w: String, merges: Seq[(String, String)]): String = {
    val wrapped = s"regexp_replace($w, '(.)', '<\\1>', 'g')"
    val merged = merges.foldLeft(wrapped) { case (acc, (a, b)) =>
      s"replace($acc, '<$a><$b>', '<$a$b>')"
    }
    s"regexp_extract_all($merged, '[^<>]+')"
  }

  /** All subword tokens of a word-token array (order-preserving). */
  def encodeAll(wordToks: Column, merges: Seq[(String, String)]): Column =
    flatten(transform(wordToks, w => encodeWord(w, merges)))

  def encodeAllSql(wordToksSql: String,
      merges: Seq[(String, String)]): String =
    s"flatten(list_transform($wordToksSql, w -> ${encodeWordSql("w", merges)}))"

  /** Document text → subword tokens in one expression. */
  def subwordTokens(text: Column, merges: Seq[(String, String)]): Column =
    encodeAll(TextOps.tokens(text), merges)

  /** The engine's pinned pretrained vocabulary: `trainMerges` over the
    * sf0.001 documents corpus (nMerges = 16), frozen as a literal so
    * the apply side is a static expression with an exact SQL mirror —
    * the same shape as shipping a tokenizer vocab file. SubwordSpec
    * pins the training provenance.
    */
  val staticMerges: Seq[(String, String)] = Seq(
    ("e", "r"), ("o", "r"), ("i", "n"), ("o", "w"), ("s", "t"),
    ("l", "u"), ("a", "r"), ("p", "ar"), ("m", "er"), ("a", "t"),
    ("a", "n"), ("c", "an"), ("s", "can"), ("c", "o"), ("co", "lu"),
    ("colu", "m"))
}
