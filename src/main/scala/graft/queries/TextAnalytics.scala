package graft.queries

import graft.core.Tables
import graft.ops.{SubwordOps, TextOps, TopKOps}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis pack over the `documents` table (SURVEY §2.2 P9, §2.4
  * A4/A5, §2.5 W2, §2.8-2.9 — plus the training-data-pipeline text ops:
  * language-ID, quality scoring, token counting, fingerprinting).
  *
  * The reference did all text work through Python scalar UDFs
  * (hw2/BDM_hw2_final.py:54-60, FinalProject/BDM_Final.py:88-124); here
  * everything is native Catalyst expressions via [[graft.ops.TextOps]],
  * so the whole clean→tokenize→score pipeline stays in one
  * whole-stage-codegen span fused with the parquet scan — no shuffle
  * until the (optional) aggregation.
  */
object TextAnalytics extends QueryPack {

  private def docs(s: SparkSession, d: String) = Tables(s, d, "documents")
  private val toks = TextOps.tokens(col("text"))
  private val toksSql = TextOps.tokensSql("text")

  /** A4: global word count, top-100 by count desc with word tie-break.
    * Map-side partial aggregation makes this one shuffle of ~vocab-size
    * rows regardless of corpus size; TakeOrderedAndProject caps the sort.
    */
  private def q20WordCounts(s: SparkSession, d: String): DataFrame =
    TopKOps.topN(
      docs(s, d)
        .select(explode(toks).as("word"))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n")),
      Seq(col("n").desc, col("word").asc), 100)

  private val q20Sql =
    s"""SELECT word, COUNT(*) AS n
       FROM (SELECT unnest($toksSql) AS word FROM documents)
       GROUP BY word ORDER BY n DESC, word ASC LIMIT 100"""

  /** A4 + P5: word count with the stopword lexicon filtered out (hw2
    * shape — stopword removal before counting, done with a literal
    * lexicon inside the plan, no broadcast variable needed).
    */
  private def q19WordCountsNostop(s: SparkSession, d: String): DataFrame =
    TopKOps.topN(
      docs(s, d)
        .select(explode(TextOps.tokens(col("text"))).as("word"))
        .filter(!col("word").isInCollection(TextOps.stopwords))
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n")),
      Seq(col("n").desc, col("word").asc), 100)

  private val q19Sql = {
    val lits = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    s"""SELECT word, COUNT(*) AS n
       FROM (SELECT unnest($toksSql) AS word FROM documents)
       WHERE word NOT IN ($lits)
       GROUP BY word ORDER BY n DESC, word ASC LIMIT 100"""
  }

  /** A5+W2: top-5 words per language (rank, ties kept) — the
    * FinalProject top-k-per-(year,month) shape on the synthetic corpus.
    */
  private def q21TopWordsPerLang(s: SparkSession, d: String): DataFrame =
    TopKOps
      .topKPerGroup(
        docs(s, d)
          .select(col("lang"), explode(toks).as("word"))
          .groupBy(col("lang"), col("word"))
          .agg(count(lit(1)).as("n")),
        Seq(col("lang")), Seq(col("n").desc, col("word").asc), 5)
      .select(col("lang"), col("word"), col("n"),
        col("rnk").cast("long").as("rnk"))
      .orderBy(col("lang"), col("rnk"), col("word"))

  private val q21Sql =
    s"""SELECT lang, word, n, rnk FROM (
         SELECT lang, word, n,
                RANK() OVER (PARTITION BY lang
                             ORDER BY n DESC, word ASC) AS rnk
         FROM (SELECT lang, word, COUNT(*) AS n
               FROM (SELECT lang, unnest($toksSql) AS word FROM documents)
               GROUP BY lang, word))
       WHERE rnk <= 5 ORDER BY lang, rnk, word"""

  /** Token counting three ways: cleaned tokens, raw whitespace tokens,
    * BPE-ish regex tokens (letter runs / digit runs as atoms).
    */
  private def q22TokenStats(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      size(toks).cast("long").as("n_tokens"),
      size(array_distinct(toks)).cast("long").as("n_uniq"),
      size(filter(split(col("text"), "\\s+"), w => w =!= ""))
        .cast("long").as("n_ws_tokens"),
      size(regexp_extract_all(lower(col("text")), lit("[a-z]+|[0-9]+"), lit(0)))
        .cast("long").as("n_re_tokens"))
      .orderBy(col("doc_id"))

  private val q22Sql =
    s"""SELECT doc_id,
       CAST(len($toksSql) AS BIGINT) AS n_tokens,
       CAST(len(list_distinct($toksSql)) AS BIGINT) AS n_uniq,
       CAST(len(list_filter(string_split_regex(text, '\\s+'), w -> w <> ''))
            AS BIGINT) AS n_ws_tokens,
       CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+'))
            AS BIGINT) AS n_re_tokens
       FROM documents ORDER BY doc_id"""

  /** Heuristic document-quality score from length / diversity /
    * stopword-ratio signals. Pure per-row FP in a fixed expression order
    * → bit-identical to the oracle without fixed-point tricks.
    */
  private def q23QualityScore(s: SparkSession, d: String): DataFrame = {
    val nTok = size(toks)
    val nUniq = size(array_distinct(toks))
    val stopHits = TextOps.lexiconHits(toks, TextOps.stopwords)
    val uniqRatio = when(nTok > 0, nUniq / nTok.cast("double")).otherwise(0.0)
    val stopRatio = when(nTok > 0, stopHits / nTok.cast("double")).otherwise(0.0)
    docs(s, d).select(
      col("doc_id"),
      nTok.cast("long").as("n_tokens"),
      uniqRatio.as("uniq_ratio"),
      stopRatio.as("stop_ratio"),
      // the composite is the SHARED builder (TextOps.qualityScore) so
      // curation filters (q79) cut on exactly the audited number
      TextOps.qualityScore(toks).as("quality"))
      .orderBy(col("doc_id"))
  }

  private val q23Sql = {
    val nTok = s"len($toksSql)"
    val nUniq = s"len(list_distinct($toksSql))"
    val stopHits = TextOps.lexiconHitsSql(toksSql, TextOps.stopwords)
    val uniqRatio =
      s"CASE WHEN $nTok > 0 THEN $nUniq / CAST($nTok AS DOUBLE) ELSE 0.0 END"
    val stopRatio =
      s"CASE WHEN $nTok > 0 THEN $stopHits / CAST($nTok AS DOUBLE) ELSE 0.0 END"
    s"""SELECT doc_id,
       CAST($nTok AS BIGINT) AS n_tokens,
       $uniqRatio AS uniq_ratio,
       $stopRatio AS stop_ratio,
       ${TextOps.qualityScoreSql(toksSql)} AS quality
       FROM documents ORDER BY doc_id"""
  }

  /** Language-ID confusion matrix: labeled lang × heuristic prediction.
    * (The synthetic corpus is latin-token text, so the heuristic mostly
    * resolves to the tie-priority language — the matrix shape is the
    * point, mirroring a real langid audit query.)
    */
  private def q24LangIdConfusion(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("lang"), TextOps.langId(toks).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))

  private val q24Sql =
    s"""SELECT lang, ${TextOps.langIdSql(toksSql)} AS lang_pred, COUNT(*) AS n
       FROM documents GROUP BY 1, 2 ORDER BY lang, lang_pred"""

  /** Document fingerprints: content md5 + order-sensitive rolling
    * polynomial hash over the token stream.
    */
  private def q25Fingerprint(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      md5(TextOps.clean(col("text"))).as("content_md5"),
      TextOps.rollingFingerprint(toks).as("rolling_fp"))
      .orderBy(col("doc_id"))

  private val q25Sql =
    s"""SELECT doc_id,
       md5(${TextOps.cleanSql("text")}) AS content_md5,
       ${TextOps.rollingFingerprintSql(toksSql)} AS rolling_fp
       FROM documents ORDER BY doc_id"""

  /** Exact dedup by normalized-content hash: one keeper (min doc_id) per
    * group + copy count. groupBy on the hash = one shuffle keyed on a
    * uniform 128-bit value — no skew at any scale.
    */
  private def q26ExactDedup(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), md5(TextOps.clean(col("text"))).as("h"))
      .groupBy(col("h"))
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("h"))

  private val q26Sql =
    s"""SELECT md5(${TextOps.cleanSql("text")}) AS h,
       MIN(doc_id) AS keeper_doc_id, COUNT(*) AS n_copies
       FROM documents GROUP BY 1 ORDER BY h"""

  /** q70: the reference's exact cleaning pipelines (D1/D8 ports from
    * [[graft.ops.ReferenceTextOps]]) run as a parity scan — cleaned
    * text and preprocessed token counts, oracle-mirrored so fidelity is
    * hash-checked, not eyeballed.
    */
  private def q70ReferenceClean(s: SparkSession, d: String): DataFrame =
    docs(s, d).select(
      col("doc_id"),
      graft.ops.ReferenceTextOps.lowerCleanStr(col("text")).as("ref_clean"),
      size(graft.ops.ReferenceTextOps.preprocessTokens(col("text")))
        .cast("long").as("n_ref_tokens"))
      .orderBy(col("doc_id"))

  private val q70Sql =
    s"""SELECT doc_id,
       ${graft.ops.ReferenceTextOps.lowerCleanStrSql("text")} AS ref_clean,
       CAST(len(${graft.ops.ReferenceTextOps.preprocessTokensSql("text")})
            AS BIGINT) AS n_ref_tokens
       FROM documents ORDER BY doc_id"""

  /** q71: word co-occurrence matrix over the top-10 vocabulary (hw2's
    * remove_others + crosstab shape, SURVEY §2.4 A7/§2.9 D2 —
    * re-designed distributed: the vocabulary is a rank-limited
    * aggregate joined back in, not a driver-collected Python global).
    * Emitted as (w1, w2, n_docs) pairs — same information as the
    * pivoted crosstab without the wide dynamic schema.
    */
  private def q71Cooccurrence(s: SparkSession, d: String): DataFrame = {
    // cache: the clean→tokenize→explode relation feeds both the vocab
    // aggregate and the join-back — without it the pipeline runs twice
    val tokens = docs(s, d)
      .select(col("doc_id"), explode(toks).as("word"))
      .filter(!col("word").isInCollection(TextOps.stopwords))
      .cache()
    val vocab = TopKOps.topN(
      tokens.groupBy(col("word")).agg(count(lit(1)).as("n")),
      Seq(col("n").desc, col("word").asc), 10)
    val inVocab = tokens
      .join(broadcast(vocab.select(col("word"))), Seq("word"))
      .select(col("doc_id"), col("word")).distinct()
    inVocab.select(col("doc_id"), col("word").as("w1"))
      .join(inVocab.select(col("doc_id"), col("word").as("w2")), Seq("doc_id"))
      .filter(col("w1") < col("w2"))
      .groupBy(col("w1"), col("w2"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("w1"), col("w2"))
  }

  private val q71Sql = {
    val stops = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, word FROM
           (SELECT doc_id, unnest($toksSql) AS word FROM documents)
         WHERE word NOT IN ($stops)),
       vocab AS (SELECT word FROM
           (SELECT word, COUNT(*) AS n FROM tok GROUP BY word
            ORDER BY n DESC, word ASC LIMIT 10)),
       iv AS (SELECT DISTINCT doc_id, word FROM tok
              WHERE word IN (SELECT word FROM vocab))
       SELECT a.word AS w1, b.word AS w2, COUNT(*) AS n_docs
       FROM iv a JOIN iv b ON a.doc_id = b.doc_id AND a.word < b.word
       GROUP BY 1, 2 ORDER BY w1, w2"""
  }

  /** q118: EXACT frequent tokens via sketch pruning — the two-pass
    * heavy-hitters pattern that avoids shuffling the full vocabulary:
    * pass 1 is `df.stat.freqItems` (Karp/Misra-Gries partial sketches
    * merged per partition — single pass, bounded memory, guaranteed
    * NO false negatives above the support threshold), pass 2 exactly
    * recounts ONLY the candidate set (a broadcast-sized `isin` filter
    * before the groupBy) and applies the threshold, discarding the
    * sketch's false positives. The final answer is therefore exact —
    * the oracle runs the plain GROUP BY + HAVING — but the full-vocab
    * shuffle never happens: at 100 TB the groupBy touches ≤ 1/support
    * words instead of the whole vocabulary.
    */
  private def q118FrequentTokens(s: SparkSession, d: String): DataFrame = {
    val tokens = docs(s, d)
      .select(explode(toks).as("word"))
      .filter(!col("word").isInCollection(TextOps.stopwords))
    // candidate superset: ≤ 1/support items, the sanctioned bounded
    // driver edge (same class as q74's vocabulary literal)
    val candidates = tokens.stat.freqItems(Seq("word"), 0.01)
      .head().getSeq[String](0)
    tokens
      .filter(col("word").isInCollection(candidates))
      .groupBy(col("word"))
      .agg(count(lit(1)).as("n"))
      .crossJoin(broadcast(tokens.agg(count(lit(1)).as("n_total"))))
      .filter(col("n") * 100L > col("n_total"))
      .select(col("word"), col("n"))
      .orderBy(col("n").desc, col("word").asc)
  }

  private val q118Sql = {
    val stops = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT word FROM
           (SELECT unnest($toksSql) AS word FROM documents)
         WHERE word NOT IN ($stops)),
       tots AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM tok)
       SELECT word, CAST(COUNT(*) AS BIGINT) AS n
       FROM tok CROSS JOIN tots
       GROUP BY word, n_total
       HAVING CAST(COUNT(*) AS BIGINT) * 100 > n_total
       ORDER BY n DESC, word ASC"""
  }

  /** q119: TRIANGLE enumeration ([[graft.ops.GraphOps.triangles]])
    * over the strong co-occurrence graph — q71's top-10-vocabulary
    * pair counts kept only where the pair co-occurs in ≥ 65% of
    * documents (a scale-relative cut, so the graph stays structural
    * instead of complete), then the node-iterator wedge join + closing
    * -edge semi-probe. Triangles of strongly-co-occurring terms are
    * the topic cores the co-occurrence matrix alone doesn't surface.
    */
  private def q119CooccurrenceTriangles(s: SparkSession, d: String)
      : DataFrame = {
    val edges = q71Cooccurrence(s, d)
      .crossJoin(broadcast(docs(s, d).agg(count(lit(1)).as("n_total"))))
      .filter(col("n_docs") * 100L >= col("n_total") * 65L)
      .select(col("w1"), col("w2"))
    graft.ops.GraphOps.triangles(edges, "w1", "w2")
      .orderBy(col("a"), col("b"), col("c"))
  }

  private val q119Sql = {
    val stops = TextOps.stopwords.map(w => s"'$w'").mkString(", ")
    s"""WITH tok AS (SELECT doc_id, word FROM
           (SELECT doc_id, unnest($toksSql) AS word FROM documents)
         WHERE word NOT IN ($stops)),
       vocab AS (SELECT word FROM
           (SELECT word, COUNT(*) AS n FROM tok GROUP BY word
            ORDER BY n DESC, word ASC LIMIT 10)),
       iv AS (SELECT DISTINCT doc_id, word FROM tok
              WHERE word IN (SELECT word FROM vocab)),
       pairs AS (SELECT a.word AS w1, b.word AS w2, COUNT(*) AS n_docs
                 FROM iv a JOIN iv b
                   ON a.doc_id = b.doc_id AND a.word < b.word
                 GROUP BY 1, 2),
       tots AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_total FROM documents),
       e AS (SELECT w1 AS u, w2 AS v FROM pairs CROSS JOIN tots
             WHERE n_docs * 100 >= n_total * 65)
       SELECT ab.u AS a, ab.v AS b, bc.v AS c
       FROM e ab JOIN e bc ON ab.v = bc.u
       WHERE EXISTS (SELECT 1 FROM e ac
                     WHERE ac.u = ab.u AND ac.v = bc.v)
       ORDER BY a, b, c"""
  }

  /** q74: D2 `remove_others` end-to-end with a rank-derived top-100
    * vocabulary (hw2/BDM_hw2_final.py:222-240 ran this over its top-100
    * word list from a mutable driver global). The vocabulary is a
    * 100-row aggregate collected into the plan as a literal — the same
    * sanctioned small-result driver edge a broadcast variable is — and
    * the filter itself is a per-row order-preserving expression.
    */
  private def q74RemoveOthers(s: SparkSession, d: String): DataFrame = {
    val rawToks = graft.ops.ReferenceTextOps.removeOthersTokens(col("text"))
    val vocab = docs(s, d)
      .select(explode(rawToks).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("w").asc)
      .limit(100)
      .collect()
      .map(_.getString(0))
      .toSeq
    docs(s, d)
      .select(col("doc_id"),
        graft.ops.ReferenceTextOps.removeOthers(col("text"), vocab)
          .as("cleaned"))
      .orderBy(col("doc_id"))
  }

  private val q74Sql = {
    val toks = graft.ops.ReferenceTextOps.removeOthersTokensSql("text")
    s"""WITH tok AS (SELECT doc_id, unnest($toks) AS w,
              unnest(range(1, len($toks) + 1)) AS ord FROM documents),
       vocab AS (SELECT w FROM (SELECT w, COUNT(*) AS n FROM tok
                 WHERE w <> '' GROUP BY w ORDER BY n DESC, w ASC LIMIT 100)),
       kept AS (SELECT doc_id, ord, w FROM tok
                WHERE w IN (SELECT w FROM vocab)),
       re AS (SELECT doc_id, string_agg(w, ',' ORDER BY ord) AS cleaned
              FROM kept GROUP BY doc_id)
       SELECT d.doc_id, COALESCE(re.cleaned, 'No Values') AS cleaned
       FROM documents d LEFT JOIN re ON re.doc_id = d.doc_id
       ORDER BY d.doc_id"""
  }

  /** q83: deterministic hash-based train/valid/test split — the
    * reproducible alternative to seeded `randomSplit` (M9): a doc's
    * assignment is a pure function of its id (md5-prefix hash mod 100
    * → 80/10/10), so it's stable across runs, engines, partitionings,
    * and corpus growth (a new doc never moves an old one between
    * splits — the property that keeps eval sets uncontaminated as a
    * 100 TB corpus is re-ingested). Shuffle-free per-row expression.
    */
  private def q83HashSplit(s: SparkSession, d: String): DataFrame = {
    val bucket = pmod(TextOps.tokenHash(
      concat(lit("split:"), col("doc_id").cast("string"))), lit(100L))
    docs(s, d).select(
      col("doc_id"),
      bucket.as("bucket"),
      when(bucket < 80, "train").when(bucket < 90, "valid")
        .otherwise("test").as("split"))
      .orderBy(col("doc_id"))
  }

  private val q83Sql = {
    val hash = TextOps.tokenHashSql("('split:' || CAST(doc_id AS VARCHAR))")
    s"""SELECT doc_id, $hash % 100 AS bucket,
         CASE WHEN $hash % 100 < 80 THEN 'train'
              WHEN $hash % 100 < 90 THEN 'valid'
              ELSE 'test' END AS split
       FROM documents ORDER BY doc_id"""
  }

  /** q84: length-bucketed batch packing — group docs of similar token
    * count into fixed-size training batches (length bucketing is what
    * keeps padding waste down when batching variable-length
    * sequences). Buckets are STATIC length ranges (not a global ntile,
    * whose single-partition window would serialize at 100 TB), so the
    * per-bucket row_number windows distribute across buckets; batch id
    * = position DIV batch-size within the (length, id)-ordered bucket.
    */
  private def q84LengthBuckets(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nTok = size(toks).cast("long")
    // Column `/` on longs is DOUBLE division — cast back to long
    // (truncation == floor for non-negatives) to mirror DuckDB's `//`
    val bucketed = docs(s, d)
      .select(col("doc_id"), nTok.as("n_tokens"),
        least((nTok / 16L).cast("long"), lit(7L)).as("bucket"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n_tokens"), col("doc_id"))
    bucketed
      .select(col("bucket"), col("n_tokens"),
        ((row_number().over(w) - 1) / 8).cast("long").as("batch_id"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_tokens")).as("min_tokens"),
        max(col("n_tokens")).as("max_tokens"))
      .orderBy(col("bucket"), col("batch_id"))
  }

  private val q84Sql =
    s"""WITH b AS (SELECT doc_id,
           CAST(len($toksSql) AS BIGINT) AS n_tokens,
           least(CAST(len($toksSql) AS BIGINT) // 16, 7) AS bucket
         FROM documents),
       packed AS (SELECT bucket, n_tokens,
           CAST((row_number() OVER
             (PARTITION BY bucket ORDER BY n_tokens, doc_id) - 1) // 8
             AS BIGINT) AS batch_id
         FROM b)
       SELECT bucket, batch_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(n_tokens) AS min_tokens, MAX(n_tokens) AS max_tokens
       FROM packed GROUP BY bucket, batch_id
       ORDER BY bucket, batch_id"""

  /** q90: intra-document repetition ratios — the Gopher-family quality
    * signal the inter-document dedup can't see: a doc stuffed with its
    * own repeated phrases has a high duplicate-n-gram fraction
    * (1 - distinct/total) even when it duplicates no OTHER doc.
    * Computed for unigrams and trigrams as per-row expressions —
    * shuffle-free, scan-fused, linear at any scale.
    */
  private def q90Repetition(s: SparkSession, d: String): DataFrame = {
    import graft.ops.DedupOps
    def ratio(raw: org.apache.spark.sql.Column) =
      when(size(raw) > 0,
        lit(1.0) - size(array_distinct(raw)).cast("double") / size(raw))
        .otherwise(lit(0.0))
    // chained projections so the tokenization runs ONCE per row:
    // shinglesRaw's lambda indexes its input per element, and HOF
    // lambdas get no CSE — feeding the raw tokenizer expression in
    // would re-run the regex pipeline ~3n times per doc (O(n²))
    docs(s, d)
      .select(col("doc_id"), toks.as("toks"))
      .select(col("doc_id"), col("toks"),
        DedupOps.shinglesRaw(col("toks")).as("sh3"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("long").as("n_tokens"),
        ratio(col("toks")).as("rep1"),
        ratio(col("sh3")).as("rep3"))
      .orderBy(col("doc_id"))
  }

  private val q90Sql = {
    val raw3 = graft.ops.DedupOps.shinglesRawSql("toks")
    s"""WITH t AS (SELECT doc_id, $toksSql AS toks FROM documents),
       g AS (SELECT doc_id, toks, $raw3 AS sh3 FROM t)
       SELECT doc_id, CAST(len(toks) AS BIGINT) AS n_tokens,
         CASE WHEN len(toks) > 0 THEN
           1.0 - CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks)
         ELSE 0.0 END AS rep1,
         CASE WHEN len(sh3) > 0 THEN
           1.0 - CAST(len(list_distinct(sh3)) AS DOUBLE) / len(sh3)
         ELSE 0.0 END AS rep3
       FROM g ORDER BY doc_id"""
  }

  /** q88: deterministic stratified sampling — EXACT every-5th-doc per
    * language stratum (systematic sampling over the (lang, doc_id)
    * order), the class-balancing step before training when strata are
    * skewed. Unlike seeded `sampleBy` (RNG, partitioning-dependent)
    * this is reproducible and oracle-exact. Scale note: the
    * per-stratum `row_number` sorts within each stratum — fine for
    * many small strata; for FEW HUGE strata (5 langs × 20 TB) prefer
    * the shuffle-free hash-mod form (q83's shape, applied per
    * stratum) and correct counts in a second pass.
    */
  private def q88StratifiedSample(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("lang")).orderBy(col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("lang"),
        row_number().over(w).cast("long").as("rn"))
      .filter(pmod(col("rn"), lit(5)) === 1)
      .orderBy(col("doc_id"))
  }

  private val q88Sql =
    """SELECT doc_id, lang, rn FROM (
         SELECT doc_id, lang,
           CAST(row_number() OVER
             (PARTITION BY lang ORDER BY doc_id) AS BIGINT) AS rn
         FROM documents)
       WHERE rn % 5 = 1 ORDER BY doc_id"""

  /** q57: dynamic crosstab (hw2/BDM_hw2_final.py:248 `df.stat.crosstab`
    * over a DISCOVERED column set — unlike q8's static pivot list, the
    * output schema here comes from the data). Distinct-value discovery
    * is a tiny aggregate; at scale you'd bound the discovered set the
    * same way crosstab itself does (it errors past 10k values).
    */
  private def q57DynamicCrosstab(s: SparkSession, d: String): DataFrame = {
    val ct = docs(s, d).stat.crosstab("source", "lang")
    ct.orderBy(col(ct.columns.head))
  }

  /** q93: SUBWORD token stats — the token counts an LLM pipeline
    * actually budgets with (words over-count CJK-free prose, chars
    * over-count English; subwords are the pricing unit). Encoding is
    * the static pretrained merge list ([[SubwordOps.staticMerges]])
    * replayed as per-row `replace` chains — shuffle-free, codegen'd,
    * and the oracle SQL is GENERATED from the same merge list so the
    * two sides cannot drift. Chained projections keep the non-cheap
    * token arrays single-evaluation (HOF lambdas get no CSE).
    */
  private def q93SubwordTokens(s: SparkSession, d: String): DataFrame =
    docs(s, d)
      .select(col("doc_id"), toks.as("wtoks"))
      .select(col("doc_id"), col("wtoks"),
        SubwordOps.encodeAll(col("wtoks"), SubwordOps.staticMerges)
          .as("sw"))
      .select(col("doc_id"),
        size(col("wtoks")).cast("long").as("n_words"),
        size(col("sw")).cast("long").as("n_subwords"),
        when(size(col("wtoks")) > 0,
          size(col("sw")).cast("double") / size(col("wtoks")))
          .as("subwords_per_word"),
        concat_ws(" ", slice(col("sw"), 1, 12)).as("sample"))
      .orderBy(col("doc_id"))

  private val q93Sql = {
    val enc = SubwordOps.encodeAllSql("wtoks", SubwordOps.staticMerges)
    s"""WITH b AS (SELECT doc_id, $toksSql AS wtoks FROM documents),
       e AS (SELECT doc_id, wtoks, $enc AS sw FROM b)
       SELECT doc_id, CAST(len(wtoks) AS BIGINT) AS n_words,
         CAST(len(sw) AS BIGINT) AS n_subwords,
         CASE WHEN len(wtoks) > 0
           THEN CAST(len(sw) AS DOUBLE) / len(wtoks) END
           AS subwords_per_word,
         array_to_string(sw[1:12], ' ') AS sample
       FROM e ORDER BY doc_id"""
  }

  /** q94: batch packing budgeted in SUBWORD tokens — q84's twin with
    * the unit swapped to the one that actually drives padding waste
    * and step cost in training. Same scale shape: static length
    * buckets (no global window), per-bucket row_number windows
    * distribute across buckets.
    */
  private def q94SubwordPacking(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nSub = size(
      SubwordOps.subwordTokens(col("text"), SubwordOps.staticMerges))
      .cast("long")
    val bucketed = docs(s, d)
      .select(col("doc_id"), nSub.as("n_subwords"))
      .select(col("doc_id"), col("n_subwords"),
        least((col("n_subwords") / 32L).cast("long"), lit(7L)).as("bucket"))
    val w = Window.partitionBy(col("bucket"))
      .orderBy(col("n_subwords"), col("doc_id"))
    bucketed
      .select(col("bucket"), col("n_subwords"),
        ((row_number().over(w) - 1) / 8).cast("long").as("batch_id"))
      .groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        min(col("n_subwords")).as("min_subwords"),
        max(col("n_subwords")).as("max_subwords"))
      .orderBy(col("bucket"), col("batch_id"))
  }

  private val q94Sql = {
    val enc = SubwordOps.encodeAllSql(toksSql, SubwordOps.staticMerges)
    s"""WITH b AS (SELECT doc_id,
           CAST(len($enc) AS BIGINT) AS n_subwords
         FROM documents),
       k AS (SELECT doc_id, n_subwords,
           least(n_subwords // 32, 7) AS bucket FROM b),
       packed AS (SELECT bucket, n_subwords,
           CAST((row_number() OVER
             (PARTITION BY bucket ORDER BY n_subwords, doc_id) - 1) // 8
             AS BIGINT) AS batch_id
         FROM k)
       SELECT bucket, batch_id, CAST(COUNT(*) AS BIGINT) AS n_docs,
         MIN(n_subwords) AS min_subwords, MAX(n_subwords) AS max_subwords
       FROM packed GROUP BY bucket, batch_id
       ORDER BY bucket, batch_id"""
  }

  /** The mirror must discover its column set from the data exactly like
    * `stat.crosstab` does — a hardcoded lang list would silently
    * narrow (or break) on any fixture whose languages differ. DuckDB's
    * PIVOT does precisely that: one column per distinct `lang` value,
    * zero-filled counts.
    */
  private val q57Sql =
    """WITH t AS (SELECT source AS source_lang, lang FROM documents)
       SELECT * FROM (PIVOT t ON lang USING count(*) GROUP BY source_lang)
       ORDER BY source_lang"""

  /** q154: Unicode canonicalization at ingest — the step that makes
    * every downstream content hash (exact dedup q26, MinHash q27,
    * fingerprints q25) byte-canonical. The corpus is synthetic ASCII,
    * so the query first DECOMPOSES it (every `e` → `e` + U+0301
    * combining acute — the crawl-reality mixed encoding), then runs the
    * native [[graft.plans.NfcNormalizeExpr]] (`graft_nfc`); NFC must
    * recompose to precomposed `é`, so n_nfc == n_raw while the
    * decomposed length is larger, and the md5 of the normalized text is
    * hash-checked against DuckDB's `nfc_normalize`. Per-row, shuffle-
    * free, fused with the scan.
    */
  private def q154NfcNormalize(s: SparkSession, d: String): DataFrame = {
    val dec = regexp_replace(col("text"), "e", "e\u0301")
    docs(s, d)
      .select(col("doc_id"), col("text"), dec.as("dec"))
      .select(col("doc_id"), col("text"), col("dec"),
        expr("graft_nfc(dec)").as("nrm"))
      .select(col("doc_id"),
        length(col("text")).cast("long").as("n_raw"),
        length(col("dec")).cast("long").as("n_decomposed"),
        length(col("nrm")).cast("long").as("n_nfc"),
        md5(col("nrm").cast("binary")).as("nfc_md5"))
      .orderBy(col("doc_id"))
  }

  private val q154Sql =
    """WITH d AS (SELECT doc_id, text,
             regexp_replace(text, 'e', 'e' || chr(769), 'g') AS dec
           FROM documents),
       n AS (SELECT doc_id, text, dec, nfc_normalize(dec) AS nrm FROM d)
       SELECT doc_id,
              CAST(length(text) AS BIGINT) AS n_raw,
              CAST(length(dec) AS BIGINT) AS n_decomposed,
              CAST(length(nrm) AS BIGINT) AS n_nfc,
              md5(nrm) AS nfc_md5
       FROM n ORDER BY doc_id"""

  /** q163: quality-weighted Bernoulli sample — each doc admitted
    * independently with probability proportional to its (shared,
    * audited) quality score, the way corpus-mixture builders
    * up-sample high-quality sources without a global sort or
    * cumulative-weight pass. Randomness is the deterministic 60-bit
    * md5 hash (run/engine/ingest-order stable, like q83's split), the
    * admission test is pure integer math — u·2·wmax < w·2^52 with
    * weight w = ⌊quality·10⌋+1 ∈ [1,11] and u uniform on 2^52 — so
    * the expected rate is w/22 and the decision can never drift on a
    * float boundary. Per-row, shuffle-free, linear at any scale; the
    * weighted twin of q17 (uniform), q83 (splits), q88 (stratified).
    */
  private def q163WeightedSample(s: SparkSession, d: String): DataFrame = {
    val u52 = pmod(TextOps.tokenHash(
      concat(lit("wsamp:"), col("doc_id").cast("string"))), lit(1L << 52))
    docs(s, d)
      .select(col("doc_id"), col("source"),
        (floor(TextOps.qualityScore(toks) * 10) + 1L).cast("long")
          .as("weight"),
        u52.as("u52"))
      .filter(col("u52") * 22L < col("weight") * lit(1L << 52))
      .select(col("doc_id"), col("source"), col("weight"))
      .orderBy(col("doc_id"))
  }

  private val q163Sql = {
    val hash = TextOps.tokenHashSql("('wsamp:' || CAST(doc_id AS VARCHAR))")
    val w = s"CAST(FLOOR(${TextOps.qualityScoreSql(toksSql)} * 10) + 1" +
      " AS BIGINT)"
    s"""SELECT doc_id, source, $w AS weight
       FROM documents
       WHERE ($hash % 4503599627370496) * 22 < $w * 4503599627370496
       ORDER BY doc_id"""
  }

  /** q172: deterministic exact-k per-group sample — exactly 5 docs
    * per source, chosen by md5-hash rank (a random oracle, so the
    * draw is uniform-without-replacement) with doc_id tie-break.
    * Unlike q88's every-5th systematic draw this guarantees EXACT k
    * per group whatever the group sizes — the "show me 5 examples
    * from every source" sampler dataset cards need. rank<=k over a
    * hash-ordered window plans as WindowGroupLimit: each mapper
    * pre-limits its groups before the shuffle, so the cost at 100 TB
    * is a scan + one bounded shuffle, never a global sort.
    */
  private def q172ReservoirPerSource(
      s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val h = TextOps.tokenHash(
      concat(lit("rsv:"), col("doc_id").cast("string")))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("h"), col("doc_id"))
    docs(s, d)
      .select(col("doc_id"), col("source"), h.as("h"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 5)
      .select(col("source"), col("rn"), col("doc_id"))
      .orderBy(col("source"), col("rn"))
  }

  private val q172Sql = {
    val hash = TextOps.tokenHashSql("('rsv:' || CAST(doc_id AS VARCHAR))")
    s"""SELECT source, rn, doc_id FROM (
         SELECT source, doc_id,
                ROW_NUMBER() OVER (PARTITION BY source
                  ORDER BY $hash, doc_id) AS rn
         FROM documents)
       WHERE rn <= 5 ORDER BY source, rn"""
  }

  override val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q154_nfc_normalize" -> q154NfcNormalize,
    "q57_dynamic_crosstab" -> q57DynamicCrosstab,
    "q74_remove_others" -> q74RemoveOthers,
    "q83_hash_split" -> q83HashSplit,
    "q84_length_buckets" -> q84LengthBuckets,
    "q88_stratified_sample" -> q88StratifiedSample,
    "q163_weighted_sample" -> q163WeightedSample,
    "q172_reservoir_per_source" -> q172ReservoirPerSource,
    "q90_repetition" -> q90Repetition,
    "q93_subword_tokens" -> q93SubwordTokens,
    "q94_subword_packing" -> q94SubwordPacking,
    "q19_word_counts_nostop" -> q19WordCountsNostop,
    "q71_cooccurrence" -> q71Cooccurrence,
    "q118_frequent_tokens" -> q118FrequentTokens,
    "q119_cooccurrence_triangles" -> q119CooccurrenceTriangles,
    "q20_word_counts" -> q20WordCounts,
    "q21_top_words_per_lang" -> q21TopWordsPerLang,
    "q22_token_stats" -> q22TokenStats,
    "q23_quality_score" -> q23QualityScore,
    "q24_langid_confusion" -> q24LangIdConfusion,
    "q25_fingerprint" -> q25Fingerprint,
    "q26_exact_dedup" -> q26ExactDedup,
    "q70_reference_clean" -> q70ReferenceClean)

  override val oracle: Map[String, String] = Map(
    "q57_dynamic_crosstab" -> q57Sql,
    "q74_remove_others" -> q74Sql,
    "q83_hash_split" -> q83Sql,
    "q84_length_buckets" -> q84Sql,
    "q88_stratified_sample" -> q88Sql,
    "q163_weighted_sample" -> q163Sql,
    "q172_reservoir_per_source" -> q172Sql,
    "q90_repetition" -> q90Sql,
    "q93_subword_tokens" -> q93Sql,
    "q94_subword_packing" -> q94Sql,
    "q19_word_counts_nostop" -> q19Sql,
    "q20_word_counts" -> q20Sql,
    "q154_nfc_normalize" -> q154Sql,
    "q21_top_words_per_lang" -> q21Sql,
    "q22_token_stats" -> q22Sql,
    "q23_quality_score" -> q23Sql,
    "q24_langid_confusion" -> q24Sql,
    "q25_fingerprint" -> q25Sql,
    "q26_exact_dedup" -> q26Sql,
    "q70_reference_clean" -> q70Sql,
    "q71_cooccurrence" -> q71Sql,
    "q118_frequent_tokens" -> q118Sql,
    "q119_cooccurrence_triangles" -> q119Sql)
}
