package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Character-exact ports of the reference's Python text-cleaning UDFs
  * (SURVEY §2.9 D1/D8, §7.4 risk 1: "port character-for-character;
  * golden-test tokens, not just counts") — as native expressions, so
  * the per-row JVM↔Python round-trip and codegen barrier disappear but
  * the *token stream is identical*.
  *
  * Semantics sources (studied, not copied):
  *  - `lower_clean_str` (hw2/BDM_hw2_final.py:54-60): lowercase, then
  *    DELETE (not blank out) every char of a 34-char punctuation list
  *    that includes unicode quotes/dashes/ellipsis.
  *  - `preprocess_text` (FinalProject/BDM_Final.py:93-120): lower →
  *    strip HTML tags → non-letters→space → single-char-token removal
  *    (left-to-right, non-overlapping — Java regexp_replace matches
  *    Python re.sub exactly here) → collapse spaces → split → drop
  *    NLTK stopwords → rejoin.
  */
object ReferenceTextOps {

  /** hw2:55 punctuation list, verbatim (the `\\` in the Python literal
    * is one backslash).
    */
  val punc: String = "!\"#”$%&'()*+—–,./:;<=>?@[\\]^_’‘`{|}~-…"

  /** NLTK `stopwords.words('english')` — the reference downloads this
    * at runtime (FinalProject/BDM_Final.py:58-59); embedded as a fixed
    * lexicon so the engine is dependency-free and deterministic. (The
    * reference also appends " ", which can never match a token and is
    * therefore omitted.)
    */
  val nltkStopwords: Seq[String] = Seq(
    "i", "me", "my", "myself", "we", "our", "ours", "ourselves", "you",
    "you're", "you've", "you'll", "you'd", "your", "yours", "yourself",
    "yourselves", "he", "him", "his", "himself", "she", "she's", "her",
    "hers", "herself", "it", "it's", "its", "itself", "they", "them",
    "their", "theirs", "themselves", "what", "which", "who", "whom",
    "this", "that", "that'll", "these", "those", "am", "is", "are",
    "was", "were", "be", "been", "being", "have", "has", "had",
    "having", "do", "does", "did", "doing", "a", "an", "the", "and",
    "but", "if", "or", "because", "as", "until", "while", "of", "at",
    "by", "for", "with", "about", "against", "between", "into",
    "through", "during", "before", "after", "above", "below", "to",
    "from", "up", "down", "in", "out", "on", "off", "over", "under",
    "again", "further", "then", "once", "here", "there", "when",
    "where", "why", "how", "all", "any", "both", "each", "few", "more",
    "most", "other", "some", "such", "no", "nor", "not", "only", "own",
    "same", "so", "than", "too", "very", "s", "t", "can", "will",
    "just", "don", "don't", "should", "should've", "now", "d", "ll",
    "m", "o", "re", "ve", "y", "ain", "aren", "aren't", "couldn",
    "couldn't", "didn", "didn't", "doesn", "doesn't", "hadn", "hadn't",
    "hasn", "hasn't", "haven", "haven't", "isn", "isn't", "ma",
    "mightn", "mightn't", "mustn", "mustn't", "needn", "needn't",
    "shan", "shan't", "shouldn", "shouldn't", "wasn", "wasn't",
    "weren", "weren't", "won", "won't", "wouldn", "wouldn't")

  /** D1: `lower_clean_str` — `translate` with an empty replacement
    * deletes every listed char, exactly like the Python
    * `str.replace(ch, '')` loop (order-independent since deletions
    * don't interact).
    */
  def lowerCleanStr(c: Column): Column = translate(lower(c), punc, "")

  def lowerCleanStrSql(x: String): String = {
    // single-quote SQL literal: '' escapes '
    val lit = punc.replace("'", "''")
    s"translate(lower($x), '$lit', '')"
  }

  /** hw2:227 `remove_others` punctuation list — note it differs from
    * [[punc]]: it INCLUDES the space character (tokens are produced by
    * punctuation-to-comma substitution, so space must become a
    * delimiter) and EXCLUDES the comma (it *is* the delimiter).
    */
  val removeOthersPunc: String = "!\"#”$%&'()*+—–./:;<=>?@[\\]^_’ ‘`{|}~-…"

  /** The `remove_others` tokenizer: lowercase, map every listed char
    * to ',', split on ','. (Empty tokens appear between consecutive
    * delimiters, exactly as in the Python `split(',')`.)
    */
  def removeOthersTokens(c: Column): Column = {
    val commas = ",".repeat(removeOthersPunc.length)
    split(translate(lower(c), removeOthersPunc, commas), ",")
  }

  def removeOthersTokensSql(x: String): String = {
    val lit = removeOthersPunc.replace("'", "''")
    val commas = ",".repeat(removeOthersPunc.length)
    s"string_split(translate(lower($x), '$lit', '$commas'), ',')"
  }

  /** D2: `remove_others` — lowercase, map every listed char to ',',
    * split on ',', keep tokens ∈ vocab (duplicates and order
    * preserved), sentinel `"No Values"` when none survive, re-join
    * with ','. The reference read the vocab from a mutable driver
    * global (hw2/BDM_hw2_final.py:222-240); here it's a plan literal
    * (broadcast-compiled), no driver state.
    */
  def removeOthers(c: Column, vocab: Seq[String]): Column = {
    val kept = filter(removeOthersTokens(c), w => w.isInCollection(vocab))
    array_join(
      when(size(kept) === 0, array(lit("No Values"))).otherwise(kept), ",")
  }

  /** `remove_tags`: strip `<[^>]+>`. */
  def removeTags(c: Column): Column = regexp_replace(c, "<[^>]+>", "")

  /** D8: `preprocess_text` — the full pipeline, tokens as an array
    * (the reference rejoins with spaces; see [[preprocessText]]).
    */
  def preprocessTokens(c: Column): Column = {
    val lowered = removeTags(lower(coalesce(c, lit(""))))
    val lettersOnly = regexp_replace(lowered, "[^a-zA-Z]", " ")
    val noSingles = regexp_replace(lettersOnly, "\\s+[a-zA-Z]\\s+", " ")
    val collapsed = regexp_replace(noSingles, "\\s+", " ")
    filter(split(trim(collapsed), " "),
      w => w =!= "" && !w.isInCollection(nltkStopwords))
  }

  /** D8 with the reference's final join-by-space. */
  def preprocessText(c: Column): Column =
    array_join(preprocessTokens(c), " ")

  def preprocessTokensSql(x: String): String = {
    val stops = nltkStopwords.map(w => "'" + w.replace("'", "''") + "'")
      .mkString(", ")
    s"""list_filter(
        string_split(trim(regexp_replace(regexp_replace(regexp_replace(
          regexp_replace(lower(coalesce($x, '')), '<[^>]+>', '', 'g'),
          '[^a-zA-Z]', ' ', 'g'),
          '\\s+[a-zA-Z]\\s+', ' ', 'g'),
          '\\s+', ' ', 'g')), ' '),
        w -> w <> '' AND w NOT IN ($stops))"""
  }
}
