package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column-level text helpers shared by the wordcount (reference D1,
  * `/root/reference/examples/word_count/word_count.go:14-27`) and the
  * text-analysis extension queries. All are pure `functions._`
  * compositions → whole-stage-codegen'd, no UDFs.
  */
object TextFunctions {

  /** Lowercase, strip non-alphanumerics to spaces, split on whitespace —
    * the reference's tokenizer regex semantics (word_count.go:18-22). */
  def tokens(text: Column): Column =
    split(lower(regexp_replace(text, "[^a-zA-Z0-9\\s]+", " ")), "\\s+")

  /** Whitespace token count; 0 for blank text. */
  def tokenCount(text: Column): Column =
    when(trim(text) === "", lit(0))
      .otherwise(size(split(trim(text), "\\s+")))

  /** Number of non-overlapping occurrences of `needle` in `text`, via the
    * portable length-difference trick (identical in DuckDB). */
  def countOccurrences(text: Column, needle: String): Column =
    ((length(text) - length(replace(text, lit(needle), lit("")))) / needle.length)
      .cast("int")

  /** Ratio of alphabetic chars to total chars (0.0 for empty text). */
  def alphaRatio(text: Column): Column =
    when(length(text) === 0, lit(0.0))
      .otherwise(length(regexp_replace(text, "[^a-zA-Z]", "")).cast("double") /
        length(text))

  /** Document fingerprint: md5 of the whitespace-normalized, lowercased
    * text. Stable across engines (md5 hex is portable, unlike hash()). */
  def fingerprint(text: Column): Column =
    md5(regexp_replace(lower(trim(text)), "\\s+", " ").cast("binary"))

  /** Distinct 3-token shingles (n-gram set for Jaccard/MinHash dedup).
    * Empty array for texts shorter than 3 tokens. */
  def shingles3(text: Column): Column = {
    val toks = split(trim(text), "\\s+")
    array_distinct(
      when(size(toks) >= 3,
        transform(sequence(lit(1), size(toks) - 2), i =>
          concat_ws(" ",
            element_at(toks, i),
            element_at(toks, i + 1),
            element_at(toks, i + 2))))
        .otherwise(array().cast("array<string>")))
  }

  /** DuckDB fragment for the identical distinct-3-shingle set. */
  val shingles3Sql: String =
    """list_distinct(CASE WHEN len(toks) >= 3
      |      THEN list_transform(range(1, len(toks)-1),
      |             i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |      ELSE [] END)""".stripMargin

  /** All word n-grams (with multiplicity, document order) of the
    * whitespace tokenization; empty array for texts shorter than n
    * tokens. Row-local array math — no explode, no shuffle. */
  def wordGrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(1), size(toks) - (n - 1)), i =>
        concat_ws(" ", (0 until n).map(j => element_at(toks, i + j)): _*)))
      .otherwise(array().cast("array<string>"))

  /** DuckDB fragment for the identical n-gram list over a `toks` list
    * expression (DuckDB `range` is end-exclusive; `sequence` above is
    * inclusive — both yield len-n+1 grams). */
  def wordGramsSql(toks: String, n: Int): String = {
    val cat = (0 until n).map(j => s"$toks[i+$j]").mkString(" || ' ' || ")
    s"""CASE WHEN len($toks) >= $n
       |      THEN list_transform(range(1, len($toks) - ${n - 2}), i -> $cat)
       |      ELSE [] END""".stripMargin
  }

  /** Stopword-marker counts per language, for the n-gram-heuristic
    * language-ID (langs in the test corpus: en es fr de zh). */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq(" the ", " and ", " of "),
    "es" -> Seq(" el ", " la ", " que "),
    "fr" -> Seq(" le ", " les ", " des "),
    "de" -> Seq(" der ", " und ", " die "),
    "zh" -> Seq("的", "是", "了"))

  def langScore(text: Column, markers: Seq[String]): Column =
    markers.map(m => countOccurrences(text, m)).reduce(_ + _)
}
