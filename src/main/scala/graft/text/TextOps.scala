package graft.text

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Training-data text operators: deduplication (exact, MinHash-LSH,
  * SimHash, n-gram Jaccard), language-ID, quality scoring, token counting,
  * fingerprinting. These are the 100-TB pipeline extensions mandated by the
  * build brief — not reference-derived — expressed as pure column pipelines
  * (no UDFs: everything stays in whole-stage codegen).
  *
  * Portability contract: every hash here is built from `md5` (identical
  * lowercase-hex output in Spark and DuckDB) so the same document always
  * produces the same signature in engine and oracle.
  */
object TextOps {

  /** Whitespace word array. */
  def words(text: Column): Column = split(text, " ")

  /** Word k-shingles as strings ("a b c" for k=3). Guarded: Spark's
    * sequence(1, 0) counts DOWN (gives [1,0]) where DuckDB's
    * generate_series(1, 0) is empty, so short texts return array() here. */
  def shingles(text: Column, k: Int = 3): Column =
    when(size(words(text)) >= k,
      transform(sequence(lit(1), size(words(text)) - (k - 1)),
        i => concat_ws(" ", slice(words(text), i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  /** k-shingles from an ALREADY-SPLIT token array attribute. Use this when
    * the caller materializes `words(text)` once: `shingles(text, k)`
    * re-evaluates the split per element inside its transform lambda, which
    * is O(tokens) splits of the full text per row — measured 2× the whole
    * query cost in x_repetition before the rewrite. */
  def shinglesOf(w: Column, k: Int): Column =
    when(size(w) >= k,
      transform(sequence(lit(1), size(w) - (k - 1)),
        i => concat_ws(" ", slice(w, i, lit(k)))))
      .otherwise(array().cast("array<string>"))

  def shinglesSql(textExpr: String, k: Int = 3): String =
    s"""list_transform(
        generate_series(1, greatest(len(string_split($textExpr, ' ')) - ${k - 1}, 0)),
        i -> array_to_string(string_split($textExpr, ' ')[i:i+${k - 1}], ' '))"""

  /** MinHash signature column j: lexicographic string-min of the j-th
    * 4-hex-char slice of ONE md5 per shingle. The 8 slices act as 8
    * independent 16-bit hash functions at 1/8th the hashing cost of
    * salting md5 eight times — the right trade at 100-TB document counts,
    * where the md5 pass dominates the signature stage. */
  def minhashAgg(j: Int): Column =
    min(substring(md5(col("sh")), 4 * j + 1, 4)).as(s"mh$j")

  def minhashAggSql(j: Int): String =
    s"min(substr(md5(sh), ${4 * j + 1}, 4)) AS mh$j"

  /** SimHash over 16 hex positions of per-word md5: position p's bit is the
    * sign of Σ_words (hexdigit_p − 7.5). Returns a 16-bit value. */
  def simhashFromSums(sums: Seq[Column]): Column =
    sums.zipWithIndex.map { case (s, p) =>
      when(s > 0.0, lit(1L << p)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Per-word contribution for hex position p (1-based). */
  def hexDigit(wordMd5: Column, p: Int): Column =
    expr(s"instr('0123456789abcdef', substr(${colName(wordMd5)}, $p, 1))") - 1

  private def colName(c: Column): String = c.toString

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Quality metrics: word count, mean word length, stopword ratio,
    * vowel ratio, and a combined [0,1] score. */
  def qualityCols(text: Column, nChars: Column): Seq[Column] = {
    val w = words(text)
    val nw = size(w)
    val meanLen = (nChars - (nw - 1)).cast("double") / nw
    val stopRatio = size(filter(w, x =>
      array_contains(array(stopwords.map(lit): _*), x))).cast("double") / nw
    val vowels = length(regexp_replace(text, "[^aeiou]", ""))
    val vowelRatio = vowels.cast("double") / nChars
    // n_words is long: DuckDB len(list) is BIGINT, Spark size() is INT
    Seq(nw.cast("long").as("n_words"), meanLen.as("mean_word_len"),
      stopRatio.as("stopword_ratio"), vowelRatio.as("vowel_ratio"),
      (stopRatio * 0.4 + vowelRatio * 0.4 +
        when(meanLen.between(3.0, 8.0), 0.2).otherwise(0.0)).as("quality_score"))
  }

  def qualitySql(textExpr: String, nCharsExpr: String): String = {
    val w = s"string_split($textExpr, ' ')"
    val nw = s"len($w)"
    val meanLen = s"(CAST($nCharsExpr - ($nw - 1) AS DOUBLE) / $nw)"
    val stop = stopwords.map(s => s"'$s'").mkString("[", ", ", "]")
    val stopRatio = s"(CAST(len(list_filter($w, x -> list_contains($stop, x))) AS DOUBLE) / $nw)"
    val vowelRatio = s"(CAST(length(regexp_replace($textExpr, '[^aeiou]', '', 'g')) AS DOUBLE) / $nCharsExpr)"
    s"""$nw AS n_words, $meanLen AS mean_word_len,
        $stopRatio AS stopword_ratio, $vowelRatio AS vowel_ratio,
        ($stopRatio * 0.4 + $vowelRatio * 0.4 +
         (CASE WHEN $meanLen BETWEEN 3.0 AND 8.0 THEN 0.2 ELSE 0.0 END)) AS quality_score"""
  }
}
