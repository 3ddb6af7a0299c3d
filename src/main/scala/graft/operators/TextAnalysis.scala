package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token statistics,
  * quality scoring, language identification, and content fingerprints.
  * All pure column algebra (codegen'd, UDF-free); the only aggregations
  * are the profile-training group-bys, which shuffle on (lang, ngram) —
  * fine at any scale. */
object TextAnalysis {

  def tokens(text: Column): Column = split(text, "\\s+")

  def tokenCount(text: Column): Column = size(tokens(text))

  def distinctTokenRatio(text: Column): Column = {
    val t = tokens(text)
    size(array_distinct(t)).cast("double") / size(t)
  }

  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val t = tokens(text)
    // native one-pass set probe; the equivalent size(filter(t, isin))
    // interprets a CodegenFallback lambda per token
    graft.functions.CountInSet.countInSet(t, stopwords).cast("double") / size(t)
  }

  /** Fraction of characters that are not alphanumeric/space. Native
    * one-pass count — the equivalent length − length(regexp_replace)
    * runs the regex engine and allocates the stripped copy per doc. */
  def punctRatio(text: Column): Column =
    graft.functions.PunctCount.punctCount(text).cast("double") / length(text)

  /** Composite quality score in [0,1]: reward length (saturating at
    * `fullLengthTokens`), lexical diversity, low stopword share, low
    * punctuation noise. */
  def qualityScore(text: Column, stopwords: Seq[String],
      fullLengthTokens: Int = 100): Column =
    lit(0.25) * least(tokenCount(text).cast("double") / fullLengthTokens, lit(1.0)) +
      lit(0.25) * distinctTokenRatio(text) +
      lit(0.25) * (lit(1.0) - stopwordRatio(text, stopwords)) +
      lit(0.25) * (lit(1.0) - punctRatio(text))

  /** Stopword-marker language ID: per language, count marker words present
    * in the token set; argmax with deterministic lexicographic tie-break.
    * (The oracle-checkable variant; see [[ngramLangId]] for the n-gram
    * profile classifier.) */
  def stopwordLangId(text: Column, markers: Map[String, Seq[String]]): Column = {
    val t = array_distinct(tokens(text))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(array_intersect(t, array(words.map(lit): _*))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on (score, lang) structs: max score, then max lang — invert
    // the lang ordering is not needed for a deterministic gate as long as
    // both engines break ties the same way; the oracle replicates this.
    array_max(array(scored: _*)).getField("lang")
  }

  /** Character n-grams of the lowercased text (spaces collapsed),
    * computed by the native [[graft.functions.CharNgramsExpr]] — one
    * offset-table pass per document instead of the O(len²) interpreted
    * `transform(sequence(...), i => substr(i, n))` chain. */
  def charNgrams(text: Column, n: Int): Column = {
    val clean = regexp_replace(lower(text), "\\s+", " ")
    graft.functions.CharNgrams.charNgrams(clean, n)
  }

  /** Train per-language character-n-gram profiles: top `profileSize`
    * n-grams by frequency per language. Distributed: explode → count →
    * rank window; the collected profiles are tiny (langs × profileSize). */
  def trainNgramProfiles(df: DataFrame, langCol: String, textCol: String,
      n: Int = 3, profileSize: Int = 30): Map[String, Seq[String]] = {
    import org.apache.spark.sql.expressions.Window
    df.select(col(langCol).as("lang"), explode(charNgrams(col(textCol), n)).as("ng"))
      .groupBy("lang", "ng").agg(count(lit(1)).as("cnt"))
      .withColumn("rank", row_number().over(
        Window.partitionBy("lang").orderBy(desc("cnt"), asc("ng"))))
      .filter(col("rank") <= profileSize)
      .orderBy("lang", "rank")
      .collect()
      .groupBy(_.getString(0))
      .map { case (l, rows) => l -> rows.map(_.getString(1)).toSeq }
  }

  /** n-gram-profile language ID: score = number of profile n-grams present
    * in the text; argmax (ties to the lexicographically greatest language,
    * deterministically). Profiles are literal arrays → broadcast-free,
    * fully codegen'd presence tests. */
  def ngramLangId(text: Column, profiles: Map[String, Seq[String]], n: Int = 3): Column = {
    val clean = regexp_replace(lower(text), "\\s+", " ")
    val scored = profiles.toSeq.sortBy(_._1).map { case (lang, ngrams) =>
      val score = ngrams.map(g => when(clean.contains(g), 1).otherwise(0))
        .reduce[Column](_ + _)
      struct(score.as("score"), lit(lang).as("lang"))
    }
    array_max(array(scored: _*)).getField("lang")
  }

  /** Polynomial rolling-hash fingerprint of the normalized text:
    * fold over codepoints of acc·31 + code (mod 2^61-1), computed by the
    * native [[graft.functions.RollingHashExpr]] — one byte pass instead
    * of the interpreted per-char `aggregate(split(s, ""), ...)` fold.
    * Collisions are ~n²/2^61; for exact-dedup gate use
    * [[Dedup.fingerprint]] (md5). */
  def rollingFingerprint(text: Column): Column =
    graft.functions.RollingHash.rollingHash(
      regexp_replace(lower(text), "\\s+", " "))
}
