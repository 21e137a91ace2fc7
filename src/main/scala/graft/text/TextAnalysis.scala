package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * All pure Column expressions (whole-stage codegen, no UDFs) — at 100 TB
  * these run embarrassingly parallel inside the scan stage with zero
  * shuffle; only downstream grouping shuffles.
  */
object TextAnalysis {

  /** Whitespace tokens, empties removed (robust to multiple spaces). */
  def tokens(text: Column): Column =
    filter(split(trim(coalesce(text, lit(""))), "\\s+"), t => t =!= "")

  /** Token count (whitespace tokenization). */
  def tokenCount(text: Column): Column = size(tokens(text))

  /** BPE-ish subword proxy: count of alphanumeric runs + punctuation
    * marks (each run and each punct char is one token). */
  def regexTokenCount(text: Column): Column =
    size(regexp_extract_all(coalesce(text, lit("")), lit("[A-Za-z0-9]+|[^A-Za-z0-9\\s]"), lit(0)))

  /** Distinct-token ratio — vocabulary richness in [0,1]. */
  def distinctRatio(text: Column): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(array_distinct(t)).cast("double") / size(t))
  }

  /** Stopword ratio over a fixed small stopword list. */
  def stopwordRatio(text: Column, stop: Seq[String]): Column = {
    val t = tokens(text)
    when(size(t) === 0, lit(0.0))
      .otherwise(size(filter(t, x => x.isin(stop: _*))).cast("double") / size(t))
  }

  /** Composite quality score in [0,1]: rewards mid-length docs, vocab
    * richness and a sane stopword rate. Deterministic, 4dp. */
  def qualityScore(text: Column, nChars: Column, stop: Seq[String]): Column = {
    val lenScore = least(nChars.cast("double") / 500.0, lit(1.0))
    val richness = distinctRatio(text)
    val stopR = stopwordRatio(text, stop)
    val stopScore = lit(1.0) - abs(stopR - lit(0.1)) // ideal ~10% stopwords
    round((lenScore * 0.4 + richness * 0.4 + stopScore * 0.2), 4)
  }

  /** Language ID via marker-vocabulary hit counts: score each language's
    * marker set, predict the argmax (priority order breaks ties).
    * The n-gram-profile method reduced to unigram markers — on the
    * synthetic corpus the vocabularies ARE the distinguishing profile. */
  def langScores(text: Column, markers: Map[String, Seq[String]]): Seq[(String, Column)] = {
    val t = tokens(text)
    markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      lang -> size(filter(t, x => x.isin(words: _*)))
    }
  }

  def langId(text: Column, markers: Map[String, Seq[String]]): Column = {
    val scored = langScores(text, markers)
    // argmax with first-in-order tiebreak: a language wins when its score
    // is >= all later ones and > all earlier ones is not required (priority).
    scored.zipWithIndex.foldRight(lit("und")) { case (((lang, s), i), rest) =>
      val beatsAllLater = scored.drop(i + 1)
        .map { case (_, s2) => s >= s2 }
        .foldLeft(lit(true))(_ && _)
      when(s > 0 && beatsAllLater, lit(lang)).otherwise(rest)
    }
  }

  /** Document fingerprint: md5 of the sorted distinct-token bag — a
    * canonical content hash robust to token order (bag-of-words level). */
  def fingerprint(text: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(text))), " "))

  /** Exact-content fingerprint after whitespace normalization. */
  def normalizedHash(text: Column): Column =
    md5(array_join(tokens(text), " "))
}
