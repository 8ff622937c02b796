package graft.text

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for a training-data pipeline, over the `documents`
  * fixture. All are single-pass, codegen'd column expressions (no UDFs in the
  * hot path) — at 100 TB each is a map-only stage over the parquet scan,
  * no shuffle except the final small aggregations.
  */
object TextAnalysis {

  private val NonLetter = "[^\\p{L}]+"

  /** Non-empty letter tokens of `text` as an array column. */
  def tokensCol(text: Column): Column =
    array_remove(split(text, NonLetter), "")

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** Per-document token statistics (token counting): exact integer counts,
    * ratios as double divisions of those integers (bit-identical across
    * engines). */
  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir)
      .select(col("doc_id"), tokensCol(col("text")).as("toks"), length(col("text")).as("text_len"))
      .select(
        col("doc_id"),
        size(col("toks")).cast("bigint").as("n_tokens"),
        size(array_distinct(col("toks"))).cast("bigint").as("n_distinct"),
        col("text_len").cast("bigint").as("n_chars"),
        (aggregate(transform(col("toks"), t => length(t).cast("bigint")),
          lit(0L), (acc, x) => acc + x).cast("double") / size(col("toks")))
          .as("avg_token_len"))

  /** GPT-2-style pre-tokenizer regex, lookahead-free so the identical
    * pattern runs under both Java regex (Spark) and RE2 (DuckDB oracle):
    * contractions | space?letters | space?digits | space?other | whitespace. */
  val BpeIsh = "'(s|t|re|ve|m|ll|d)| ?[\\p{L}]+| ?[\\p{N}]+| ?[^\\s\\p{L}\\p{N}]+|\\s+"

  /** Token counting, both ways a data pipeline needs it: whitespace tokens
    * and BPE-ish pre-tokenizer segments — one codegen'd map-only pass. */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      size(array_remove(split(col("text"), "\\s+"), "")).cast("bigint").as("n_ws_tokens"),
      size(regexp_extract_all(col("text"), lit(BpeIsh), lit(0))).cast("bigint").as("n_bpe_tokens"))

  /** Quality scoring: stopword ratio, distinct-token ratio, mean token
    * length band — a deterministic heuristic quality score in [0,1]. */
  def qualityScore(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(col("text"))
    val nTok = size(toks).cast("bigint")
    val nStop = size(filter(toks, t => t.isInCollection(stopwords))).cast("bigint")
    val nDist = size(array_distinct(toks)).cast("bigint")
    val stopRatio = nStop.cast("double") / nTok
    val distinctRatio = nDist.cast("double") / nTok
    Tables.documents(spark, dir).select(
      col("doc_id"),
      nTok.as("n_tokens"),
      stopRatio.as("stop_ratio"),
      distinctRatio.as("distinct_ratio"),
      // score: reward some stopwords (natural text) and lexical diversity,
      // penalize very short docs. Pure arithmetic on the two ratios.
      (when(nTok < 10, 0.0).otherwise(1.0) *
        (lit(0.5) * when(stopRatio > 0.03, 1.0).otherwise(stopRatio * 10.0) +
         lit(0.5) * distinctRatio)).as("quality_score"))
  }

  /** Language-ID heuristic: marker-word hit counts per language, argmax with
    * deterministic alphabetical tie-break (de < en < es < fr < zh). */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val toks = tokensCol(lower(col("text")))
    def score(markers: Seq[String]): Column =
      size(filter(toks, t => t.isInCollection(markers))).cast("bigint")
    val sDe = score(Seq("der", "und", "die", "das"))
    val sEn = score(Seq("the", "a", "of", "and"))
    val sEs = score(Seq("el", "la", "los", "de"))
    val sFr = score(Seq("le", "les", "une", "est"))
    val sZh = score(Seq("zh"))
    Tables.documents(spark, dir).select(
      col("doc_id"), col("lang").as("lang_declared"),
      sDe.as("s_de"), sEn.as("s_en"), sEs.as("s_es"), sFr.as("s_fr"), sZh.as("s_zh"),
      when(sDe >= sEn && sDe >= sEs && sDe >= sFr && sDe >= sZh, "de")
        .when(sEn >= sEs && sEn >= sFr && sEn >= sZh, "en")
        .when(sEs >= sFr && sEs >= sZh, "es")
        .when(sFr >= sZh, "fr")
        .otherwise("zh").as("lang_pred"))
  }

  /** Document fingerprint: md5 of the canonical form (lowercased, distinct
    * tokens, sorted, space-joined) — an order-insensitive content hash for
    * cross-corpus dedup joins. A Karp-Rabin rolling-hash variant lives in
    * [[graft.dedup.Dedup.shingleFingerprints]]. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      md5(array_join(array_sort(array_distinct(tokensCol(lower(col("text"))))), " "))
        .as("fp"))
}
