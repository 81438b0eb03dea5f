package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline, run
  * against the `documents` fixture. Every operator here is a narrow,
  * codegen'd projection (no UDFs, no shuffles) — at 100 TB these run at
  * parquet-scan speed and column-prune down to `text`.
  */
object TextAnalysis {

  /** Lowercase alnum tokens; mirrors in DuckDB as
    * list_filter(regexp_split_to_array(lower(x),'[^a-z0-9]+'), t -> t <> ''). */
  def tokens(c: Column): Column =
    filter(split(lower(c), "[^a-z0-9]+"), t => t =!= "")

  /** Whitespace token count plus a BPE-ish sub-token count (letter runs,
    * single digits, single punctuation marks — a cheap proxy for BPE token
    * pressure). */
  def tokenCounts(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(col("doc_id"),
      size(filter(split(t, "\\s+"), x => x =!= "")).as("ws_tokens"),
      size(tokens(t)).as("alnum_tokens"),
      size(regexp_extract_all(lower(t), lit("[a-z]+|[0-9]|[^a-z0-9\\s]"), lit(0)))
        .as("bpeish_tokens"))
  }

  /** Quality-scoring signals: length, alphabetic/punctuation/whitespace
    * ratios, mean word length, stop-word ratio — the standard cheap filters
    * applied before expensive pipeline stages. */
  def qualityScore(df: DataFrame, textCol: String = "text",
                   stopWords: Seq[String] = LangId.markers("en")): DataFrame = {
    val t = col(textCol)
    val n = length(t).cast("double")
    val toks = tokens(t)
    val alpha = length(regexp_replace(t, "[^A-Za-z]", "")).cast("double")
    val punct = length(regexp_replace(t, "[^.,;:!?'\"()-]", "")).cast("double")
    val stops = size(filter(toks, x => x.isin(stopWords: _*)))
    df.select(
      col("doc_id"),
      n.as("n_chars"),
      round(alpha / greatest(n, lit(1.0)), 6).as("alpha_ratio"),
      round(punct / greatest(n, lit(1.0)), 6).as("punct_ratio"),
      round(stops.cast("double") / greatest(size(toks), lit(1)).cast("double"), 6)
        .as("stopword_ratio"),
      round(alpha / greatest(size(toks), lit(1)).cast("double"), 6).as("mean_word_len"))
  }

  /** Document fingerprint: polynomial rolling hash of the character stream
    * (base 31 mod 1e9+7), engine-independent — usable as a cheap exact-dup
    * key that survives reformatting of the container file. */
  def fingerprint(c: Column): Column =
    aggregate(
      filter(split(c, ""), ch => ch =!= ""),
      lit(0L),
      (acc, ch) => pmod(acc * lit(31L) + ascii(ch).cast("long"), lit(1000000007L)))
}

/** Language identification via marker-word overlap — an n-gram/stopword
  * heuristic over the highest-frequency function words of each candidate
  * language. Pure SQL (array intersections against literal lists), so it is
  * both oracle-checkable and shuffle-free.
  */
object LangId {
  val markers: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with", "was", "on"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "eine", "mit", "von", "zu", "den"),
    "fr" -> Seq("le", "la", "les", "et", "est", "une", "dans", "que", "pour", "des", "du", "pas"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "una", "en", "que", "por", "con", "para"),
    "it" -> Seq("il", "la", "che", "e", "di", "un", "una", "per", "non", "sono", "con", "del"))

  /** Predict language as the marker set with the highest hit count;
    * deterministic tie-break on language code order. */
  def predict(df: DataFrame, textCol: String = "text"): DataFrame = {
    val toks = TextAnalysis.tokens(col(textCol))
    val scored = markers.toSeq.sortBy(_._1).map { case (lang, words) =>
      struct(size(filter(toks, t => t.isin(words: _*))).as("hits"),
             lit(lang).as("lang"))
    }
    // array_max on (hits, lang) structs orders by hits then lang; to make the
    // tie-break ascending on lang we invert: take max hits, then min lang among maxes.
    val arr = array(scored: _*)
    val bestAsc = array_min(filter(arr, s => s.getField("hits") === array_max(arr).getField("hits")))
    df.select(col("doc_id"),
      array_max(arr).getField("hits").as("marker_hits"),
      bestAsc.getField("lang").as("lang_pred"))
  }
}
