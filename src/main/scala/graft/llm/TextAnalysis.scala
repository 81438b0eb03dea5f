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

  /** Corpus text normalization — the canonicalization pass every dedup /
    * fingerprint / tokenizer stage assumes has already run: Unicode NFC
    * (composed canonical form, via the codegen
    * [[graft.functions.NfcNormalize]] expression), control-character
    * strip, whitespace-run collapse, and edge trim. Lowercasing is NOT
    * part of it (case is signal for quality and language models;
    * [[tokens]] folds case where wanted). All four steps are codegen'd
    * string ops in one projection — at 100 TB this is a pure scan-speed
    * map with full column pruning.
    *
    * The strip set excludes the whitespace controls TAB/LF/FF/CR so they
    * COLLAPSE to a separating space rather than gluing their neighbors
    * together; vertical tab (0x0b) is in the strip set instead because
    * Java's `\s` includes it and RE2's does not — stripping it first
    * keeps the engine and the DuckDB oracle step-for-step identical.
    *
    * DuckDB mirror (used by the `tx_normalize` oracle):
    * `trim(regexp_replace(regexp_replace(nfc_normalize(x),
    * '[\x00-\x08\x0b\x0e-\x1f\x7f]', '', 'g'), '\s+', ' ', 'g'))`. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(
      regexp_replace(graft.functions.NfcNormalize.nfc_normalize(c),
        "[\\x00-\\x08\\x0b\\x0e-\\x1f\\x7f]", ""),
      "\\s+", " "))

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

  /** Alphabetic-character ratio (rounded 6) — exposed at Column level so
    * composite pipelines can gate on it in the same projection as their
    * other signals (one pass over `text`, no joins). */
  def alphaRatio(t: Column): Column =
    round(length(regexp_replace(t, "[^A-Za-z]", "")).cast("double")
      / greatest(length(t).cast("double"), lit(1.0)), 6)

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

  /** Character-level Shannon entropy in bits/char — the gibberish /
    * low-information signal (compressed blobs and key-mash spike high;
    * repeated boilerplate runs low; natural text sits ~4 bits/char).
    * One tight loop per row (see repUdf for why mode/frequency counting
    * lives in a UDF, not an explode + two-level aggregate): zero shuffles,
    * scan speed at 100 TB. Null text propagates null; empty text is 0. */
  private val Ln2 = math.log(2.0)

  private[llm] val entropyUdf = udf { (s: String) =>
    if (s == null) null
    else if (s.isEmpty) java.lang.Double.valueOf(0.0)
    else {
      // count Unicode CODEPOINTS, not UTF-16 code units — the oracle's
      // string_split sees codepoints, and a surrogate pair is one symbol
      val counts = scala.collection.mutable.HashMap.empty[Int, Int]
      var i = 0
      var n = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        counts.update(cp, counts.getOrElse(cp, 0) + 1)
        i += Character.charCount(cp)
        n += 1
      }
      val nd = n.toDouble
      var h = 0.0
      counts.valuesIterator.foreach { v =>
        val p = v / nd
        h -= p * (math.log(p) / Ln2)
      }
      java.lang.Double.valueOf(h)
    }
  }

  /** Per-doc character entropy, rounded for engine-reproducible compare. */
  def charEntropy(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
      round(entropyUdf(col(textCol)), 4).as("char_entropy"))

  /** Document fingerprint: polynomial rolling hash of the codepoint stream
    * (base 31 mod 1e9+7), engine-independent — usable as a cheap exact-dup
    * key that survives reformatting of the container file. One JVM loop
    * per row rather than the equivalent `aggregate(split(...))` Column
    * fold: HOF lambdas evaluate interpreted, ~2 closure calls PER
    * CHARACTER — the per-byte cost that dominates a 100 TB scan (same
    * rationale as repUdf/shingleUdf). Iterates codepoints, matching both
    * the regex-split semantics of the Column form and the oracle's
    * ascii() (codepoint) arithmetic. */
  private val fingerprintUdf = udf { (s: String) =>
    if (s == null) null
    else {
      var acc = 0L
      var i = 0
      while (i < s.length) {
        val cp = s.codePointAt(i)
        acc = (acc * 31L + cp) % 1000000007L
        i += Character.charCount(cp)
      }
      java.lang.Long.valueOf(acc)
    }
  }

  def fingerprint(c: Column): Column = fingerprintUdf(c)

  /** Overlapping-window character chunking — the split step an embedding /
    * RAG pipeline runs before vectorizing long documents. Chunk i covers
    * [i·stride, i·stride + chunkLen); windows start while text remains
    * (last start ≤ len−1), so consecutive chunks overlap by
    * chunkLen − stride chars. Pure codegen'd builtins (sequence →
    * posexplode → substring): the explode multiplies rows, never bytes
    * re-shuffled — chunking stays a scan-side generator at 100 TB.
    * Zero-length texts yield no chunks (mirrors `range()` semantics in the
    * oracle). */
  def chunk(df: DataFrame, textCol: String = "text",
            chunkLen: Int = 200, stride: Int = 150): DataFrame = {
    require(stride > 0 && chunkLen >= stride,
      s"need 0 < stride <= chunkLen; got stride=$stride chunkLen=$chunkLen")
    val n = length(col(textCol))
    df.where(n > 0)
      .select(col("doc_id"), col(textCol),
        posexplode(sequence(lit(0L),
          floor((n - 1).cast("double") / stride).cast("long"))))
      .select(col("doc_id"), col("pos").cast("int").as("chunk_no"),
        col(textCol).substr((col("col") * stride + 1).cast("int"), lit(chunkLen))
          .as("chunk"))
  }

  /** Per-doc frequency stats behind [[repetitionStats]], computed in ONE
    * pass over the token array with local hash maps. Mode counting has no
    * cross-document state, so pushing it into a narrow map beats the
    * relational explode + two-level-aggregate shape outright: zero
    * shuffles, and no interpreted array HOFs (an HOF-based bigram
    * formulation measured 22 s at sf0.1 vs sub-second here — same 100×
    * interpreted-lambda penalty LangId.predictUdf and Dedup.shingleUdf
    * already document). */
  private[llm] val repUdf = udf { (toks: Seq[String]) =>
    if (toks == null) null
    else {
      val tc = scala.collection.mutable.HashMap.empty[String, Int]
      toks.foreach(t => tc.update(t, tc.getOrElse(t, 0) + 1))
      val bc = scala.collection.mutable.HashMap.empty[String, Int]
      var i = 0
      while (i < toks.length - 1) {
        val k = toks(i) + " " + toks(i + 1)
        bc.update(k, bc.getOrElse(k, 0) + 1)
        i += 1
      }
      def top(m: scala.collection.mutable.HashMap[String, Int]) =
        if (m.isEmpty) 0 else m.valuesIterator.max
      (toks.length, tc.size, top(tc), top(bc))
    }
  }

  /** Repetition signals — the gopher-style quality filters that catch
    * degenerate generated/boilerplate text: token count, distinct-token
    * ratio, most-frequent-token fraction, most-frequent-bigram fraction.
    * A pure projection (scan-speed at 100 TB); see [[repUdf]] for why the
    * mode counts live in a one-pass UDF rather than an explode+aggregate. */
  def repetitionStats(df: DataFrame, textCol: String = "text"): DataFrame = {
    val nTok = greatest(col("n_tokens"), lit(1)).cast("double")
    df.select(col("doc_id"), repUdf(tokens(col(textCol))).as("st"))
      .select(col("doc_id"), col("st._1").as("n_tokens"),
        col("st._2").as("n_distinct"), col("st._3").as("top_tok"),
        col("st._4").as("top_bg"))
      .select(col("doc_id"), col("n_tokens"),
        round(col("n_distinct").cast("double") / nTok, 6).as("distinct_ratio"),
        round(col("top_tok").cast("double") / nTok, 6).as("top_token_frac"),
        round(col("top_bg").cast("double")
          / greatest(col("n_tokens") - 1, lit(1)).cast("double"), 6)
          .as("top_bigram_frac"))
  }

  /** PII patterns kept RE2-compatible (no backrefs, no lookaround) so the
    * same literal strings run under Java regex (this engine) and RE2-family
    * engines (oracles, sibling tooling) with identical match sets. */
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re  = "\\b[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\b"
  private[graft] val PhoneRe = "\\+[0-9]{7,15}\\b"

  /** PII scrubbing — the standard pre-training redaction pass (emails,
    * IPv4 addresses, international phone numbers → typed placeholders).
    * Counts are measured on the ORIGINAL text, then the three patterns
    * rewrite in a fixed order (email → ip → phone) so a digit run freed by
    * an earlier replacement can never be re-matched ambiguously. A pure
    * codegen'd projection: at 100 TB this runs at parquet-scan speed with
    * zero shuffle, and the regex work is the same per-byte cost class as
    * the quality/langid signals it pipelines with. */
  def piiScrub(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    df.select(col("doc_id"),
      size(regexp_extract_all(t, lit(EmailRe), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(Ipv4Re), lit(0))).as("n_ips"),
      size(regexp_extract_all(t, lit(PhoneRe), lit(0))).as("n_phones"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "<EMAIL>"),
          Ipv4Re, "<IP>"),
        PhoneRe, "<PHONE>").as("scrubbed"))
  }

  /** Corpus-fitted unigram language-model score — the CCNet-style quality
    * filter: fit token probabilities on the corpus itself (tf / total
    * tokens), then score each document by its mean token log-probability.
    * Out-of-distribution documents (gibberish, wrong language, spam) score
    * low; every token is in-vocabulary by construction since the model is
    * fitted on the same corpus it scores.
    *
    * Scale shape: ONE aggregation over the exploded tokens builds the
    * vocabulary (partial map-side combine; shuffle keyed on the token),
    * the grand total rides in via a broadcast single-row cross join, and
    * scoring re-joins tokens to the vocabulary on the token key — the
    * vocabulary is tiny relative to the corpus (heap's law), so AQE
    * broadcasts it and the scoring pass is scan + broadcast-hash-join.
    * round(4) masks summation-order float noise (same convention as
    * [[charEntropy]] and the cosine oracles). */
  /** Per-source KL divergence from the corpus unigram distribution — the
    * mixture-drift report: which sources look lexically unlike the corpus
    * they're mixed into (high KL = distributional outlier; candidates for
    * re-weighting or review). KL(source ∥ corpus) over the shared token
    * space; every source token is in the corpus vocabulary by construction,
    * so the divergence is always finite.
    *
    * Scale shape: two partial-combining aggregations over one exploded-token
    * pass (per-(source, token) and per-token), a broadcast-sized global
    * vocabulary joined back on the token key, and a final per-source
    * aggregation whose output is one row per source. round(4) masks
    * ln()/summation-order float noise (same convention as [[charEntropy]]). */
  def sourceDivergence(df: DataFrame, textCol: String = "text",
                       groupCol: String = "source"): DataFrame = {
    val ex = df.select(col(groupCol).as("grp"),
      explode(tokens(col(textCol))).as("tok"))
    val global = ex.groupBy("tok").agg(count(lit(1)).as("tf"))
    val total = ex.agg(count(lit(1)).cast("double").as("total"))
    val perSrc = ex.groupBy("grp", "tok").agg(count(lit(1)).as("stf"))
    val srcTotal = ex.groupBy("grp").agg(count(lit(1)).as("s_total"))
    perSrc
      .join(srcTotal, Seq("grp"))
      .join(global, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy(col("grp").as(groupCol))
      .agg(max(col("s_total")).as("n_tok"),
        round(sum((col("stf") / col("s_total"))
          * log((col("stf") / col("s_total")) / (col("tf") / col("total")))), 4)
          .as("kl"))
  }

  /** Sequence-length histogram — the report a context-length / packing
    * decision starts from: per source, log2-bucketed token counts with
    * document counts and token mass per bucket. Token-less docs (null or
    * empty text) land in bucket −1. The bucket is computed as
    * `length(bin(n)) − 1` — an INTEGER formula for floor(log2 n) that is
    * bit-identical in any engine, where float log2 differs by an ulp at
    * exact powers of two and flips the floor. One exploded-free projection
    * + one partial-combining aggregate; the exchange carries one row per
    * (source, bucket). */
  def lengthHistogram(df: DataFrame, textCol: String = "text",
                      groupCol: String = "source"): DataFrame = {
    val n = size(tokens(col(textCol)))
    val bucket = when(n.isNull || n <= 0, lit(-1))
      .otherwise((length(bin(n.cast("long"))) - lit(1)).cast("int"))
    df.select(col(groupCol), bucket.as("len_bucket"),
        coalesce(n, lit(0)).as("n"))
      .groupBy(groupCol, "len_bucket")
      .agg(count(lit(1)).as("n_docs"),
        sum(greatest(col("n"), lit(0)).cast("long")).as("total_tokens"))
  }

  /** Vocabulary-coverage report — the "how much of the corpus does a
    * top-k vocabulary cover" question a tokenizer design starts from.
    * One row per top-k token: its count, frequency rank (ties broken by
    * token, so ranks are engine-deterministic), and the CUMULATIVE
    * fraction of all corpus tokens covered through that rank.
    *
    * Scale shape: the token-frequency aggregate partial-combines map-side
    * (the only corpus-sized exchange carries one row per distinct token);
    * the top-k is a TakeOrderedAndProject (bounded, no global sort of the
    * vocab); the rank/cumulative window runs over the k retained rows
    * only — a single partition of k rows, by construction not a
    * bottleneck. */
  def vocabulary(df: DataFrame, textCol: String = "text",
                 topK: Int = 100): DataFrame = {
    require(topK >= 1, s"topK must be >= 1; got $topK")
    import org.apache.spark.sql.expressions.Window
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .groupBy("token").agg(count(lit(1)).as("cnt"))
    val total = counts.agg(sum("cnt").cast("double").as("total"))
    val ord = Window.orderBy(col("cnt").desc, col("token"))
    counts.orderBy(col("cnt").desc, col("token")).limit(topK)
      .crossJoin(broadcast(total))
      .withColumn("rank", row_number().over(ord))
      .withColumn("coverage",
        round(sum("cnt").over(ord).cast("double") / col("total"), 6))
      .select("token", "cnt", "rank", "coverage")
  }

  /** BM25 lexical retrieval scores for a fixed query-term set — the
    * keyword-search complement of the embedding-space `Ann` family
    * (Robertson & Zaragoza 2009, "The Probabilistic Relevance Framework:
    * BM25 and Beyond"), and the retrieval primitive behind lexical
    * decontamination ("training docs that keyword-match an eval
    * question") and targeted corpus slicing. Uses Lucene's
    * always-positive idf form ln(1 + (N − df + ½)/(df + ½)).
    *
    * Scale shape: per-term tf is a SCAN-SIDE projection
    * (size(filter(toks, = term)) per query term — |terms| is a small
    * literal list), so there is no token explode and no (doc, term)
    * shuffle at all; the corpus stats (N, avgdl, per-term df) partial-
    * combine to ONE row that broadcasts back, and scoring is a second
    * narrow projection. Two corpus scans total (stats, then score — the
    * minimum for any idf-weighted scorer) and zero wide exchanges.
    * round(4) masks per-doc term-summation-order float noise (same
    * convention as [[unigramLogProb]]). Emits only docs with ≥ 1
    * matching term. */
  def bm25(df: DataFrame, queryTerms: Seq[String], k1: Double = 1.2,
           b: Double = 0.75, textCol: String = "text"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(k1 >= 0.0 && b >= 0.0 && b <= 1.0, s"bad BM25 params ($k1, $b)")
    val ts = queryTerms.zipWithIndex
    val tfs = df.select(col("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id") +: size(col("toks")).cast("double").as("dl") +:
        ts.map { case (t, i) =>
          size(filter(col("toks"), x => x === lit(t))).cast("double").as(s"tf_$i")
        }: _*)
    val aggExprs = count(lit(1)).cast("double").as("n_docs") +:
      avg(col("dl")).as("avgdl") +:
      ts.map { case (_, i) =>
        sum(when(col(s"tf_$i") > 0.0, 1.0).otherwise(0.0)).as(s"df_$i")
      }
    val stats = tfs.agg(aggExprs.head, aggExprs.tail: _*)
    val (nHit, score) = bm25ScoreCols(queryTerms.size, k1, b)
    tfs.crossJoin(broadcast(stats))
      .select(col("doc_id"), nHit.cast("int").as("n_hit_terms"),
        round(score, 4).as("bm25"))
      .where(col("n_hit_terms") > 0)
  }

  /** The BM25 (n_hit_terms, score) Column pair over a frame carrying
    * per-doc `tf_<i>`/`dl` and broadcast `n_docs`/`avgdl`/`df_<i>` —
    * shared by the full-scan [[bm25]] and [[Bm25Store]]'s pruned serve so
    * both build the IDENTICAL expression tree (same per-term addition
    * order, same when-guards) and their scores agree bit-for-bit, not
    * just approximately. */
  private[llm] def bm25ScoreCols(nTerms: Int, k1: Double,
                                 b: Double): (Column, Column) = {
    def w(i: Int) = {
      val idf = log(lit(1.0) +
        (col("n_docs") - col(s"df_$i") + 0.5) / (col(s"df_$i") + 0.5))
      idf * (col(s"tf_$i") * (k1 + 1.0)) /
        (col(s"tf_$i") + lit(k1) * (lit(1.0 - b) + lit(b) * col("dl") / col("avgdl")))
    }
    val nHit = (0 until nTerms).map(i =>
      when(col(s"tf_$i") > 0.0, 1).otherwise(0)).reduce(_ + _)
    val score = (0 until nTerms).map(i =>
      when(col(s"tf_$i") > 0.0, w(i)).otherwise(lit(0.0))).reduce(_ + _)
    (nHit, score)
  }

  def unigramLogProb(df: DataFrame, textCol: String = "text"): DataFrame = {
    val ex = df.select(col("doc_id"), explode(tokens(col(textCol))).as("tok"))
    val vocab = ex.groupBy("tok").agg(count(lit(1)).as("tf"))
    // sum(vocab.tf) == count(ex) exactly — the plain count partial-combines
    // to one row per partition with NO token-key Exchange, where summing the
    // vocab would rebuild the whole grouped aggregation a second time
    val total = ex.agg(count(lit(1)).cast("double").as("total"))
    val scored = ex.join(vocab, Seq("tok"))
      .crossJoin(broadcast(total))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round(sum(log(col("tf") / col("total"))) / count(lit(1)), 4).as("avg_logp"))
    df.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        col("avg_logp"))
  }

  /** Interpolated bigram LM score — the higher-fidelity CCNet-style filter:
    * mean log of p(wᵢ) where p interpolates the corpus-fitted bigram with
    * the unigram (λ·c(wᵢ₋₁wᵢ)/c(wᵢ₋₁) + (1−λ)·c(wᵢ)/N; a document's
    * first token scores unigram-only). The corpus scores itself, so every
    * token has a nonzero unigram probability and log never sees 0.
    *
    * Scale shape: the previous token comes from indexing the document's
    * OWN token array (element_at at pos), not a lag window — no shuffle to
    * form bigrams. Unigram/bigram count tables aggregate with map-side
    * partial combine, and the three count joins are vocab-sized (AQE
    * broadcasts them in the common regime). round(4) masks per-doc
    * summation-order float noise, same convention as [[unigramLogProb]]. */
  def bigramLogProb(df: DataFrame, textCol: String = "text",
                    lambda: Double = 0.75): DataFrame = {
    require(lambda >= 0.0 && lambda <= 1.0, s"lambda in [0,1]; got $lambda")
    val ex = df.select(col("doc_id"), tokens(col(textCol)).as("toks"))
      .select(col("doc_id"), posexplode(col("toks")).as(Seq("pos", "tok")),
        col("toks"))
      .select(col("doc_id"), col("tok"),
        // element_at is 1-indexed: element pos IS the previous token
        when(col("pos") === 0, lit(null)).otherwise(element_at(col("toks"), col("pos")))
          .as("prev"))
    val uni = ex.groupBy("tok").agg(count(lit(1)).as("uc"))
    val bi = ex.where(col("prev").isNotNull)
      .groupBy("prev", "tok").agg(count(lit(1)).as("bc"))
    val total = ex.agg(count(lit(1)).cast("double").as("total"))
    val pu = col("uc").cast("double") / col("total")
    val pb = col("bc").cast("double") / col("pc").cast("double")
    val scored = ex
      .join(uni, Seq("tok"))
      .join(uni.select(col("tok").as("prev"), col("uc").as("pc")), Seq("prev"), "left")
      .join(bi, Seq("prev", "tok"), "left")
      .crossJoin(broadcast(total))
      .withColumn("p", when(col("prev").isNull, pu)
        .otherwise(lit(lambda) * coalesce(pb, lit(0.0)) + lit(1.0 - lambda) * pu))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_tok"),
        round(sum(log(col("p"))) / count(lit(1)), 4).as("avg_logp2"))
    df.select(col("doc_id"))
      .join(scored, Seq("doc_id"), "left")
      .select(col("doc_id"), coalesce(col("n_tok"), lit(0L)).as("n_tok"),
        col("avg_logp2"))
  }
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

  // (lang, marker set) in ascending lang order — the tie-break order
  private val markerSets: IndexedSeq[(String, Set[String])] =
    markers.toSeq.sortBy(_._1).map { case (l, ws) => (l, ws.toSet) }.toIndexedSeq

  // One pass over the tokens with 5 set probes each, instead of 5
  // interpreted `filter(isin)` array lambdas per document (HOF lambdas
  // evaluate interpreted — measured ~4s of the sf0.1 bench on this query
  // alone). Strict `>` keeps the FIRST max in ascending lang order, i.e.
  // the same min-lang-among-maxes tie-break as the Column formulation.
  private val predictUdf = udf { (toks: Seq[String]) =>
    // null text → tokens() yields null; a null row must not NPE the stage
    if (toks == null) null
    else {
    val n = markerSets.length
    val counts = new Array[Int](n)
    toks.foreach { t =>
      var i = 0
      while (i < n) { if (markerSets(i)._2.contains(t)) counts(i) += 1; i += 1 }
    }
    var best = 0
    var i = 1
    while (i < n) { if (counts(i) > counts(best)) best = i; i += 1 }
    (counts(best), markerSets(best)._1)
    }
  }

  /** Column form: struct(_1 = marker_hits, _2 = lang_pred) over a token
    * array — lets composite pipelines gate on language in the same
    * projection as their other signals. */
  def predictCol(toks: Column): Column = predictUdf(toks)

  /** Predict language as the marker set with the highest hit count;
    * deterministic tie-break on language code order. */
  def predict(df: DataFrame, textCol: String = "text"): DataFrame =
    df.select(col("doc_id"),
        predictUdf(TextAnalysis.tokens(col(textCol))).as("p"))
      .select(col("doc_id"),
        col("p._1").as("marker_hits"), col("p._2").as("lang_pred"))

  // ---------------------------------------------------------------------
  // Trained char-n-gram naive Bayes — the real-classifier upgrade over the
  // marker heuristic. Standard Cavnar–Trenkle-style character profiles
  // with multinomial NB scoring; fit is fully distributed, predict is a
  // zero-shuffle scan against a broadcast model.
  // ---------------------------------------------------------------------

  /** A fitted char-n-gram multinomial naive-Bayes language model.
    *
    * `gramLogProb(lang)(gram)` = ln((count+1)/(total_lang+V)) with Laplace
    * smoothing over the joint vocabulary V (distinct grams kept across all
    * languages); `logDefault(lang)` is the smoothed mass of an unseen
    * gram; `logPrior(lang)` = ln(docs_lang/docs_total). Langs are sorted
    * ascending — prediction tie-breaks on the first (smallest) code. */
  case class NbModel(n: Int, langs: IndexedSeq[String],
                     logPrior: Map[String, Double],
                     gramLogProb: Map[String, Map[String, Double]],
                     logDefault: Map[String, Double]) {
    /** Deterministic 6-dp-grid NB score of `text` under `lang` — the same
      * value the DuckDB oracle computes, so the argmax is engine-stable
      * (round-then-compare, the rangeSearch boundary contract). */
    def score(text: String, lang: String): Double = {
      val p = " " + (if (text == null) "" else text.toLowerCase) + " "
      val nGrams = math.max(p.length - n + 1, 0)
      val probs = gramLogProb(lang)
      val dflt = logDefault(lang)
      var s = logPrior(lang)
      var i = 0
      while (i < nGrams) { s += probs.getOrElse(p.substring(i, i + n), dflt); i += 1 }
      math.rint(s * 1e6) / 1e6
    }
  }

  /** Fit a char-n-gram NB model on a labeled (text, lang) frame.
    *
    * Scale shape: ONE shuffle — the (lang, gram) count groupBy, map-side
    * combined, whose output is bounded by langs × charset^n regardless of
    * corpus size (the reduced table, not the corpus, is what moves). The
    * per-lang top-`maxGramsPerLang` truncation windows over that bounded
    * table and the collect is ≤ langs × maxGramsPerLang rows by
    * construction, so the driver never sees corpus-sized data. Truncation
    * order is (count desc, gram asc) — deterministic, and a no-op whenever
    * the corpus's distinct-gram count is under the cap (pinned by spec). */
  def fitNb(df: DataFrame, textCol: String = "text", langCol: String = "lang",
            n: Int = 3, maxGramsPerLang: Int = 65536): NbModel = {
    import org.apache.spark.sql.expressions.Window
    val padded = concat(lit(" "), lower(coalesce(col(textCol), lit(""))), lit(" "))
    // a NULL label row cannot train a supervised model: it would become a
    // NULL "language" class (and NPE the deterministic lang sort below) —
    // the standard fit rule is to drop unlabeled rows; PREDICTION still
    // covers every doc (predictNb takes its own input frame)
    val base = df.where(col(langCol).isNotNull)
      .select(col(langCol).as("lang"), padded.as("p"))
    val grams = base.select(col("lang"),
        explode(transform(
          sequence(lit(1), greatest(length(col("p")) - (n - 1), lit(0))),
          i => col("p").substr(i, lit(n)))).as("gram"))
    val kept = grams.groupBy("lang", "gram").count()
      .withColumn("rk", row_number().over(
        Window.partitionBy("lang").orderBy(col("count").desc, col("gram"))))
      .where(col("rk") <= maxGramsPerLang)
      .select("lang", "gram", "count")
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
    val docCounts = base.groupBy("lang").count().collect()
      .map(r => (r.getString(0), r.getLong(1))).toMap
    val totalDocs = docCounts.values.sum.toDouble
    val vocab = kept.map(_._2).distinct.length.toDouble
    val totals = kept.groupBy(_._1).view.mapValues(_.map(_._3).sum.toDouble).toMap
    val langs = docCounts.keys.toIndexedSeq.sorted
    val byLang = kept.groupBy(_._1)
    NbModel(n, langs,
      logPrior = docCounts.map { case (l, c) => l -> math.log(c / totalDocs) },
      gramLogProb = langs.map { l =>
        val t = totals.getOrElse(l, 0.0)
        l -> byLang.getOrElse(l, Array.empty[(String, String, Long)])
          .map { case (_, g, c) => g -> math.log((c + 1.0) / (t + vocab)) }.toMap
      }.toMap,
      logDefault = langs.map { l =>
        l -> math.log(1.0 / (totals.getOrElse(l, 0.0) + vocab))
      }.toMap)
  }

  /** Score every doc under every language of a broadcast `model` and emit
    * the argmax — (doc_id, n_grams, lang_nb). Zero shuffles: the model
    * ships once per executor and each row is scored in a single narrow
    * pass, so at 100 TB this runs at parquet-scan speed exactly like the
    * marker heuristic it upgrades. Ties on the 6-dp score grid break to
    * the smallest language code (strict `>` over ascending langs). */
  def predictNb(df: DataFrame, model: NbModel, textCol: String = "text",
                idCol: String = "doc_id"): DataFrame = {
    val bc = df.sparkSession.sparkContext.broadcast(model)
    val scoreUdf = udf { (text: String) =>
      val m = bc.value
      val p = " " + (if (text == null) "" else text.toLowerCase) + " "
      val nGrams = math.max(p.length - m.n + 1, 0)
      var best = Double.NegativeInfinity
      var bestLang = ""
      m.langs.foreach { l =>
        val s = m.score(text, l)
        if (s > best) { best = s; bestLang = l }
      }
      (nGrams, bestLang)
    }
    df.select(col(idCol), scoreUdf(col(textCol)).as("p"))
      .select(col(idCol), col("p._1").as("n_grams"), col("p._2").as("lang_nb"))
  }
}
