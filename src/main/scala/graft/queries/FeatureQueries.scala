package graft.queries

import org.apache.spark.ml.feature.{HashingTF, IDF, NGram, StopWordsRemover, VectorAssembler}
import org.apache.spark.ml.functions.{array_to_vector, vector_to_array}
import org.apache.spark.ml.linalg.{Vector => MLVector}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.er.Catalogs
import graft.features.{CharNGrams, TextFeatures}
import graft.llm.TextAnalysis

/** SURVEY §2.8/§2.9 feature-transformer inventory. The SQL-semantics stages
  * (F1-F6) run through the real MLlib transformers (or the engine's narrow
  * Column forms) and are oracle-checked against DuckDB; the hash/model
  * stages (F7-F11) have no SQL semantics (murmur3 / fitted state — SURVEY
  * §7.4) so their queries emit deterministic scalar summaries (rows-only
  * driver check) and their deep verification lives in FeaturesSpec.
  */
object FeatureQueries {
  import Fixtures.tokSql

  type Q = (SparkSession, String) => DataFrame

  private def docTokens(s: SparkSession, dir: String, limit: String = "doc_id < 200"): DataFrame =
    Tables.documents(s, dir).where(limit)
      .select(col("doc_id"), TextAnalysis.tokens(col("text")).as("tokens"))

  val defs: Seq[(String, Q)] = Seq(
    // F1 — RegexTokenizer (the MLlib transformer itself; its [^\w\d] pattern
    // on this corpus equals the oracle's [^a-z0-9]+ split since the text is
    // ASCII alnum + punctuation).
    "f1_tokenize" -> ((s, dir) => {
      val tok = TextFeatures.tokenizer("text", "tokens")
      tok.transform(Tables.documents(s, dir).where("doc_id < 200"))
        .select(col("doc_id"), array_join(col("tokens"), " ").as("tokens"))
    }),

    // F2 — StopWordsRemover with the MLlib default english list (oracle
    // embeds the identical list, generated from the same API).
    "f2_stopwords" -> ((s, dir) => {
      val rm = new StopWordsRemover().setInputCol("tokens").setOutputCol("filtered")
      rm.transform(docTokens(s, dir))
        .select(col("doc_id"), array_join(col("filtered"), " ").as("filtered"))
    }),

    // F3 — melter: explode tokens to one row per word + char split
    // (`01:204-216`), without the SQLTransformer indirection.
    "f3_explode_melt" -> ((s, dir) =>
      docTokens(s, dir, "doc_id < 50")
        .select(col("doc_id"), explode(col("tokens")).as("word"))
        .withColumn("chars", array_join(split(col("word"), ""), "|"))),

    // F4 — char-level trigram bag via the engine's narrow CharNGrams
    // (replaces the reference's explode→NGram→collect_list shuffle).
    "f4_char_trigrams" -> ((s, dir) =>
      Catalogs.sideA(s, dir).where("id % 10 = 0")
        .select(col("id"),
          array_join(CharNGrams.charNGrams(TextAnalysis.tokens(col("name")), 3), ",")
            .as("trigrams"))),

    // F5 — collapser round-trip: explode the trigram bag and regroup with
    // collect_list (`01:228-249` semantics, order-normalized).
    "f5_regroup_collapse" -> ((s, dir) =>
      Catalogs.sideA(s, dir).where("id % 10 = 0")
        .select(col("id"),
          explode(CharNGrams.charNGrams(TextAnalysis.tokens(col("name")), 3)).as("tg"))
        .groupBy("id")
        .agg(array_join(sort_array(collect_list(col("tg"))), ",").as("trigrams"))),

    // F6 — word-level bigrams through the MLlib NGram transformer.
    "f6_word_bigrams" -> ((s, dir) => {
      val ng = new NGram().setN(2).setInputCol("tokens").setOutputCol("ngs")
      ng.transform(docTokens(s, dir, "doc_id < 100"))
        .select(col("doc_id"), array_join(col("ngs"), ",").as("bigrams"))
    }),

    // F7 — binary HashingTF at 36³ dims. Murmur3 bucketing has no SQL
    // mirror, but its CONTRACT does: declared dimensionality, strictly
    // 0/1 values, and nnz bounded by the distinct-token count (hashing
    // can merge buckets, never split) — all oracle-hash-checked.
    // Invariants come from the one-pass vec_stats kernel (O(nnz) over the
    // sparse layout) instead of vector_to_array + aggregate, which would
    // densify all 46,656 coordinates per doc just to sum ~10² non-zeros.
    "f7_hashing_tf" -> ((s, dir) => {
      val tf = new HashingTF().setInputCol("tokens").setOutputCol("v")
        .setNumFeatures(36 * 36 * 36).setBinary(true)
      val st = graft.functions.VecStats.vec_stats(col("v"))
      tf.transform(docTokens(s, dir))
        .select(col("doc_id"),
          st.getField("dim").as("dim"),
          st.getField("binary").as("values_binary"),
          (st.getField("sum").cast("long")
            <= size(array_distinct(col("tokens")))).as("nnz_le_distinct"))
    }),

    // F8 — HashingTF count mode at the reference's 2^18 dims through the
    // descript TF-IDF pipeline. Hashing conserves term mass: the TF vector
    // sums to EXACTLY the bigram count of the stop-filtered tokens, which
    // the oracle computes independently of murmur3. vec_stats keeps the
    // check O(nnz): at 2^18 dims the dense detour is 262,144 materialized
    // doubles per row for ~10² stored values.
    "f8_hashing_tf_counts" -> ((s, dir) => {
      val docs = Tables.documents(s, dir).where("doc_id < 200")
        .withColumnRenamed("text", "description")
      val m = TextFeatures.descriptTfidfPipeline().fit(docs)
      val st = graft.functions.VecStats.vec_stats(col("description_tf"))
      m.transform(docs).select(col("doc_id"),
        st.getField("dim").as("dim"),
        st.getField("sum").cast("long").as("sum_tf"))
    }),

    // F9 — IDF fit + transform invariants: with add-1 smoothing every IDF
    // weight is strictly positive, so the transform preserves the support
    // (nnz) and never produces a negative weight.
    "f9_idf" -> ((s, dir) => {
      val toks = docTokens(s, dir)
      val tf = new HashingTF().setInputCol("tokens").setOutputCol("tfv")
        .setNumFeatures(1 << 12)
      val tfd = tf.transform(toks)
      val idf = new IDF().setInputCol("tfv").setOutputCol("tfidf").fit(tfd)
      // vec_stats: nnz and min in one O(nnz) pass per vector (min over all
      // coordinates incl. implicit zeros, so min >= 0 ⇔ no negative weight)
      val stTf = graft.functions.VecStats.vec_stats(col("tfv"))
      val stIdf = graft.functions.VecStats.vec_stats(col("tfidf"))
      idf.transform(tfd).select(col("doc_id"),
        (stTf.getField("nnz") === stIdf.getField("nnz")).as("nnz_preserved"),
        (stIdf.getField("min") >= 0.0).as("tfidf_nonneg"))
    }),

    // F10 — L2 normalization, SQL-expressible on the embeddings fixture.
    "f10_l2_normalize" -> ((s, dir) => {
      val v = transform(col("embedding"), x => x.cast("double"))
      val nrm = sqrt(aggregate(v, lit(0.0d), (a, x) => a + x * x))
      // a zero vector has no direction: its normalized components are
      // NULL (ANSI division by zero THROWS, and inf/NaN would diverge
      // between engines); the norm itself still reports 0
      def unit(i: Int) = when(nrm > 0.0d,
        round(element_at(v, i) / nrm, 6))
      Tables.embeddings(s, dir).select(
        col("vec_id"),
        unit(1).as("c1"),
        unit(2).as("c2"),
        round(nrm, 6).as("norm"))
    }),

    // F11 — Word2Vec (seeded) contract: declared dims, and the Normalizer
    // leaves either a unit vector or the zero vector (docs with no
    // in-vocabulary token — vocabulary is fitted state with no SQL form).
    "f11_word2vec" -> ((s, dir) => {
      val m = TextFeatures.descriptW2VPipeline(
        input = "text", output = "w2v_features", vectorSize = 32, minCount = 2,
        maxIter = 2).fit(Tables.documents(s, dir).where("doc_id < 500"))
      val st = graft.functions.VecStats.vec_stats(col("w2v_features"))
      val nrm = sqrt(st.getField("sum_sq"))
      m.transform(Tables.documents(s, dir).where("doc_id < 100"))
        .select(col("doc_id"),
          st.getField("dim").as("dim"),
          (abs(nrm - 1.0) < 1e-6 || nrm === 0.0).as("norm_unit_or_zero"))
    }),

    // F12 — VectorAssembler(handleInvalid=keep) round-trip: price string →
    // float → 1-dim vector → back out; exactly the oracle's cast chain.
    "f12_vector_assembler" -> ((s, dir) => {
      val base = Catalogs.sideA(s, dir)
        .withColumn("price_f", regexp_replace(col("price"), "\\$", "").cast("float"))
      val asm = new VectorAssembler().setInputCols(Array("price_f"))
        .setOutputCol("price_features").setHandleInvalid("keep")
      asm.transform(base).select(col("id"),
        element_at(vector_to_array(col("price_features")), 1).as("price_val"))
    }),

    // A4 — corpus-fitted statistics: document frequencies → IDF weights as
    // rows (the relational core of IDF.fit), oracle-checked.
    "a4_corpus_idf" -> ((s, dir) => {
      val docs = Tables.documents(s, dir)
      val toks = docs.select(col("doc_id"),
        explode(array_distinct(TextAnalysis.tokens(col("text")))).as("token"))
      val dfreq = toks.groupBy("token").agg(count(lit(1)).as("df"))
      val n = docs.agg(count(lit(1)).as("n_docs"))
      dfreq.crossJoin(broadcast(n))
        .select(col("token"), col("df"),
          round(log((col("n_docs") + 1.0) / (col("df") + 1.0)), 6).as("idf"))
    }),

    // X1 — squared_dist kernel (Vectors.sqdist UDF, the reference's only
    // hand-written compute) on consecutive embedding pairs, oracle-checked
    // against pure-SQL double arithmetic.
    "x1_sqdist" -> ((s, dir) => {
      graft.matching.Distances.register(s)
      // array_to_vector NPEs on a NULL array AND on a NULL element; a
      // vector with a NULL component has no well-defined distance (the
      // oracle's list_sum would silently SKIP the null pair and report a
      // partial distance) — both are filtered identically in the oracle.
      // The exists lambda is never NULL, so the filter is two-valued.
      val e = Tables.embeddings(s, dir)
        .where(col("embedding").isNotNull &&
          !exists(col("embedding"), x => x.isNull))
        .select(col("vec_id"),
          array_to_vector(transform(col("embedding"), x => x.cast("double"))).as("v"))
      e.as("a").join(e.as("b"), col("a.vec_id") + 1 === col("b.vec_id"))
        .select(col("a.vec_id").as("ida"), col("b.vec_id").as("idb"),
          round(callUDF("squared_dist", col("a.v"), col("b.v")), 5).as("sqdist"))
    })
  )

  private def sqlQuote(w: String) = "'" + w.replace("'", "''") + "'"
  private lazy val stopListSql: String =
    StopWordsRemover.loadDefaultStopWords("english").map(sqlQuote).mkString(", ")

  val oracles: Seq[(String, String)] = Seq(
    "f1_tokenize" ->
      s"""SELECT doc_id, array_to_string(${tokSql("text")}, ' ') AS tokens
         |FROM documents WHERE doc_id < 200""".stripMargin,
    "f2_stopwords" ->
      s"""SELECT doc_id, array_to_string(
         |  list_filter(${tokSql("text")}, t -> t NOT IN ($stopListSql)), ' ') AS filtered
         |FROM documents WHERE doc_id < 200""".stripMargin,
    "f3_explode_melt" ->
      s"""SELECT doc_id, word, array_to_string(regexp_split_to_array(word, ''), '|') AS chars
         |FROM (SELECT doc_id, unnest(${tokSql("text")}) AS word
         |      FROM documents WHERE doc_id < 50)""".stripMargin,
    "f4_char_trigrams" ->
      s"""SELECT id, array_to_string(flatten(list_transform(${tokSql("name")},
         |  w -> CASE WHEN length(w) >= 3
         |            THEN list_transform(range(1, length(w) - 1), i -> substr(w, CAST(i AS INT), 3))
         |            ELSE [] END)), ',') AS trigrams
         |FROM (${Catalogs.sideASql}) WHERE id % 10 = 0""".stripMargin,
    "f5_regroup_collapse" ->
      s"""WITH tg AS (
         |  SELECT id, unnest(flatten(list_transform(${tokSql("name")},
         |    w -> CASE WHEN length(w) >= 3
         |              THEN list_transform(range(1, length(w) - 1), i -> substr(w, CAST(i AS INT), 3))
         |              ELSE [] END))) AS tg
         |  FROM (${Catalogs.sideASql}) WHERE id % 10 = 0)
         |SELECT id, array_to_string(list_sort(list(tg)), ',') AS trigrams
         |FROM tg GROUP BY id""".stripMargin,
    "f6_word_bigrams" ->
      s"""SELECT doc_id, array_to_string(list_transform(range(1, len(tok)),
         |  i -> concat(tok[CAST(i AS INT)], ' ', tok[CAST(i AS INT) + 1])), ',') AS bigrams
         |FROM (SELECT doc_id, ${tokSql("text")} AS tok
         |      FROM documents WHERE doc_id < 100)""".stripMargin,
    "f7_hashing_tf" ->
      """SELECT doc_id, CAST(46656 AS INT) AS dim,
        |  true AS values_binary, true AS nnz_le_distinct
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "f8_hashing_tf_counts" ->
      s"""SELECT doc_id, CAST(262144 AS INT) AS dim,
         |  CAST(greatest(len(list_filter(${tokSql("text")},
         |    t -> t NOT IN ($stopListSql))) - 1, 0) AS BIGINT) AS sum_tf
         |FROM documents WHERE doc_id < 200""".stripMargin,
    "f9_idf" ->
      """SELECT doc_id, true AS nnz_preserved, true AS tfidf_nonneg
        |FROM documents WHERE doc_id < 200""".stripMargin,
    "f11_word2vec" ->
      """SELECT doc_id, CAST(32 AS INT) AS dim, true AS norm_unit_or_zero
        |FROM documents WHERE doc_id < 100""".stripMargin,
    "f10_l2_normalize" ->
      """SELECT vec_id,
        |  CASE WHEN nrm > 0 THEN round(v[1] / nrm, 6) END AS c1,
        |  CASE WHEN nrm > 0 THEN round(v[2] / nrm, 6) END AS c2,
        |  round(nrm, 6) AS norm
        |FROM (SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v,
        |             CASE WHEN len(list_filter(embedding, x -> x IS NULL)) > 0 THEN NULL
        |                  ELSE sqrt(list_sum(list_transform(embedding,
        |                         x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))) END AS nrm
        |      FROM embeddings)""".stripMargin,
    "f12_vector_assembler" ->
      s"""SELECT id, CAST(CAST(replace(price, '$$', '') AS REAL) AS DOUBLE) AS price_val
         |FROM (${Catalogs.sideASql})""".stripMargin,
    "a4_corpus_idf" ->
      s"""WITH toks AS (SELECT doc_id, unnest(list_distinct(${tokSql("text")})) AS token FROM documents),
         |dfreq AS (SELECT token, CAST(count(*) AS BIGINT) AS df FROM toks GROUP BY token),
         |n AS (SELECT count(*) AS n_docs FROM documents)
         |SELECT token, df, round(ln((n_docs + 1.0) / (df + 1.0)), 6) AS idf FROM dfreq, n""".stripMargin,
    "x1_sqdist" ->
      """SELECT a.vec_id AS ida, b.vec_id AS idb,
        |  round(list_sum(list_transform(list_zip(a.embedding, b.embedding),
        |    p -> (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)) * (CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE)))), 5) AS sqdist
        |FROM embeddings a JOIN embeddings b ON a.vec_id + 1 = b.vec_id
        |WHERE a.embedding IS NOT NULL AND b.embedding IS NOT NULL
        |  AND len(list_filter(a.embedding, x -> x IS NULL)) = 0
        |  AND len(list_filter(b.embedding, x -> x IS NULL)) = 0""".stripMargin
  )
}
