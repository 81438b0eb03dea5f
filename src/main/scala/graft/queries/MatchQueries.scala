package graft.queries

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.er.{Catalogs, EntityResolution}
import graft.blocking.Blocking
import graft.features.TextFeatures
import graft.matching.{Distances, Matcher, ModelStore}
import graft.pairs.Pairs

/** The end-to-end fuzzy-match dataflow (the reference's reason to exist):
  * clean → feature pipelines → LSH blocking → candidate pairs → label join →
  * distance features → GBT train/evaluate → score → ranked matches
  * (notebooks 01→02→03 re-expressed Spark-first).
  *
  * Catalog sides are key-sampled subsets of `part` (deterministic filters) —
  * the production-shaped move for a matching run: dedupe/sample before
  * pairwise work, let LSH keep the pair space near-linear. ML stages emit
  * deterministic summaries (fitted state has no SQL oracle); deep checks
  * live in MatcherSpec/BlockingSpec.
  */
object MatchQueries {

  type Q = (SparkSession, String) => DataFrame

  /** Fitted artifacts are expensive; the reference itself fits once and
    * reuses the persisted models across notebooks (`01:517-531` →
    * `03:357-429`). Mirror that: memoize the fitted feature stage and the
    * scored flagship per (session, dir, filter) so queries sharing a stage
    * (er_flagship_match / x2 / m5) fit it once per JVM. */
  private case class Stage(feats: DataFrame, golden: DataFrame,
                           pipes: EntityResolution.FittedPipelines)
  // Keyed on sessionUUID (stable and unique per session), not
  // identityHashCode (collidable, and it would pin DataFrames of stopped
  // contexts forever); entries of stopped contexts are evicted on access.
  private val stageCache =
    scala.collection.concurrent.TrieMap[(String, String, String), Stage]()
  private val matcherCache =
    scala.collection.concurrent.TrieMap[(String, String, String),
      (PipelineModel, DataFrame)]()
  private val flagshipCache =
    scala.collection.concurrent.TrieMap[(String, String, String), DataFrame]()

  // Weak references: a strong map would pin every SparkSession (and its
  // SessionState) ever passed in until the NEXT invocation evicted it — and
  // the last-ever session for the JVM lifetime.
  private val liveSessions =
    scala.collection.concurrent.TrieMap[String, java.lang.ref.WeakReference[SparkSession]]()

  private def cacheKey(s: SparkSession, dir: String, keyFilter: String) = {
    liveSessions.put(org.apache.spark.sql.graftshim.Shim.sessionUuid(s),
      new java.lang.ref.WeakReference(s))
    // evict entries bound to stopped or collected contexts — their
    // DataFrames can never execute again and would otherwise be pinned
    liveSessions.filterInPlace { (_, ref) =>
      val sess = ref.get(); sess != null && !sess.sparkContext.isStopped
    }
    def live(k: (String, String, String)) = liveSessions.contains(k._1)
    stageCache.filterInPlace((k, _) => live(k))
    matcherCache.filterInPlace((k, _) => live(k))
    flagshipCache.filterInPlace((k, _) => live(k))
    (org.apache.spark.sql.graftshim.Shim.sessionUuid(s), dir, keyFilter)
  }

  private val flagshipCfg = EntityResolution.Config(
    w2vMaxIter = 4, gbtMaxIterGrid = Seq(10), gbtMaxDepthGrid = Seq(3),
    // the fixture's description column is ~6 distinct strings — blocking
    // on it is a candidate flood, not a signal
    descriptBlocking = false)

  /** Build catalogs (subset by key), fit features; memoized per
    * (session, dir, filter). */
  private def featureStage(s: SparkSession, dir: String,
                           keyFilter: String = "id % 10 = 0"): Stage =
    stageCache.getOrElseUpdate(cacheKey(s, dir, keyFilter), {
      val a = Catalogs.sideA(s, dir).where(keyFilter).withColumn("table", lit("abt"))
      val b = Catalogs.sideB(s, dir).where(keyFilter).withColumn("table", lit("buy"))
      val all = a.unionByName(b).select("table", "id", "name", "description", "price")
      val (pipes, feats) = EntityResolution.fitFeatureModels(all, flagshipCfg)
      // golden pairs restricted to the sampled subset (semi-join on A ids)
      Stage(feats.cache(), Catalogs.golden(s, dir)
        .join(a.select(col("id").as("idA")), Seq("idA"), "left_semi"), pipes)
    })

  /** Labeled candidates + trained matcher for a stage; memoized. */
  private def trainedMatcher(s: SparkSession, dir: String,
                             keyFilter: String = "id % 10 = 0"): (PipelineModel, DataFrame) =
    matcherCache.getOrElseUpdate(cacheKey(s, dir, keyFilter), {
      val st = featureStage(s, dir, keyFilter)
      val labeled = EntityResolution.labeledCandidates(st.feats, st.golden, flagshipCfg)
        .cache()
      val trained = EntityResolution.train(st.feats, labeled, flagshipCfg)
      (trained.model, labeled)
    })

  /** Full match flow on a key subset; returns the scored, ranked pairs
    * (materialized via cache so sibling queries reuse results, not plans). */
  def flagship(s: SparkSession, dir: String, keyFilter: String = "id % 10 = 0"): DataFrame =
    flagshipCache.getOrElseUpdate(cacheKey(s, dir, keyFilter), {
      val df = flagshipUncached(s, dir, keyFilter).cache()
      df.count() // materialize once; later executions are cache reads
      df
    })

  private def flagshipUncached(s: SparkSession, dir: String, keyFilter: String): DataFrame = {
    val st = featureStage(s, dir, keyFilter)
    val (model, labeled) = trainedMatcher(s, dir, keyFilter)
    EntityResolution.scoreAll(st.feats, labeled.select("idA", "idB"), model)
      .join(labeled, Seq("idA", "idB"))
      .orderBy(col("match_score").desc, col("idA"), col("idB"))
      .select(col("idA"), col("idB"), col("label"), round(col("match_score"), 3).as("match_score"))
      .limit(500)
  }

  val defs: Seq[(String, Q)] = Seq(
    // The flagship end-to-end match query (entry() runs this at sf0.001).
    "er_flagship_match" -> ((s, dir) => flagship(s, dir)),

    // J4 — LSH approximate similarity join on name features (A vs B — the
    // documented semantics, not the reference's `02:144-145` self-join slip).
    // Reuses the memoized default feature stage and key-filters its output
    // (id%20 ⊂ id%10) rather than refitting a second pipeline stack — the
    // reference likewise fits features once and blocks over subsets.
    // Duplicate name keys never flow through the LSH explode/dedup shuffle:
    // dedupedSimilarityJoin blocks distinct keys and expands ids after the
    // distance filter (quadratic-in-duplication otherwise — Blocking.scala).
    "j4_lsh_join" -> ((s, dir) => {
      val st = featureStage(s, dir)
      val a = st.feats.where("table = 'abt' and id % 20 = 0")
      val b = st.feats.where("table = 'buy' and id % 20 = 0")
      Blocking.dedupedSimilarityJoin(a, b, keyCol = "name",
          featureCol = "name_features", threshold = 1.3)
        .select(col("idA"), col("idB"), round(col("distance"), 3).as("distance"))
    }),

    // S6 — model artifact save/load round-trip. The output is a verifiable
    // contract (mismatch count must be exactly 0 over exactly the input
    // row count), so the DuckDB oracle can hash-check it even though the
    // fitted state itself has no SQL form.
    "s6_artifact_roundtrip" -> ((s, dir) => {
      val a = Catalogs.sideA(s, dir).where("id % 20 = 0").withColumn("table", lit("abt"))
        .withColumn("description", coalesce(col("description"), lit("")))
      val pipe = TextFeatures.namePipeline().fit(a)
      val path = "/root/repo/target/qtmp/s6_name_pipeline"
      pipe.write.overwrite().save(path)
      val loaded = PipelineModel.load(path)
      val orig = pipe.transform(a).select(col("id"), col("name_features"))
      val rt = loaded.transform(a).select(col("id"), col("name_features").as("nf2"))
      orig.join(rt, "id")
        .agg(sum(when(col("name_features") === col("nf2"), 0).otherwise(1)).as("mismatches"),
             count(lit(1)).as("n_rows"))
    }),

    // F13 — pipeline composition: the three fitted pipelines chained over
    // one frame, vector schema contract asserted by output dims.
    "f13_pipeline_chain" -> ((s, dir) => {
      import org.apache.spark.ml.functions.vector_to_array
      val feats = featureStage(s, dir).feats
      feats.select(col("table"), col("id"),
        size(vector_to_array(col("name_features"))).as("name_dim"),
        size(vector_to_array(col("descript_features"))).as("descript_dim"),
        size(vector_to_array(col("price_features"))).as("price_dim"))
    }),

    // M2 — stratified split, emitted as its verifiable contract: the split
    // must partition the input exactly (counts sum back) and preserve the
    // class ratio in every split. Per-split counts themselves are
    // seed-dependent (Bernoulli), so the contract is what an oracle can
    // check; m2b_hash_split is the fully-value-checked split variant.
    "m2_stratified_split" -> ((s, dir) => {
      import s.implicits._
      val labeled = Fixtures.labeledPairs(s, dir).cache()
      val total = labeled.count()
      val globalFrac = labeled.where(col("label") === 1).count().toDouble / total
      val splits = Matcher.stratifiedSplit(labeled, Seq(0.7, 0.15, 0.15))
      val counts = splits.map(_.count())
      val posCounts = splits.map(_.where(col("label") === 1).count())
      val fracs = posCounts.zip(counts).map { case (p, n) => p.toDouble / math.max(n, 1L) }
      labeled.unpersist(blocking = false)
      // RELATIVE tolerance (+ non-empty positives per split): an absolute
      // 0.1 band would let a split that lost every row of a rare positive
      // class still pass when globalFrac << 0.1
      Seq((total, counts.sum == total,
           posCounts.forall(_ > 0) &&
             fracs.forall(f => math.abs(f - globalFrac) < 0.5 * globalFrac)))
        .toDF("total_rows", "splits_complete", "ratios_preserved")
    }),

    // M2 variant — deterministic content-hash split (reproducible across
    // engines/runs/repartitions, unlike seeded Bernoulli sampling), fully
    // oracle-checked: per-split class counts.
    "m2b_hash_split" -> ((s, dir) =>
      Matcher.withHashSplit(Fixtures.labeledPairs(s, dir),
          Seq("idA", "idB"), Seq(0.7, 0.15, 0.15))
        .groupBy("split", "label").agg(count(lit(1)).as("n"))),

    // M3 — balanced class weights (oracle-checked).
    "m3_class_weights" -> ((s, dir) =>
      Matcher.addClassWeights(Fixtures.labeledPairs(s, dir))
        .select(col("label"), round(col("weight"), 6).as("weight")).distinct()),

    // M4+M5+M6 — tuned GBT train + areaUnderPR on a held-out stratified
    // test split (metric value sanity-asserted in MatcherSpec).
    "m5_train_eval" -> ((s, dir) => {
      import s.implicits._
      val st = featureStage(s, dir)
      val (feats, golden) = (st.feats, st.golden)
      val cands = Fixtures.candidatePairs(s, dir)
        .join(feats.where("table='abt'").select(col("id").as("idA")), "idA")
        .join(feats.where("table='buy'").select(col("id").as("idB")), "idB")
      val labeled = Pairs.labelJoin(cands, golden)
      val dists = Distances.pairDistances(labeled, feats.where("table='abt'"),
        feats.where("table='buy'")).join(labeled, Seq("idA", "idB"))
      val weighted = Matcher.addClassWeights(dists).cache()
      val Seq(train, test) = Matcher.stratifiedSplit(weighted, Seq(0.8, 0.2))
      // boosted-tree iteration jobs drown in per-task overhead when a small
      // training set is spread over many shuffle partitions — size the
      // partition count to the data (~50k rows each, floor 4), same policy
      // as EntityResolution.train
      val parts = math.max(4, math.min(s.sparkContext.defaultParallelism,
        (weighted.count() / 50000L).toInt))
      val tuned = Matcher.trainTuned(train, maxIterGrid = Seq(10, 20),
        maxDepthGrid = Seq(3), coalesceTo = Some(parts))
      val best = tuned.bestModel.asInstanceOf[PipelineModel]
      val aupr = Matcher.areaUnderPR(best, test)
      // contract output: the pair count is exact (oracle-computable from
      // the candidate CTE), the AUPR bounds are the quality invariant
      val out = Seq((labeled.count(), aupr > 0.5, aupr <= 1.0))
        .toDF("n_pairs", "aupr_above_half", "aupr_valid")
      weighted.unpersist(blocking = false)
      out
    }),

    // M7 — filesystem model registry lifecycle: save v1, save v2, promote
    // v2, load Production, score consistency.
    "m7_model_store" -> ((s, dir) => {
      import s.implicits._
      val a = Catalogs.sideA(s, dir).where("id % 20 = 0").withColumn("table", lit("abt"))
        .withColumn("description", coalesce(col("description"), lit("")))
      val pipe = TextFeatures.namePipeline().fit(a)
      val root = "/root/repo/target/qtmp/registry"
      val name = "name_pipeline"
      val v1 = ModelStore.save(pipe, root, name)
      val v2 = ModelStore.save(pipe, root, name)
      ModelStore.setProduction(root, name, v2)
      val prod = PipelineModel.load(ModelStore.productionPath(root, name))
      val same = prod.transform(a).select("id", "name_features")
        .join(pipe.transform(a).select(col("id"), col("name_features").as("nf2")), "id")
        .where(col("name_features") =!= col("nf2")).count() == 0
      Seq((v1 < v2, ModelStore.productionVersion(root, name).contains(v2), same))
        .toDF("versions_increment", "production_points_at_v2", "prod_scores_match")
    }),

    // X2 — model scoring through native transform (no UDF boundary),
    // emitted as its verifiable contract: exactly the flagship's 500
    // ranked pairs, every score a probability. (The scored pairs
    // themselves are in er_flagship_match; score values are model-state-
    // dependent and have no SQL form.)
    "x2_model_score" -> ((s, dir) => flagship(s, dir)
      .agg(count(lit(1)).as("n_scored"),
        (min(col("match_score")) >= 0.0 && max(col("match_score")) <= 1.0)
          .as("scores_in_unit_interval"))),

    // The reference's full inference loop (`03:455-579`): featurize
    // new/updated rows with FITTED pipelines, MERGE into the parquet
    // feature store (S5), re-block vs stored features, score, rank.
    "er_inference" -> ((s, dir) => {
      // reuse the memoized flagship stage + matcher (the reference reloads
      // its persisted artifacts at inference time, `03:357-429`)
      val st = featureStage(s, dir)
      val (model, _) = trainedMatcher(s, dir)
      val store = "/root/repo/target/qtmp/er_feature_store"
      st.feats.write.mode("overwrite").parquet(store)
      // "new/updated products": a key-subset of side A with changed price
      val newRows = Catalogs.sideA(s, dir).where("id % 50 = 0")
        .withColumn("table", lit("abt"))
        .withColumn("price", concat(lit("$9"),
          regexp_replace(col("price"), "\\$", "")))
        .select("table", "id", "name", "description", "price")
      EntityResolution.inferIncremental(newRows, store, st.pipes, model, flagshipCfg)
        .select(col("idA"), col("idB"), round(col("match_score"), 3).as("match_score"))
    })
  )

  val oracles: Seq[(String, String)] = Seq(
    // contract oracles: deterministic values computed in SQL, invariant
    // booleans as literals — the driver's hash compare now FAILS if the
    // round-trip mismatches, a split loses rows, a score leaves [0,1],
    // or the registry lifecycle breaks
    "s6_artifact_roundtrip" ->
      s"""SELECT CAST(0 AS BIGINT) AS mismatches, CAST(count(*) AS BIGINT) AS n_rows
         |FROM (${Catalogs.sideASql}) WHERE id % 20 = 0""".stripMargin,
    "m7_model_store" ->
      """SELECT true AS versions_increment, true AS production_points_at_v2,
        |  true AS prod_scores_match""".stripMargin,
    "f13_pipeline_chain" ->
      s"""SELECT t."table", t.id, CAST(46656 AS INT) AS name_dim,
         |  CAST(50 AS INT) AS descript_dim, CAST(1 AS INT) AS price_dim
         |FROM (SELECT 'abt' AS "table", id FROM (${Catalogs.sideASql}) WHERE id % 10 = 0
         |      UNION ALL
         |      SELECT 'buy' AS "table", id FROM (${Catalogs.sideBSql}) WHERE id % 10 = 0) t""".stripMargin,
    "x2_model_score" ->
      "SELECT CAST(500 AS BIGINT) AS n_scored, true AS scores_in_unit_interval",
    "m2_stratified_split" ->
      s"""WITH ${Fixtures.labeledCte}
         |SELECT CAST(count(*) AS BIGINT) AS total_rows,
         |  true AS splits_complete, true AS ratios_preserved
         |FROM labeled""".stripMargin,
    "m5_train_eval" ->
      s"""WITH ${Fixtures.candsCte}
         |SELECT CAST(count(*) AS BIGINT) AS n_pairs,
         |  true AS aupr_above_half, true AS aupr_valid
         |FROM cands WHERE idA % 10 = 0 AND idB % 10 = 0""".stripMargin,
    "m2b_hash_split" ->
      s"""WITH ${Fixtures.labeledCte},
         |b AS (SELECT label,
         |        ('0x' || substr(md5(concat(idA, '_', idB)), 1, 6))::BIGINT % 1000 AS bkt
         |      FROM labeled)
         |SELECT CASE WHEN bkt < 700 THEN 0 WHEN bkt < 850 THEN 1 ELSE 2 END AS split,
         |       label, CAST(count(*) AS BIGINT) AS n
         |FROM b GROUP BY 1, 2""".stripMargin,
    "m3_class_weights" ->
      s"""WITH ${Fixtures.labeledCte},
         |counts AS (SELECT label, count(*) AS n FROM labeled GROUP BY label),
         |total AS (SELECT sum(n) AS tot, count(*) AS k FROM counts)
         |SELECT DISTINCT label, round(CAST(tot AS DOUBLE) / (k * n), 6) AS weight
         |FROM counts, total""".stripMargin
  )
}
