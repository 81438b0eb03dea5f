package graft.er

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.blocking.Blocking
import graft.features.TextFeatures
import graft.matching.{Distances, Matcher, ModelStore}
import graft.pairs.Pairs

/** The engine's public end-to-end API: everything the reference's three
  * notebooks do (feature engineering → candidate generation → training →
  * scoring/deploy), as a library a reference user can call directly.
  *
  * ```
  * val cfg    = EntityResolution.Config()
  * val feats  = EntityResolution.fitFeatures(catalogs, cfg)     // notebook 01
  * val pairs  = EntityResolution.labeledCandidates(feats, golden, cfg) // 02
  * val model  = EntityResolution.train(feats, pairs, cfg)       // 03 (train)
  * val ranked = EntityResolution.scoreAll(feats, pairs.select("idA","idB"), model.model) // 03 (infer)
  * ```
  */
object EntityResolution {

  /** Engine knobs, defaulted to the reference's recorded parameters
    * (`BASELINE.md`): LSH bucketLength=1.0 / numHashTables=10, name
    * threshold 1.3, description threshold 1.1. */
  case class Config(
      bucketLength: Double = 1.0,
      numHashTables: Int = 10,
      nameThreshold: Double = 1.3,
      descriptThreshold: Double = 1.1,
      w2vMaxIter: Int = 8,
      seed: Long = 42L,
      gbtMaxIterGrid: Seq[Int] = Seq(10, 20),
      gbtMaxDepthGrid: Seq[Int] = Seq(3, 5),
      maxTrainPairs: Long = 200000L,
      // The reference unions description-blocked candidates into the pair
      // set (`02:213-218`). Keep that as the default semantics, but allow
      // turning it off: on a corpus whose description column is
      // low-cardinality (this fixture: ~6 distinct type strings), blocking
      // on it is uninformative and floods the candidate set with
      // negatives — a knob a production matcher needs anyway.
      descriptBlocking: Boolean = true,
      // key-hash buckets of the incremental feature store: merges prune to
      // the buckets the delta's keys hash into, so per-batch merge cost is
      // O(delta + touched buckets), not O(store)
      storeBuckets: Int = 64)

  /** Notebook 01: fit the three feature pipelines over the unioned catalogs
    * (columns: table, id, name, description, price) and emit the
    * `abtbuyfeatures`-shaped frame. */
  def fitFeatures(catalogs: DataFrame, cfg: Config = Config()): DataFrame = {
    val (_, _, _, feats) =
      TextFeatures.buildFeatures(catalogs, w2vMaxIter = cfg.w2vMaxIter, seed = cfg.seed)
    feats
  }

  /** Notebook 02 (candidates): LSH-block the name features of side A
    * against side B; returns (idA, idB) candidate pairs. Joins *distinct
    * names* (lossless — identical name ⇒ identical vector) and expands to
    * ids post-filter, so the LSH shuffle is linear in distinct entities
    * (see Blocking.dedupedSimilarityJoin). */
  def nameCandidates(feats: DataFrame, cfg: Config = Config()): DataFrame = {
    val featA = feats.where("table = 'abt'")
    val featB = feats.where("table = 'buy'")
    Blocking.dedupedSimilarityJoin(featA, featB, keyCol = "name",
        featureCol = "name_features", threshold = cfg.nameThreshold,
        bucketLength = cfg.bucketLength, numHashTables = cfg.numHashTables,
        seed = cfg.seed)
      .select("idA", "idB")
  }

  /** Notebook 02 (candidates, description side): the second blocking pass
    * over description features (`02:142-155`), with the documented A-vs-B
    * semantics (the reference accidentally self-joins the abt side there —
    * SURVEY §7.4). Description is a lower-cardinality key than name, so
    * the distinct-key join is even cheaper. */
  def descriptCandidates(feats: DataFrame, cfg: Config = Config()): DataFrame = {
    val featA = feats.where("table = 'abt'")
    val featB = feats.where("table = 'buy'")
    Blocking.dedupedSimilarityJoin(featA, featB, keyCol = "description",
        featureCol = "descript_features", threshold = cfg.descriptThreshold,
        bucketLength = cfg.bucketLength, numHashTables = cfg.numHashTables,
        seed = cfg.seed + 1)
      .select("idA", "idB")
  }

  /** Notebook 02 (labels): golden ∪ name candidates ∪ description
    * candidates, deduped, left-outer labeled (`02:213-242`). */
  def labeledCandidates(feats: DataFrame, golden: DataFrame,
                        cfg: Config = Config()): DataFrame = {
    val candSets = Seq(golden, nameCandidates(feats, cfg)) ++
      (if (cfg.descriptBlocking) Seq(descriptCandidates(feats, cfg)) else Nil)
    Pairs.labelJoin(Pairs.candidates(candSets: _*), golden)
  }

  case class TrainedMatcher(model: PipelineModel, areaUnderPR: Double)

  /** Notebook 03 (train): pairwise distance features → class weights →
    * stratified split → tuned GBT → AUPR on the held-out split.
    *
    * NOTE: [[graft.ProfileEr]] mirrors this body step for step (sampleBy
    * fractions, parts formula, split, trainSingle args) so flagship
    * timings decompose; an edit here must be mirrored there or the
    * profiler silently stops measuring the production path (ADVICE r14). */
  def train(feats: DataFrame, labeled: DataFrame,
            cfg: Config = Config()): TrainedMatcher = {
    val featA = feats.where("table = 'abt'")
    val featB = feats.where("table = 'buy'")
    // A permissive blocking threshold can admit a near-quadratic candidate
    // set; training on all of it buys nothing (the decision boundary lives
    // on 3 scalar features). Cap the training set with a seeded
    // label-stratified downsample — scoring still covers every candidate.
    val n = labeled.count()
    val sampled =
      if (n <= cfg.maxTrainPairs) labeled
      else {
        val frac = cfg.maxTrainPairs.toDouble / n
        // keep ALL positives (rare class); downsample negatives
        labeled.stat.sampleBy("label", Map(0 -> frac, 1 -> 1.0), cfg.seed)
      }
    val dists = Distances.pairDistances(sampled, featA, featB)
      .join(sampled, Seq("idA", "idB"))
    // partition target sized to the (known) row count: ~50k rows/partition,
    // floor 4 — keeps boosted-tree iteration jobs from drowning in task
    // overhead on small training sets without capping genuine scale
    val parts = math.max(4, math.min(
      feats.sparkSession.sparkContext.defaultParallelism,
      (math.min(n, cfg.maxTrainPairs) / 50000L).toInt))
    // materialize the distance features ONCE: the stratified split's label
    // scan, every grid fit, the best-model refit, and the held-out
    // evaluation would otherwise each re-execute the attach-features joins
    // + sqdist pipeline (measured ~2× the whole training cost at sf0.1).
    // The coalesce stays INSIDE trainTuned (training side only) so the
    // split sees the plan's row order unchanged.
    val weighted = Matcher.addClassWeights(dists).cache()
    val Seq(tr, te) = Matcher.stratifiedSplit(weighted, Seq(0.8, 0.2), seed = cfg.seed)
    // a singleton grid is no search — skip the TVS fit-then-refit double
    val best =
      if (cfg.gbtMaxIterGrid.size == 1 && cfg.gbtMaxDepthGrid.size == 1)
        Matcher.trainSingle(tr, seed = cfg.seed,
          maxIter = cfg.gbtMaxIterGrid.head, maxDepth = cfg.gbtMaxDepthGrid.head,
          coalesceTo = Some(parts))
      else
        Matcher.trainTuned(tr, seed = cfg.seed,
          maxIterGrid = cfg.gbtMaxIterGrid, maxDepthGrid = cfg.gbtMaxDepthGrid,
          coalesceTo = Some(parts)).bestModel.asInstanceOf[PipelineModel]
    // heldOutAupr == evaluator.evaluate bit-for-bit (it delegates to the
    // distributed evaluator outside its bounded-collect regime) while
    // skipping the evaluator's ~4 tiny shuffle jobs when the held-out
    // curve is small — the same swap the m4/m5 trial loop made in
    // optimization round 14 (guide §1.2)
    val result = TrainedMatcher(best, Matcher.heldOutAupr(best.transform(te)))
    weighted.unpersist(blocking = false)
    result
  }

  /** Notebook 03 (inference): score candidate pairs with a fitted matcher
    * and return them ranked by match probability. */
  def scoreAll(feats: DataFrame, pairs: DataFrame, model: PipelineModel): DataFrame = {
    val featA = feats.where("table = 'abt'")
    val featB = feats.where("table = 'buy'")
    val dists = Distances.pairDistances(pairs, featA, featB)
    Matcher.ranked(Matcher.score(model, dists))
  }

  /** Notebook 03 (deploy): push the fitted matcher into the filesystem
    * registry and promote it to Production. */
  def deploy(trained: TrainedMatcher, root: String, name: String): Int = {
    val v = ModelStore.save(trained.model, root, name)
    // the reference logs the run's validation metric beside the
    // registered version (`03:300-314`) — the registry answers "which
    // Production model, at what measured AUPR?" without a refit
    ModelStore.logMetric(root, name, v, "areaUnderPR", trained.areaUnderPR)
    ModelStore.setProduction(root, name, v)
    v
  }

  case class FittedPipelines(name: PipelineModel, descript: PipelineModel,
                             price: PipelineModel)

  /** Fit the feature pipelines and keep the fitted models (the artifacts
    * notebook 01 persists and notebook 03 reloads). */
  def fitFeatureModels(catalogs: DataFrame,
                       cfg: Config = Config()): (FittedPipelines, DataFrame) = {
    val (n, d, p, feats) = graft.features.TextFeatures.buildFeatures(
      catalogs, w2vMaxIter = cfg.w2vMaxIter, seed = cfg.seed)
    (FittedPipelines(n, d, p), feats)
  }

  /** Notebook 03 (inference, `03:455-479`): run new/updated catalog rows
    * through the three *fitted* pipelines — no refit at inference time. */
  def transformCatalog(pipes: FittedPipelines, catalog: DataFrame): DataFrame = {
    val base = catalog
      .withColumn("description", coalesce(col("description"), lit("")))
      .withColumn("price_f", regexp_replace(col("price"), "\\$", "").cast("float"))
    pipes.price.transform(pipes.descript.transform(pipes.name.transform(base)))
      .select("table", "id", "name", "description",
        "name_features", "descript_features", "price_features")
  }

  /** Write the feature store in the bucketed layout [[inferIncremental]]
    * merges into (key-hash-partitioned so merges prune to touched buckets). */
  def writeFeatureStore(feats: DataFrame, featureStorePath: String,
                        cfg: Config = Config()): Unit =
    graft.io.IO.writePartitionedStore(feats, featureStorePath,
      keys = Seq("table", "id"), nBuckets = cfg.storeBuckets)

  /** Notebook 03 (incremental inference, `03:455-579`): featurize the new
    * rows with the stored pipelines, MERGE them into the parquet feature
    * store (S5 — matched rows update only the three feature columns),
    * re-block the new rows against the stored opposite side, score with
    * the Production matcher, and return the ranked matches.
    *
    * The store is key-hash-bucketed ([[writeFeatureStore]]) and the MERGE
    * is partition-pruned: only the buckets the delta's keys hash into are
    * read and rewritten (dynamic partition overwrite), so a per-batch
    * incremental pipeline pays O(delta), not O(store) — the Delta-MERGE
    * file-pruning behavior of the reference (`03:481-495`), re-expressed
    * for a plain parquet store. */
  def inferIncremental(newRows: DataFrame, featureStorePath: String,
                       pipes: FittedPipelines, matcher: PipelineModel,
                       cfg: Config = Config()): DataFrame = {
    val spark = newRows.sparkSession
    val newFeats = transformCatalog(pipes, newRows)
    // bucket count comes from the store's own marker, not cfg — a config
    // that drifted from the writer's would otherwise duplicate keys
    graft.io.IO.upsertPartitionedStore(spark, featureStorePath, newFeats,
      keys = Seq("table", "id"),
      updateCols = Seq("name_features", "descript_features", "price_features"))
    val store = graft.io.IO.readPartitionedStore(spark, featureStorePath)
    val storedB = store.where("table = 'buy'")
    val cands = Blocking.dedupedSimilarityJoin(
        newFeats.where("table = 'abt'"), storedB, keyCol = "name",
        featureCol = "name_features", threshold = cfg.nameThreshold,
        bucketLength = cfg.bucketLength, numHashTables = cfg.numHashTables,
        seed = cfg.seed)
      .select("idA", "idB").distinct()
    scoreAll(store, cands, matcher)
  }
}
