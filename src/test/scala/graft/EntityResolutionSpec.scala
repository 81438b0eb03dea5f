package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.functions._
import graft.er.{Catalogs, EntityResolution}

/** End-to-end public API: the full notebook-01→02→03 flow on the sf0.001
  * catalogs, with a match-quality bar (the reference's implicit oracle —
  * average precision on held-out golden labels, SURVEY §5). */
class EntityResolutionSpec extends SparkSpec {
  import spark.implicits._

  private lazy val cfg = EntityResolution.Config(
    w2vMaxIter = 2, gbtMaxIterGrid = Seq(10), gbtMaxDepthGrid = Seq(3),
    descriptBlocking = false) // fixture descriptions are ~6 distinct strings

  private lazy val (feats, golden) = {
    val a = Catalogs.sideA(spark, sf).withColumn("table", lit("abt"))
    val b = Catalogs.sideB(spark, sf).withColumn("table", lit("buy"))
    val all = a.unionByName(b).select("table", "id", "name", "description", "price")
    (EntityResolution.fitFeatures(all, cfg).cache(), Catalogs.golden(spark, sf))
  }

  test("candidates: LSH blocking recalls every golden identity pair") {
    val cands = EntityResolution.nameCandidates(feats, cfg)
    // golden pairs are identity pairs; side B's name embeds side A's tokens,
    // so every golden pair must survive blocking at the 1.3 threshold
    val goldenSet = golden.as[(Long, Long)].collect().toSet
    val candSet = cands.as[(Long, Long)].collect().toSet
    val recall = goldenSet.intersect(candSet).size.toDouble / goldenSet.size
    assert(recall >= 0.95, s"blocking recall $recall")
  }

  test("description blocking: second-pass candidates union in when enabled") {
    val dCands = EntityResolution.descriptCandidates(feats, cfg)
    assert(dCands.count() > 0)
    val withD = EntityResolution.labeledCandidates(feats, golden,
      cfg.copy(descriptBlocking = true)).count()
    val withoutD = EntityResolution.labeledCandidates(feats, golden, cfg).count()
    assert(withD >= withoutD) // union can only add candidates
  }

  test("train: held-out areaUnderPR clears the quality bar; scoring ranks " +
       "golden pairs above non-matches") {
    val labeled = EntityResolution.labeledCandidates(feats, golden, cfg)
    val trained = EntityResolution.train(feats, labeled, cfg)
    // sf0.001 holds out only ~25 positives, so the seeded AUPR moves with
    // which specific pairs land in the test split (0.67-0.9 across split
    // schemes); the bar guards against a broken model (random ranking on
    // this fixture scores ~0.3), not a particular draw. The sf0.01 gate
    // (m5_train_eval) enforces >0.5 on a 10× test set.
    assert(trained.areaUnderPR > 0.6, s"AUPR ${trained.areaUnderPR}")

    val scored = EntityResolution.scoreAll(
        feats, labeled.select("idA", "idB"), trained.model)
      .join(labeled, Seq("idA", "idB"))
    val byIdentity = scored
      .groupBy(($"idA" === $"idB").as("identity"))
      .agg(avg("match_score").as("m"))
      .as[(Boolean, Double)].collect().toMap
    assert(byIdentity(true) > byIdentity(false) + 0.3,
      s"identity pairs should far outscore non-matches: $byIdentity")
  }

  test("inference loop: MERGE into the feature store + re-block + score") {
    val a = Catalogs.sideA(spark, sf).withColumn("table", lit("abt"))
    val b = Catalogs.sideB(spark, sf).withColumn("table", lit("buy"))
    val all = a.unionByName(b).select("table", "id", "name", "description", "price")
    val (pipes, allFeats) = EntityResolution.fitFeatureModels(all, cfg)
    val store = "/root/repo/target/test_tmp/er_store"
    EntityResolution.writeFeatureStore(allFeats, store, cfg)
    val before = graft.io.IO.readPartitionedStore(spark, store).count()

    val labeled = EntityResolution.labeledCandidates(allFeats.cache(),
      Catalogs.golden(spark, sf), cfg)
    val trained = EntityResolution.train(allFeats, labeled, cfg)

    // updated price for a key subset + one brand-new product id
    val newRows = Catalogs.sideA(spark, sf).where("id % 40 = 0")
      .withColumn("table", lit("abt"))
      .unionByName(Seq(("abt", 999999L, "cold widget", "PROMO", "$9.99"))
        .toDF("table", "id", "name", "description", "price"))
      .select("table", "id", "name", "description", "price")
    val ranked = EntityResolution.inferIncremental(
      newRows, store, pipes, trained.model, cfg)

    // read through the manifest — a raw directory read would also see
    // the superseded generation files the atomic merge left for vacuum
    val after = graft.io.IO.readPartitionedStore(spark, store)
    assert(after.count() == before + 1)        // upsert inserted the new id
    assert(after.where("id = 999999").count() == 1)
    assert(ranked.count() > 0)
    // the brand-new product must surface candidate matches ("cold widget"
    // exists on the buy side under brand prefixes)
    assert(ranked.where("idA = 999999").count() > 0)
    val top = ranked.select("match_score").as[Double].collect()
    assert(top.forall(sc => sc >= 0.0 && sc <= 1.0))
  }

  test("deploy: registry round-trip serves identical scores") {
    val labeled = EntityResolution.labeledCandidates(feats, golden, cfg)
    val trained = EntityResolution.train(feats, labeled, cfg)
    val root = "/root/repo/target/test_tmp/er_registry"
    val v = EntityResolution.deploy(trained, root, "matcher")
    val loaded = PipelineModel.load(
      graft.matching.ModelStore.productionPath(root, "matcher"))
    val pairs = labeled.select("idA", "idB").limit(50)
    val a = EntityResolution.scoreAll(feats, pairs, trained.model)
      .select("idA", "match_score").as[(Long, Double)].collect().toMap
    val b = EntityResolution.scoreAll(feats, pairs, loaded)
      .select("idA", "match_score").as[(Long, Double)].collect().toMap
    assert(v >= 1 && a == b)
    // deploy logs the run's AUPR with the registered version (the
    // reference's registry pattern): the production pointer's recorded
    // metric answers quality without a refit
    val rec = graft.matching.ModelStore.readMetric(root, "matcher", v)
    assert(rec.exists(m => m.metric == "areaUnderPR" &&
      m.value == trained.areaUnderPR))
    val prodRow = graft.matching.ModelStore.metricsTable(spark, root, "matcher")
      .where(col("stage") === "Production")
      .select("version", "value").as[(Int, Option[Double])].collect()
    assert(prodRow.map(_._1).contains(v) &&
      prodRow.toMap.apply(v).contains(trained.areaUnderPR))
  }
}
