package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.er.{Catalogs, EntityResolution}
import graft.features.TextFeatures

/** Perf diagnostic: per-stage wall-clock of (a) the three feature-pipeline
  * fits and (b) the incremental-inference loop, the two remaining fat
  * stages of the flagship family. Run:
  * `sbt "runMain graft.ProfileInfer [sfDir]"`. */
object ProfileInfer {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    val cfg = EntityResolution.Config(w2vMaxIter = 4,
      gbtMaxIterGrid = Seq(10), gbtMaxDepthGrid = Seq(3), descriptBlocking = false,
      maxTrainPairs = 50000L) // mirror MatchQueries.flagshipCfg
    val a = Catalogs.sideA(spark, dir).where("id % 10 = 0").withColumn("table", lit("abt"))
    val b = Catalogs.sideB(spark, dir).where("id % 10 = 0").withColumn("table", lit("buy"))
    val all = a.unionByName(b).select("table", "id", "name", "description", "price")
    val base = timed("base clean + cache") {
      val f = all
        .withColumn("description", coalesce(col("description"), lit("")))
        .withColumn("price_f", regexp_replace(col("price"), "\\$", "").cast("float"))
        .cache()
      f.count(); f
    }
    val nameM = timed("fit namePipeline") { TextFeatures.namePipeline().fit(base) }
    val descM = timed("fit descriptW2VPipeline") {
      TextFeatures.descriptW2VPipeline(maxIter = cfg.w2vMaxIter, minCount = 1,
        seed = cfg.seed).fit(base)
    }
    val priceM = timed("fit pricePipeline") { TextFeatures.pricePipeline().fit(base) }
    val feats = timed("transform + cache") {
      val f = priceM.transform(descM.transform(nameM.transform(base)))
        .select("table", "id", "name", "description",
          "name_features", "descript_features", "price_features").cache()
      f.count(); f
    }
    val pipes = EntityResolution.FittedPipelines(nameM, descM, priceM)
    // ---- inference loop, stage by stage (mirrors MatchQueries.inferenceStats)
    val golden = Catalogs.golden(spark, dir)
      .join(a.select(col("id").as("idA")), Seq("idA"), "left_semi")
    val labeled = EntityResolution.labeledCandidates(feats, golden, cfg)
    val model = timed("train matcher") {
      EntityResolution.train(feats, labeled, cfg).model
    }
    val store = "/root/repo/target/qtmp/profile_er_store"
    timed("writeFeatureStore") {
      EntityResolution.writeFeatureStore(feats, store, cfg)
    }
    val newRows = Catalogs.sideA(spark, dir).where("id % 50 = 0")
      .withColumn("table", lit("abt"))
      .withColumn("price", concat(lit("$9"), regexp_replace(col("price"), "\\$", "")))
      .select("table", "id", "name", "description", "price")
    val newFeats = timed("transformCatalog (new rows)") {
      val f = EntityResolution.transformCatalog(pipes, newRows).cache(); f.count(); f
    }
    timed("upsertPartitionedStore") {
      graft.io.IO.upsertPartitionedStore(spark, store, newFeats,
        keys = Seq("table", "id"),
        updateCols = Seq("name_features", "descript_features", "price_features"))
    }
    val stored = timed("readPartitionedStore") {
      val st = graft.io.IO.readPartitionedStore(spark, store); st.count(); st
    }
    val cands = timed("LSH new-vs-stored") {
      val c = graft.blocking.Blocking.dedupedSimilarityJoin(
          newFeats.where("table = 'abt'"), stored.where("table = 'buy'"),
          keyCol = "name", featureCol = "name_features",
          threshold = cfg.nameThreshold, bucketLength = cfg.bucketLength,
          numHashTables = cfg.numHashTables, seed = cfg.seed)
        .select("idA", "idB").distinct()
      c.count(); c
    }
    timed("scoreAll (inference)") {
      EntityResolution.scoreAll(stored, cands, model)
        .queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
