package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.er.{Catalogs, EntityResolution}

/** Perf diagnostic: per-stage wall-clock of the flagship entity-resolution
  * flow (feature fit → blocking → train → score), so optimization effort
  * goes where the time is. Run: `sbt "runMain graft.ProfileEr [sfDir]"`. */
object ProfileEr {
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
    // this profiler decomposes the SINGLETON-grid trainSingle path only
    // (EntityResolution.train's other branch is trainTuned) — fail loudly
    // if the mirrored cfg ever grows a real grid (ADVICE r14)
    require(cfg.gbtMaxIterGrid.size == 1 && cfg.gbtMaxDepthGrid.size == 1,
      "ProfileEr mirrors the singleton-grid trainSingle branch of " +
        "EntityResolution.train; update its train decomposition for real grids")
    val a = Catalogs.sideA(spark, dir).where("id % 10 = 0").withColumn("table", lit("abt"))
    val b = Catalogs.sideB(spark, dir).where("id % 10 = 0").withColumn("table", lit("buy"))
    val all = a.unionByName(b).select("table", "id", "name", "description", "price")
    // NOTE: this first timed block absorbs JVM/codegen warmup (ProfileEr
    // has no warmup phase, unlike Bench) — measured 2026-08-15: the warm
    // per-stage truth is name fit ~2.5 s, W2V fit ~1.1 s, price fit
    // ~0.01 s, transform+materialize ~0.75 s, so read a large number here
    // as warmup before blaming the feature build.
    val feats = timed("fitFeatures (3 pipelines)") {
      val f = EntityResolution.fitFeatures(all, cfg).cache(); f.count(); f
    }
    val golden = Catalogs.golden(spark, dir)
      .join(a.select(col("id").as("idA")), Seq("idA"), "left_semi")
    val labeled = timed("labeledCandidates (LSH)") {
      val l = EntityResolution.labeledCandidates(feats, golden, cfg).cache(); l.count(); l
    }
    println(s"[profile] labeled pairs = ${labeled.count()}, " +
      s"positives = ${labeled.where(col("label") === 1).count()}, " +
      s"distinct A keys = ${feats.where("table='abt'").select("name").distinct().count()}, " +
      s"distinct B keys = ${feats.where("table='buy'").select("name").distinct().count()}")
    // ---- train, decomposed (mirrors EntityResolution.train) ----
    val featA = feats.where("table = 'abt'")
    val featB = feats.where("table = 'buy'")
    val n = labeled.count()
    val sampled = timed("train: sampleBy + count") {
      val s0 =
        if (n <= cfg.maxTrainPairs) labeled
        else labeled.stat.sampleBy("label",
          Map(0 -> cfg.maxTrainPairs.toDouble / n, 1 -> 1.0), cfg.seed)
      println(s"[profile] sampled pairs = ${s0.count()}")
      s0
    }
    val weighted = timed("train: dists+weights cache") {
      val dists = graft.matching.Distances.pairDistances(sampled, featA, featB)
        .join(sampled, Seq("idA", "idB"))
      val w = graft.matching.Matcher.addClassWeights(dists).cache()
      w.count(); w
    }
    val parts = math.max(4, math.min(
      spark.sparkContext.defaultParallelism,
      (math.min(n, cfg.maxTrainPairs) / 50000L).toInt))
    val Seq(tr, te) = timed("train: stratifiedSplit") {
      graft.matching.Matcher.stratifiedSplit(weighted, Seq(0.8, 0.2), seed = cfg.seed)
    }
    val best = timed("train: GBT fit (10 iters)") {
      graft.matching.Matcher.trainSingle(tr, seed = cfg.seed,
        maxIter = cfg.gbtMaxIterGrid.head, maxDepth = cfg.gbtMaxDepthGrid.head,
        coalesceTo = Some(parts))
    }
    val aupr = timed("train: areaUnderPR") {
      graft.matching.Matcher.areaUnderPR(best, te)
    }
    weighted.unpersist(blocking = false)
    timed("scoreAll + rank") {
      EntityResolution.scoreAll(feats, labeled.select("idA", "idB"), best)
        .limit(500).queryExecution.toRdd.count()
    }
    println(f"[profile] AUPR = $aupr%.3f")
    spark.stop()
  }
}
