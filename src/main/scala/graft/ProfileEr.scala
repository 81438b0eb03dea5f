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
    val trained = timed("train (dist+weights+GBT)") {
      EntityResolution.train(feats, labeled, cfg)
    }
    timed("scoreAll + rank") {
      EntityResolution.scoreAll(feats, labeled.select("idA", "idB"), trained.model)
        .limit(500).queryExecution.toRdd.count()
    }
    println(f"[profile] AUPR = ${trained.areaUnderPR}%.3f")
    spark.stop()
  }
}
