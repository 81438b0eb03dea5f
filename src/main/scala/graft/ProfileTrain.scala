package graft

import org.apache.spark.ml.PipelineModel
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.er.{Catalogs, EntityResolution}
import graft.matching.{Distances, Matcher}
import graft.pairs.Pairs
import graft.queries.Fixtures

/** Perf diagnostic: per-stage wall-clock of the m5 tuned-training query
  * (candidates → distances → split → TVS grid → AUPR) on a pre-fitted
  * feature stage, so optimization effort goes where the time is. Run:
  * `sbt "runMain graft.ProfileTrain [sfDir]"`. */
object ProfileTrain {
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
      gbtMaxIterGrid = Seq(10), gbtMaxDepthGrid = Seq(3), descriptBlocking = false)
    val a = Catalogs.sideA(spark, dir).where("id % 10 = 0").withColumn("table", lit("abt"))
    val b = Catalogs.sideB(spark, dir).where("id % 10 = 0").withColumn("table", lit("buy"))
    val all = a.unionByName(b).select("table", "id", "name", "description", "price")
    val feats = timed("fitFeatures") {
      val f = EntityResolution.fitFeatures(all, cfg).cache(); f.count(); f
    }
    val golden = Catalogs.golden(spark, dir)
      .join(a.select(col("id").as("idA")), Seq("idA"), "left_semi")
    val cands = timed("cands + subset joins") {
      val c = Fixtures.candidatePairs(spark, dir)
        .join(feats.where("table='abt'").select(col("id").as("idA")), "idA")
        .join(feats.where("table='buy'").select(col("id").as("idB")), "idB")
      c.cache().count(); c
    }
    val labeled = timed("labelJoin") {
      val l = Pairs.labelJoin(cands, golden); l.cache().count(); l
    }
    val weighted = timed("distances + weights + cache") {
      val dists = Distances.pairDistances(labeled,
        feats.where("table='abt'"), feats.where("table='buy'"))
        .join(labeled, Seq("idA", "idB"))
      val w = Matcher.addClassWeights(dists).cache(); w.count(); w
    }
    val n = weighted.count()
    println(s"[profile] n_pairs = $n")
    val Seq(train, test) = timed("stratifiedSplit") {
      Matcher.stratifiedSplit(weighted, Seq(0.8, 0.2))
    }
    val parts = math.max(4, math.min(spark.sparkContext.defaultParallelism,
      (n / 50000L).toInt))
    val tuned = timed("trainTuned (TVS grid 10,20)") {
      Matcher.trainTuned(train, maxIterGrid = Seq(10, 20),
        maxDepthGrid = Seq(3), coalesceTo = Some(parts))
    }
    val best = tuned.bestModel.asInstanceOf[PipelineModel]
    timed("areaUnderPR") { Matcher.areaUnderPR(best, test) }
    spark.stop()
  }
}
