package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: per-stage timings of the dd_semantic contract (exact
  * all-pairs baseline, KMeans fit, within-cell pair join) when hunting
  * bench regressions.
  *
  *   sbt "runMain graft.ProfileSem /root/testdata/sf0.1"
  */
object ProfileSem {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](n: String)(f: => A): A = {
      val t0 = System.nanoTime; val r = f
      println(f"[sem] $n%-28s ${(System.nanoTime - t0) / 1e9}%6.2f s")
      r
    }
    val emb = Tables.embeddings(spark, dir)
    t("warm scan")(emb.count())
    val v = emb.select(col("vec_id"),
      transform(col("embedding"), x => x.cast("double")).as("v"))
    val exact = v.select(col("vec_id").as("idA"), col("v").as("vA"))
      .crossJoin(broadcast(v.select(col("vec_id").as("idB"), col("v").as("vB"))))
      .where(col("idA") < col("idB"))
      .where(graft.functions.CosineSim.cosine_sim(col("vA"), col("vB")) >= 0.3)
    t("exact all-pairs baseline")(exact.count())
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val vv = emb.select(col("vec_id"),
        transform(col("embedding"), x => x.cast("double")).as("arr"))
      .withColumn("mlv", array_to_vector(col("arr")))
    val km = t("kmeans fit (default init/iter)")(
      new KMeans().setK(8).setSeed(42L).setFeaturesCol("mlv")
        .setPredictionCol("cell").fit(vv))
    t("kmeans fit (random, 5 iter)")(
      new KMeans().setK(8).setSeed(42L).setMaxIter(5).setInitMode("random")
        .setFeaturesCol("mlv").setPredictionCol("cell").fit(vv))
    t("within-cell pair join")(
      graft.llm.Dedup.cosinePairs(km.transform(vv), "vec_id", "arr",
        col("cell"), 0.3).count())
    t("full semanticStats")(
      println("[sem] " + graft.queries.LlmQueries.semanticStats(spark, dir)))
    spark.stop()
  }
}
