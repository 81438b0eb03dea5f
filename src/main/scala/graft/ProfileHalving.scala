package graft

import org.apache.spark.sql.SparkSession

/** Diagnostic: time trainHalving schedules at a given SF to size the
  * m4_halving_search fixture budget (per-boosting-round Spark-job overhead
  * dominates at fixture scale, so cost ≈ total scheduled rounds).
  *
  *   sbt "runMain graft.ProfileHalving /root/testdata/sf0.01"
  */
object ProfileHalving {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[halving] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val weighted = timed("prep") {
      val w = graft.queries.MatchQueries.halvingTrainingFrame(spark, dir)
      w.cache(); println(s"[halving] rows = ${w.count()}"); w
    }
    for (trial <- 1 to 2) {
      val r = timed(s"halving trial$trial") {
        graft.matching.Matcher.trainHalving(weighted, parallelism = 8,
          minIter = 3, maxIter = 48, eta = 4, coalesceTo = Some(1))
      }
      println(s"[halving] evals=${r.evals} budget=${r.budget} " +
        f"metric=${r.validationMetric}%.4f cand=${r.candidate}")
    }
    spark.stop()
  }
}
