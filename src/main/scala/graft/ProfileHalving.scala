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
    // schedule A/B: total scheduled rounds is the fixture-scale cost model.
    // Measured 2026-08-14 idle local[32] sf0.1: 3/48/4 (108 rounds)
    // 10.7–13.4 s; 2/32/4 (72 rounds) 7.1–7.4 s SAME winner (7,0.1,0.7);
    // 3/48/8 and 2/32/8 change the winner — eta=8's single-probe rungs
    // prune the late-blooming deep trees. 2/32/4 is the production pick.
    val schedules = Seq(
      ("minIter=2 maxIter=32 eta=4 (production, 72 rounds)", 2, 32, 4),
      ("minIter=3 maxIter=48 eta=4 (prior, 108 rounds)", 3, 48, 4))
    for ((label, mi, ma, eta) <- schedules; trial <- 1 to 2) {
      val r = timed(s"halving [$label] trial$trial") {
        graft.matching.Matcher.trainHalving(weighted, parallelism = 16,
          minIter = mi, maxIter = ma, eta = eta, coalesceTo = Some(1))
      }
      println(s"[halving] evals=${r.evals} budget=${r.budget} " +
        f"metric=${r.validationMetric}%.4f cand=${r.candidate}")
    }
    spark.stop()
  }
}
