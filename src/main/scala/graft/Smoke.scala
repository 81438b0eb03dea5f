package graft

import org.apache.spark.sql.SparkSession

/** Driver-analogue smoke: run SparkEntry.entry() on sf0.001 and assert
  * rows > 0 (the driver's t1 check), printing the head for eyeballing. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[smoke] entry() rows = $n")
    df.show(10, truncate = false)
    assert(n > 0, "entry() returned no rows")
    println("[smoke] OK")
    spark.stop()
  }
}
