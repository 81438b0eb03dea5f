package graft

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** The SparkSessionExtensions install path: a session built with
  * GraftExtensions resolves sq_dist in SQL with no per-session
  * registration call. */
class ExtensionsSpec extends AnyFunSuite {

  test("session built withExtensions resolves sq_dist through the parser") {
    val shared = SparkSpec.session // reuse the JVM-wide SparkContext
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val spark = SparkSession.builder()
        .master("local[2]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .withExtensions(new graft.functions.GraftExtensions)
        .getOrCreate()
      assert(spark ne shared) // extensions applied to a fresh session
      import spark.implicits._
      Seq((Vectors.dense(0.0, 3.0), Vectors.dense(4.0, 0.0))).toDF("a", "b")
        .createOrReplaceTempView("ext_t")
      val d = spark.sql("SELECT sq_dist(a, b) FROM ext_t").as[Double].head()
      assert(d == 25.0)
      // nfc_normalize installs through the same extension point:
      // decomposed e+combining-acute in, precomposed e-acute out
      val n = spark.sql("SELECT nfc_normalize('cafe\u0301')").as[String].head()
      assert(n == "caf\u00e9")
      // jaro_winkler installs through the same extension point (textbook
      // MARTHA/MARHTA value)
      val jw = spark.sql("SELECT round(jaro_winkler('MARTHA', 'MARHTA'), 6)")
        .as[Double].head()
      assert(jw == 0.961111)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
