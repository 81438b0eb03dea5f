package graft

import org.apache.spark.sql.functions._
import graft.io.IO
import graft.ops.Skew

/** Skew salting + bucketed writes: result-equivalence and plan shape. */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin: identical results to the plain join under a hot key") {
    // 90% of left rows share one key — the classic power-law join input
    val left = ((1 to 900).map(i => ("hot", i)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("key", "v")
    val right = (Seq(("hot", "H")) ++ (1 to 100).map(i => (s"k$i", s"R$i")))
      .toDF("key", "r")
    val plain = left.join(right, Seq("key")).select("key", "v", "r")
      .as[(String, Int, String)].collect().sorted.toSeq
    val salted = Skew.saltedJoin(left, right, "key", salts = 8)
      .select("key", "v", "r").as[(String, Int, String)].collect().sorted.toSeq
    assert(salted == plain)
    assert(salted.count(_._1 == "hot") == 900) // no dup, no loss on the hot key
  }

  test("keySkew: surfaces the hot key with its share") {
    val df = ((1 to 900).map(_ => "hot") ++ (1 to 100).map(i => s"k$i")).toDF("key")
    val top = Skew.keySkew(df, "key", topN = 1)
      .select("key", "share").as[(String, Double)].head()
    assert(top._1 == "hot" && math.abs(top._2 - 0.9) < 1e-9)
  }

  test("bucketed write: join of two co-bucketed tables plans without a shuffle") {
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      Seq("b_orders", "b_lineitem").foreach { t =>
        spark.sql(s"DROP TABLE IF EXISTS $t")
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"/root/repo/target/test-warehouse/$t"))
        org.apache.commons.io.FileUtils.deleteQuietly(
          new java.io.File(s"/root/repo/spark-warehouse/$t"))
      }
      IO.writeBucketed(Tables.orders(spark, sf).select("o_orderkey", "o_custkey"),
        "b_orders", "o_orderkey", 4)
      IO.writeBucketed(Tables.lineitem(spark, sf)
          .select(col("l_orderkey").as("o_orderkey"), col("l_quantity")),
        "b_lineitem", "o_orderkey", 4)
      val joined = spark.table("b_orders").join(spark.table("b_lineitem"), "o_orderkey")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      assert(joined.count() > 0)
    } finally spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
  }
}
