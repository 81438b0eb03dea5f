package graft

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.functions._
import graft.functions.SqDist

/** X1 native expression: cross-checked against Vectors.sqdist on random
  * dense/sparse vectors, under both codegen and interpreted evaluation. */
class SqDistSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(7)

  private def randDense(n: Int): Vector =
    Vectors.dense(Array.fill(n)(rnd.nextDouble() * 4 - 2))

  private def randSparse(n: Int): Vector = {
    val idx = (0 until n).filter(_ => rnd.nextDouble() < 0.3)
    Vectors.sparse(n, idx.toArray, idx.map(_ => rnd.nextDouble() * 4 - 2).toArray)
  }

  private def check(pairs: Seq[(Vector, Vector)]): Unit = {
    val df = pairs.toDF("a", "b")
    val got = df.select(SqDist.sq_dist($"a", $"b")).as[Double].collect()
    val want = pairs.map { case (a, b) => Vectors.sqdist(a, b) }
    got.zip(want).foreach { case (g, w) => assert(math.abs(g - w) < 1e-12, s"$g vs $w") }
  }

  test("dense×dense, sparse×sparse, mixed — equals Vectors.sqdist") {
    val n = 12
    check(Seq.fill(20)((randDense(n), randDense(n))))
    check(Seq.fill(20)((randSparse(n), randSparse(n))))
    check(Seq.fill(20)((randSparse(n), randDense(n))))
    check(Seq.fill(20)((randDense(n), randSparse(n))))
  }

  test("interpreted path (codegen off) agrees") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try {
      check(Seq.fill(10)((randSparse(8), randDense(8))))
    } finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null propagates (nullIntolerant)") {
    val df = Seq((Some(Vectors.dense(1.0)), None: Option[Vector]))
      .toDF("a", "b")
    val out = df.select(SqDist.sq_dist($"a", $"b").as("d"))
    assert(out.where($"d".isNull).count() == 1)
  }

  test("SQL registration: sq_dist usable from spark.sql") {
    SqDist.register(spark)
    Seq((Vectors.dense(0.0, 3.0), Vectors.dense(4.0, 0.0))).toDF("a", "b")
      .createOrReplaceTempView("sqdist_t")
    val d = spark.sql("SELECT sq_dist(a, b) FROM sqdist_t").as[Double].head()
    assert(d == 25.0)
  }

  test("plan: pairDistances keeps whole-stage codegen (no BatchEvalPython/ScalaUDF)") {
    val feats = Seq((1, Vectors.dense(1.0), Vectors.dense(1.0), Vectors.dense(1.0)),
        (2, Vectors.dense(2.0), Vectors.dense(0.0), Vectors.dense(1.0)))
      .toDF("id", "name_features", "descript_features", "price_features")
    val pairs = Seq((1, 2)).toDF("idA", "idB")
    val df = graft.matching.Distances.pairDistances(pairs, feats, feats)
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"UDF leaked into hot path:\n$plan")
    val d = df.select("name_sqdist").as[Double].head()
    assert(d == 1.0)
  }
}
