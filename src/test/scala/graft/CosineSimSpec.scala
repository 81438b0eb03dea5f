package graft

import org.apache.spark.sql.functions._
import graft.functions.CosineSim

/** CosineSim codegen kernel vs the higher-order formulation. */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private def hofCosine(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) = {
    def dot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x, y, (p, q) => p * q), lit(0.0d), (s, p) => s + p)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  test("matches the interpreted higher-order formulation exactly") {
    val rnd = new scala.util.Random(7)
    val rows = Seq.fill(200)((
      Seq.fill(64)(rnd.nextGaussian()), Seq.fill(64)(rnd.nextGaussian())))
    val df = rows.toDF("a", "b")
      .select(CosineSim.cosine_sim(col("a"), col("b")).as("fast"),
        hofCosine(col("a"), col("b")).as("slow"))
    // bit-for-bit: identical accumulation order, so exact equality
    assert(df.where(col("fast") =!= col("slow")).count() == 0)
  }

  test("identical vectors → 1.0, opposite → -1.0, zero vector → NaN") {
    val df = Seq(
      (Seq(1.0, 2.0, 3.0), Seq(1.0, 2.0, 3.0)),
      (Seq(1.0, 0.0), Seq(-1.0, 0.0)),
      (Seq(0.0, 0.0), Seq(1.0, 1.0))).toDF("a", "b")
      .select(CosineSim.cosine_sim(col("a"), col("b")).as("c"))
    val out = df.as[Double].collect()
    assert(math.abs(out(0) - 1.0) < 1e-15)
    assert(math.abs(out(1) + 1.0) < 1e-15)
    assert(out(2).isNaN)
  }

  test("mismatched dimensions fail loudly") {
    val df = Seq((Seq(1.0, 2.0), Seq(1.0))).toDF("a", "b")
    val e = intercept[Exception] {
      df.select(CosineSim.cosine_sim(col("a"), col("b"))).collect()
    }
    assert(e.getMessage != null)
  }

  test("SQL registration and codegen: no interpreted ArrayAggregate in plan") {
    CosineSim.register(spark)
    Seq((Seq(1.0, 0.0), Seq(0.6, 0.8))).toDF("a", "b")
      .createOrReplaceTempView("cos_v")
    val df = spark.sql("SELECT cosine_sim(a, b) AS c FROM cos_v")
    assert(math.abs(df.as[Double].head() - 0.6) < 1e-12)
    val phys = df.queryExecution.executedPlan.toString
    assert(!phys.contains("ArrayAggregate") && !phys.contains("ZipWith"), phys)
    // the operator plan, not the registered query (which serves a memoized
    // localCheckpoint of the same result — see SessionMemo)
    val emb = Tables.embeddings(spark, sf)
    val ann = graft.llm.Ann.bruteTopK(emb, emb.where("vec_id < 8"), k = 10)
    val annPlan = ann.queryExecution.executedPlan.toString
    assert(annPlan.contains("cosine_sim"), annPlan.take(1500))
    assert(!annPlan.contains("ArrayAggregate"), "ANN scoring still interpreted")
  }
}
