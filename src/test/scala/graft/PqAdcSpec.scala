package graft

import org.apache.spark.sql.functions._
import graft.functions.PqAdc

/** PqAdc codegen kernel vs a reference loop: value parity, null
  * propagation, loud width mismatch, SQL registration, and the serve
  * plan actually running through the expression (no ScalaUDF in the ADC
  * stage). */
class PqAdcSpec extends SparkSpec {
  import spark.implicits._

  test("matches a reference ADC sum exactly (ascending-subspace order)") {
    val rnd = new scala.util.Random(11)
    val m = 8; val ksub = 32
    val rows = Seq.fill(200) {
      val codes = Seq.fill(m)(rnd.nextInt(ksub))
      val lut = Seq.fill(m)(Seq.fill(ksub)(rnd.nextGaussian()))
      val expect = codes.zipWithIndex.foldLeft(0.0) {
        case (s, (c, j)) => s + lut(j)(c)
      }
      (codes, lut, expect)
    }
    val df = rows.toDF("codes", "lut", "expect")
      .select(PqAdc.pq_adc(col("codes"), col("lut")).as("got"), col("expect"))
    assert(df.where(col("got") =!= col("expect")).count() == 0)
  }

  test("NULL codes or NULL lut propagate to NULL (never NPE, never rank)") {
    val df = Seq(
      (Some(Seq(0, 1)), Some(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))),
      (None, Some(Seq(Seq(1.0, 2.0), Seq(3.0, 4.0)))),
      (Some(Seq(0, 1)), None))
      .toDF("codes", "lut")
      .select(PqAdc.pq_adc(col("codes"), col("lut")).as("adc"))
    val out = df.collect()
    assert(out(0).getDouble(0) == 5.0)
    assert(out(1).isNullAt(0) && out(2).isNullAt(0))
  }

  test("code width != LUT subspace count fails loudly") {
    val df = Seq((Seq(0, 1, 2), Seq(Seq(1.0), Seq(2.0)))).toDF("codes", "lut")
    intercept[Exception] {
      df.select(PqAdc.pq_adc(col("codes"), col("lut"))).collect()
    }
  }

  test("SQL registration; the IVF-PQ serve plan runs the codegen kernel, " +
       "not a ScalaUDF, at the per-candidate ADC stage") {
    PqAdc.register(spark)
    val v = spark.sql(
      "SELECT pq_adc(array(1, 0), array(array(9.0D, 2.0D), array(3.0D, 4.0D))) AS a")
      .as[Double].head()
    assert(v == 5.0)
    val emb = Tables.embeddings(spark, sf)
    val path = "/root/repo/target/qtmp/pqadcspec_store"
    graft.io.IO.deletePath(path)
    graft.llm.Ann.writeIvfPqStore(emb.where("vec_id < 300"), path)
    val served = graft.llm.Ann.ivfPqStoreTopK(spark, path,
      emb.where("vec_id < 3"), k = 5, refineFrom = Some(emb))
    assert(served.count() > 0)
    val phys = served.queryExecution.executedPlan.toString
    assert(phys.contains("pq_adc"), phys.take(1500))
  }
}
