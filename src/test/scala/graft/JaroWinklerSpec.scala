package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.JaroWinkler

/** Jaro–Winkler kernel: textbook values, the DuckDB-pinned edge
  * conventions (empty → 0; boost gated at j > 0.7), symmetry, and the
  * codegen plan shape. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("textbook and DuckDB-verified values") {
    def r(x: Double) = math.rint(x * 1e10) / 1e10
    assert(r(jw("MARTHA", "MARHTA")) == r(0.9611111111))
    assert(r(jw("DIXON", "DICKSONX")) == r(0.8133333333))
    assert(r(jw("JELLYFISH", "SMELLYFISH")) == r(0.8962962963))
    assert(r(jw("DWAYNE", "DUANE")) == 0.84)
    assert(r(jw("CRATE", "TRACE")) == r(0.7333333333))
    assert(jw("abc", "abc") == 1.0)
    // DuckDB conventions the oracle compare depends on:
    assert(jw("", "abc") == 0.0 && jw("", "") == 0.0 && jw("a", "b") == 0.0)
    // boost gate: j = 0.6667 with a shared prefix stays unboosted
    assert(r(jw("az", "aq")) == r(2.0 / 3.0))
    // boost applies above the gate: prefix of 4+ caps at 4
    assert(r(jw("aaaaaz", "aaaaaq")) == r(0.9333333333))
    // ODD ordered-mismatch count floors when halved (DuckDB-pinned): this
    // fixture pair has 17 matches with 3 ordered mismatches → t = 1, not 1.5
    val j17 = (17.0 / 18 + 17.0 / 18 + 16.0 / 17) / 3
    assert(r(jw("Customer#000000951", "Customer#000001051")) ==
      r(j17 + 4 * 0.1 * (1 - j17)))
  }

  test("symmetry and bounds on fixture names") {
    val names = Tables.customer(spark, sf).select("c_name")
      .as[String].collect().take(50)
    for (a <- names.take(10); b <- names.take(10)) {
      val x = jw(a, b)
      assert(x >= 0.0 && x <= 1.0)
      assert(math.abs(x - jw(b, a)) == 0.0, s"asymmetric on ($a, $b)")
      if (a == b) assert(x == 1.0)
    }
  }

  test("runs inside whole-stage codegen — no ScalaUDF") {
    // non-literal inputs so constant folding can't pre-evaluate the plan
    val df = Tables.customer(spark, sf)
      .select(JaroWinkler.jaro_winkler(
        col("c_name"), reverse(col("c_name"))).as("jw"))
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("ScalaUDF"), s"fell out of codegen:\n$plan")
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
    assert(df.agg(max("jw")).head().getDouble(0) <= 1.0)
  }
}
