package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.pairs.Pairs

/** U2/J2/P6/A2/W1 — pairs layer; classRatios must equal the reference's
  * global-window form exactly (SURVEY §4 scale rewrite). */
class PairsSpec extends SparkSpec {
  import spark.implicits._

  private val golden = Seq((1, 1), (2, 2)).toDF("idA", "idB")
  private val candsA = Seq((1, 1), (3, 4)).toDF("idA", "idB")
  private val candsB = Seq((1, 1), (5, 6)).toDF("idA", "idB")

  test("candidates: union + distinct semantics") {
    val out = Pairs.candidates(golden, candsA, candsB)
      .as[(Int, Int)].collect().toSet
    assert(out == Set((1, 1), (2, 2), (3, 4), (5, 6)))
    assert(Pairs.candidates(golden, candsA, candsB).count() == 4) // deduped
  }

  test("labelJoin: golden pairs 1, rest defaulted to 0 (never null)") {
    val labeled = Pairs.labelJoin(Pairs.candidates(golden, candsA, candsB), golden)
    val m = labeled.as[(Int, Int, Int)].collect().map { case (a, b, l) => (a, b) -> l }.toMap
    assert(m((1, 1)) == 1 && m((2, 2)) == 1 && m((3, 4)) == 0 && m((5, 6)) == 0)
    assert(labeled.where($"label".isNull).count() == 0)
  }

  test("classRatios equals the single-partition global-window form") {
    val labeled = Pairs.labelJoin(Pairs.candidates(golden, candsA, candsB), golden)
    val ours = Pairs.classRatios(labeled)
      .select("label", "instances", "total_instances", "ratio")
      .as[(Int, Long, Long, Double)].collect().toSet
    val windowForm = labeled.groupBy("label").agg(count(lit(1)).as("instances"))
      .withColumn("total_instances",
        sum($"instances").over(Window.partitionBy()))
      .withColumn("ratio", $"instances" / $"total_instances")
      .select("label", "instances", "total_instances", "ratio")
      .as[(Int, Long, Long, Double)].collect().toSet
    assert(ours == windowForm)
  }

  test("classRatios plan: no single-partition window exchange") {
    val labeled = Pairs.labelJoin(Pairs.candidates(golden, candsA, candsB), golden)
    val plan = Pairs.classRatios(labeled).queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), s"scale-unsafe Window in plan:\n$plan")
  }
}
