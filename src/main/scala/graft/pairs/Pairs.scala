package graft.pairs

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Candidate/label pairs layer (ref `02_Build Training Pairs.py:197-271`).
  *
  * Scale notes: `classRatios` re-expresses the reference's
  * `Window.partitionBy()` global window (`02:269-270`) — which collapses the
  * whole frame into ONE partition — as a global aggregate broadcast back via
  * cross join. Identical semantics (PairsSpec asserts equality with the
  * window form), no single-partition chokepoint at 100 TB.
  */
object Pairs {

  /** U2 — consolidated candidate pairs: golden matches ∪ per-attribute
    * candidate sets, deduplicated (`02:213-218`). */
  def candidates(sets: DataFrame*): DataFrame =
    sets.reduce(_.unionByName(_)).distinct()

  /** J2+P6 — left-outer label join: golden pairs get label 1, everything
    * else defaults to 0 (`02:234-242`). */
  def labelJoin(candidatePairs: DataFrame, golden: DataFrame): DataFrame =
    candidatePairs.join(
        broadcast(golden.withColumn("label", lit(1))), Seq("idA", "idB"), "left_outer")
      .withColumn("label", coalesce(col("label"), lit(0)))

  /** A2+W1 — class balance with global ratio, scale-safe form. */
  def classRatios(labeled: DataFrame): DataFrame = {
    val counts = labeled.groupBy("label").agg(count(lit(1)).as("instances"))
    val total = counts.agg(sum("instances").as("total_instances"))
    counts.crossJoin(broadcast(total))
      .withColumn("ratio", col("instances") / col("total_instances"))
  }
}
