package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval) joins at scale — the shuffle-partitioned alternative
  * to `j8_range_band`'s broadcast nested-loop plan. A BNL join needs one
  * side in memory; when the interval table is itself large (IP→geo
  * tables, genomic ranges, time-validity snapshots), the standard public
  * construction buckets BOTH sides on a fixed-width grid and equi-joins
  * the bucket key.
  *
  * Correctness shape: an interval [lo, hi) explodes to every grid bucket
  * it covers; a point value lands in exactly ONE bucket, so each
  * qualifying (fact, interval) pair meets exactly once — no dedup pass —
  * and the residual `lo <= v < hi` filter runs post-join inside codegen.
  * Cost shape: interval fanout = ⌈length/width⌉ rows per interval (pick
  * `width` near the typical interval length: fanout ~1–2), then ONE hash
  * exchange per side on the bucket key; skewed buckets fall to AQE's
  * skew-join split. */
object IntervalJoin {

  /** Join `facts` rows to every interval containing `valueCol`
    * (half-open `[lo, hi)`), bucket-partitioned — never a broadcast,
    * never a nested loop. Null values/bounds drop (no bucket). */
  def bucketedRangeJoin(facts: DataFrame, valueCol: String,
                        intervals: DataFrame, loCol: String, hiCol: String,
                        width: Double): DataFrame = {
    require(width > 0, s"bucket width must be positive, got $width")
    val fb = facts.where(col(valueCol).isNotNull)
      .withColumn("__rbucket", floor(col(valueCol) / width))
    // sequence() is inclusive; hi exactly on a boundary adds one empty
    // bucket whose pairs the residual filter removes — harmless
    val ib = intervals.where(col(loCol).isNotNull && col(hiCol).isNotNull &&
        col(loCol) <= col(hiCol))
      .withColumn("__rbucket",
        explode(sequence(floor(col(loCol) / width), floor(col(hiCol) / width))))
    fb.join(ib, Seq("__rbucket"))
      .where(col(valueCol) >= col(loCol) && col(valueCol) < col(hiCol))
      .drop("__rbucket")
  }
}
