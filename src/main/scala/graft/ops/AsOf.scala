package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward-looking temporal) join — the time-series operator the
  * built-in join strategies don't express directly: for every left row,
  * attach a value from the *most recent* right row with the same key and
  * `ts_right <= ts_left`.
  *
  * Formulated as union + keyed window rather than a range join: tag each
  * side, union them, sort within each key by (ts, side) and carry the last
  * non-null right value forward. That costs exactly ONE shuffle (hash
  * partition by key) and one sort — linear in |left|+|right| — where the
  * naive `a.join(b, key && ts_b <= ts_a)` + per-row max is a near-cross
  * join per key at scale. This is the standard scalable as-of formulation
  * (same plan shape every streaming/batch engine uses for point-in-time
  * correctness joins).
  *
  * Semantics notes:
  *  - match is inclusive (`ts_right <= ts_left`): right rows sort before
  *    left rows at equal timestamps.
  *  - right rows must be unique per (key, ts) — pre-aggregate if not, or
  *    the carried value is picked arbitrarily among ties.
  *  - unmatched left rows (no earlier right row) get NULL.
  *  - NULL join keys never match (standard join semantics): null-key left
  *    rows pass through unmatched; null-key right rows are ignored.
  *  - `valueCol` must be non-null on matching right rows: the carry-forward
  *    uses `last(ignoreNulls = true)`, so a right row whose value is
  *    legitimately NULL would be skipped in favor of an older value. Encode
  *    "explicitly no value" as a sentinel (or pre-coalesce) if needed.
  *
  * Scale: one partition per key-hash; a pathologically hot key serializes
  * through one task's sort (same bound as any keyed window). Salt-bucket
  * the key (`Skew.saltedJoin` notes) or pre-aggregate right if a key
  * dominates.
  */
object AsOf {

  /** Backward as-of join of `left` to `right` on `keyCol`, time `tsCol`;
    * attaches `right(valueCol)` as `outCol`. Left columns pass through. */
  def joinBackward(left: DataFrame, right: DataFrame, keyCol: String,
                   tsCol: String, valueCol: String, outCol: String): DataFrame = {
    val valueType = right.schema(valueCol).dataType
    // null keys take the unmatched fast path (a real join never matches
    // NULL = NULL; the window's partitionBy would group them together)
    val leftKeyed = left.where(col(keyCol).isNotNull)
    val leftNullKey = left.where(col(keyCol).isNull)
      .withColumn("__outval", lit(null).cast(valueType))
    val rightKeyed = right.where(col(keyCol).isNotNull)
    val lu = leftKeyed.select(
      col(keyCol).as("__key"), col(tsCol).as("__ts"), lit(1).as("__side"),
      lit(null).cast(valueType).as("__v"),
      struct(left.columns.map(col).toIndexedSeq: _*).as("__row"))
    val rowType = lu.schema("__row").dataType
    val ru = rightKeyed.select(
      col(keyCol).as("__key"), col(tsCol).as("__ts"), lit(0).as("__side"),
      col(valueCol).cast(valueType).as("__v"),
      lit(null).cast(rowType).as("__row"))
    val w = Window.partitionBy(col("__key"))
      .orderBy(col("__ts"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    lu.unionByName(ru)
      .withColumn("__asof", last(col("__v"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      .select(col("__row.*"), col("__asof").as(outCol))
      .unionByName(leftNullKey.withColumnRenamed("__outval", outCol))
  }
}
