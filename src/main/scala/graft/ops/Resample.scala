package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Regular-grid resampling with backward fill — the gap-filling operator
  * event analytics runs before aligning irregular series (sensor reads,
  * price ticks, user activity) for joins or model features: for each key,
  * emit one row per grid instant spanning [trunc(min ts), trunc(max ts)]
  * and carry the most recent observation at-or-before that instant.
  *
  * Composed from existing primitives, each already scale-audited: the
  * per-key span is one aggregate; the grid is a scan-side generator
  * (`sequence` + `explode` — rows multiply, bytes don't shuffle); the fill
  * is [[AsOf.joinBackward]] (ONE hash shuffle + sort, linear in
  * |grid|+|events|). Nothing here is quadratic in the grid or the events.
  *
  * Grid instants before a key's first observation fill with NULL
  * (standard leading-gap semantics — there is nothing to carry). Ties at
  * one (key, ts) are pre-aggregated with max so the as-of carry is
  * deterministic. NULL-valued events are NOT observations: they are
  * dropped before the carry (they still anchor the key's grid span), so
  * the fill always carries the last real value — this also satisfies
  * [[AsOf.joinBackward]]'s non-null valueCol contract, whose
  * ignoreNulls carry would otherwise silently skip a NULL observation in
  * favor of an older value.
  */
object Resample {

  /** Resample `events` per `keyCol` onto a `truncUnit` grid ("minute",
    * "hour", "day"), carrying `valueCol` backward as `ffill_<valueCol>`. */
  def resampleFfill(events: DataFrame, keyCol: String, tsCol: String,
                    valueCol: String, truncUnit: String = "hour"): DataFrame = {
    require(Set("minute", "hour", "day").contains(truncUnit),
      s"unsupported grid unit: $truncUnit")
    val spans = events.groupBy(col(keyCol)).agg(
      date_trunc(truncUnit, min(col(tsCol))).as("__t0"),
      date_trunc(truncUnit, max(col(tsCol))).as("__t1"))
    val grid = spans.select(col(keyCol),
      explode(sequence(col("__t0"), col("__t1"),
        expr(s"INTERVAL 1 $truncUnit"))).as(tsCol))
    val uniq = events.where(col(valueCol).isNotNull)
      .groupBy(col(keyCol), col(tsCol))
      .agg(max(col(valueCol)).as(valueCol))
    AsOf.joinBackward(grid, uniq, keyCol, tsCol, valueCol, s"ffill_$valueCol")
  }
}
