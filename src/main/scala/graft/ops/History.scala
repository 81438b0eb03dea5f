package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (Type 2) history build — turn an append-only
  * change log into versioned validity intervals: one row per run of equal
  * attribute values per key, with `valid_from` / `valid_to` (next run's
  * start, NULL while current) and an `is_current` flag. The standard
  * warehouse shape for "what was this entity's state at time T" queries,
  * answered downstream by an as-of join ([[AsOf]]) against the intervals.
  *
  * Formulated as gaps-and-islands over ONE key-partitioned sort: lag
  * detects value changes, a running sum numbers the runs (islands), a
  * grouped min collapses each run, lead closes the intervals. Every
  * window and the aggregation partition by the same entity key, so the
  * whole history builds in a SINGLE hash exchange — Catalyst reuses the
  * key partitioning for the (key, island) group because clustering by a
  * key subset already co-locates it (asserted in BreadthSpec). At scale
  * that is the floor: one shuffle of the change log, linear in changes,
  * per-key sequential work bounded by that key's own history (a
  * pathologically hot entity serializes through one task — the same
  * bound as any keyed window; pre-collapse unchanged rows upstream if a
  * key dominates).
  *
  * Ordering within a key follows (`tsCol`, `tieCol`) — the tie column
  * makes same-timestamp changes deterministic.
  */
object History {

  /** Batch sessionization — the gaps-and-islands sibling of [[scd2]]: a
    * new session starts when the gap to the key's previous event exceeds
    * `gapSeconds`. Same single-exchange shape (all windows and the
    * session collapse key on the entity); the streaming engine's
    * stateful counterpart lives in `streaming.EventStreams.sessionize`.
    * Returns one row per session: start, end, event count. */
  def sessionize(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
                 gapSeconds: Long): DataFrame = {
    val ordered = Window.partitionBy(keyCol).orderBy(col(tsCol), col(tieCol))
    df
      .withColumn("_prev", lag(col(tsCol), 1).over(ordered))
      .withColumn("_new",
        // gap compare in exact integer MICROSECONDS (the fixtures carry
        // sub-second event times; truncating to seconds would flip
        // boundary gaps against any exact-arithmetic oracle). The
        // timestamp hop makes TIMESTAMP_NTZ inputs unix_micros-able and
        // is a no-op for LTZ.
        when(col("_prev").isNull ||
          unix_micros(col(tsCol).cast("timestamp"))
            - unix_micros(col("_prev").cast("timestamp")) > gapSeconds * 1000000L, 1)
          .otherwise(0))
      .withColumn("session", sum(col("_new")).over(ordered))
      .groupBy(col(keyCol), col("session"))
      .agg(min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
  }

  def scd2(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
           valueCol: String): DataFrame = {
    val byKey = Window.partitionBy(keyCol)
    val ordered = byKey.orderBy(col(tsCol), col(tieCol))
    val runs = df
      .withColumn("chg",
        when(lag(col(valueCol), 1).over(ordered).isNull ||
             lag(col(valueCol), 1).over(ordered) =!= col(valueCol), 1)
          .otherwise(0))
      // running change count = island number (rows-unbounded-preceding
      // frame, the default for an ordered window aggregate)
      .withColumn("island", sum(col("chg")).over(ordered))
    val collapsed = runs.groupBy(col(keyCol), col("island"))
      .agg(min(col(valueCol)).as("value"),       // constant within a run
        min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_rows"))
    val byIsland = byKey.orderBy(col("island"))
    collapsed
      .withColumn("valid_to", lead(col("valid_from"), 1).over(byIsland))
      .withColumn("is_current", col("valid_to").isNull)
      .select(col(keyCol), col("value"), col("valid_from"), col("valid_to"),
        col("is_current"), col("n_rows"))
  }
}
