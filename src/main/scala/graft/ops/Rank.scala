package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable global ranking and the sorted-neighborhood blocking method
  * built on it.
  *
  * A bare `row_number() OVER (ORDER BY …)` funnels the whole dataset
  * through ONE task (Spark warns and then does it anyway) — the
  * single-partition chokepoint this engine bans. [[globalRowNumber]] is
  * the standard scalable recipe instead: range-repartition on the sort
  * key (the same machinery a global `orderBy` uses), rank WITHIN each
  * partition (a keyed window — parallel), then add per-partition row
  * counts as broadcast offsets. The ranked frame is materialized ONCE
  * (localCheckpoint) and both the count job and every downstream
  * consumer read the same blocks; a tiny count aggregate is the only
  * extra job. No stage ever sees more than its own partition.
  *
  * Determinism: the caller's sort key must be made total (pass a
  * tie-breaker column); with a total order the assigned ranks are
  * independent of partition-boundary placement. The single
  * materialization is REQUIRED for correctness, not a cache hint:
  * RangePartitioner's boundary sample is seeded by the RDD id, so two
  * separate executions of the same range exchange can place the
  * boundaries differently — re-deriving the frame for the count and
  * again for the consumer would apply one job's offsets to the other
  * job's partition layout (observed: non-permutation ranks and a
  * run-to-run-varying pair count at 4 shuffle partitions).
  *
  * Reliability trade-off of `localCheckpoint`: its blocks are
  * executor-local and non-replicated, and the lineage is truncated — on
  * a real cluster an executor loss after the checkpoint fails every
  * downstream consumer of the ranked frame unrecoverably (there is no
  * plan left to recompute from). That is the price of the mandatory
  * single materialization; a deployment that must survive executor loss
  * swaps in a reliable `checkpoint()` (HDFS-replicated, same semantics,
  * one extra write+read) or derives positions from
  * `RDD.zipWithIndex`-style counting over a reliably-persisted sort.
  */
object Rank {

  /** Dense global 1-based row numbers under `ORDER BY sortCols` (which
    * must be a total order — include a tie-breaker). Adds `rn`.
    *
    * Within-partition positions come from `monotonically_increasing_id`
    * over the range-partitioned, partition-sorted frame — its encoding is
    * (partition id << 33 | local index), with local indexes following the
    * sorted order, so pid and position decode with bit ops and NO window
    * runs at all: the whole rank is the range exchange plus a
    * partition-count aggregate whose output is bounded by the partition
    * count (asserted single-Exchange in BreadthSpec). A keyed-window
    * formulation here would force a SECOND full shuffle (hash on pid)
    * because spark_partition_id() doesn't advertise the range
    * partitioning to the window's distribution requirement. */
  def globalRowNumber(df: DataFrame, sortCols: Seq[String],
                      nPartitions: Int = 0): DataFrame = {
    val cols = sortCols.map(col)
    val n = if (nPartitions > 0) nPartitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    // ONE materialization (see class doc: the range boundaries are not
    // reproducible across executions — the count job and the consumer
    // MUST read the same physical partitioning)
    val indexed = df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("_mid", monotonically_increasing_id())
      .localCheckpoint()
    // per-partition counts to the driver: bounded by the partition count,
    // never by the data
    val counts = indexed
      .groupBy(shiftright(col("_mid"), 33).as("_pid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val cum = { // offset of pid = rows in all partitions before it
      var acc = 0L
      counts.map { case (pid, c) => val o = acc; acc += c; pid -> o }.toMap
    }
    // offsets as a MAP LITERAL, not a UDF: element_at stays inside
    // whole-stage codegen, so the rank projection never leaves the
    // generated loop (a UDF here would box every row for one lookup)
    val offsets = typedLit(cum)
    indexed
      .withColumn("rn",
        coalesce(element_at(offsets, shiftright(col("_mid"), 33)), lit(0L))
          + (col("_mid").bitwiseAND(lit((1L << 33) - 1))) + 1L)
      .drop("_mid")
  }

  /** Sorted-neighborhood blocking (Hernández & Stolfo): sort records by a
    * blocking key and emit every pair within a sliding window of `w`
    * consecutive positions — the classic linear-candidate alternative to
    * LSH when a meaningful sort key exists (typo-heavy keys sort apart;
    * compose with [[EditDistance]] / LSH passes, as multi-pass SNM does).
    *
    * Scalable shape: global positions via [[globalRowNumber]] (no
    * single-partition stage), then every pair within `w-1` positions is
    * found by an EQUI-join on position buckets of width `w-1` (each row
    * lands in its own bucket and the next; any pair within the window
    * shares one) — candidates stream through a hash join, never a range
    * theta-join. Output: `(idA, idB, gap)` with `idA` sorting before
    * `idB` and `0 < gap < w`. */
  def sortedNeighborhoodPairs(df: DataFrame, idCol: String, keyCol: String,
                              w: Int): DataFrame = {
    require(w >= 2, "window must cover at least adjacent pairs")
    val ranked = globalRowNumber(
      df.select(col(idCol).as("id"), col(keyCol).as("k")),
      Seq("k", "id")).select(col("id"), col("rn"))
    val span = (w - 1).toLong
    val a = ranked.select(col("id").as("idA"), col("rn").as("rnA"),
      explode(array(floor(col("rn") / span),
        floor(col("rn") / span) + 1)).as("bucket"))
    val b = ranked.select(col("id").as("idB"), col("rn").as("rnB"),
      floor(col("rn") / span).as("bucket"))
    // a pair within the window matches in exactly one bucket (b carries
    // one bucket, a carries two distinct ones) — no dedup needed
    a.join(b, Seq("bucket"))
      .where((col("rnB") - col("rnA")).between(1, span))
      .select(col("idA"), col("idB"), (col("rnB") - col("rnA")).as("gap"))
  }
}
