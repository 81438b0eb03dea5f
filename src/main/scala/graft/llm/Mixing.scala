package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-mixing operators for assembling a training corpus from curated
  * sources: deterministic per-stratum downsampling (the "sample src_web at
  * 10%, src_books at 100%" step of a data recipe) and greedy token-budget
  * packing (grouping documents into fixed-capacity training sequences).
  * Both are engine-reproducible — no RNG state, so a re-run over the same
  * corpus selects the same rows on any cluster size.
  */
object Mixing {

  /** Hex cutoff for a keep-rate: a row survives iff the first 8 hex chars
    * of md5(id) — a uniform 32-bit value in hex — compare lexicographically
    * below the cutoff. Lowercase-hex string order equals numeric order, so
    * the comparison needs no 64-bit arithmetic and mirrors 1:1 into any SQL
    * engine with md5(). */
  def rateCutoffHex(rate: Double): String = {
    require(rate >= 0.0 && rate < 1.0, s"cutoff undefined for rate $rate")
    f"${(rate * 4294967296.0).toLong.min(4294967295L)}%08x"
  }

  /** Deterministic stratified sampling: keep each row with probability
    * `rates(stratum)` (else `defaultRate`), decided by hashing the row's id
    * — not by `rand()`. Sampling is a pure, codegen'd projection + filter:
    * at 100 TB it runs at parquet-scan speed with zero shuffle, survives
    * retries/re-runs bit-identically, and composes with pushdown (the
    * filter reaches the scan). Rate 1.0 short-circuits to `true`. */
  def hashSample(df: DataFrame, idCol: String, strataCol: String,
                 rates: Seq[(String, Double)], defaultRate: Double): DataFrame = {
    val bucket = substring(md5(col(idCol).cast("string")), 1, 8)
    def keep(rate: Double) =
      if (rate >= 1.0) lit(true) else bucket < lit(rateCutoffHex(rate))
    val cond = rates.foldRight(keep(defaultRate)) { case ((stratum, rate), els) =>
      when(col(strataCol) === stratum, keep(rate)).otherwise(els)
    }
    df.where(cond)
  }

  /** Greedy token-budget packing: within each (group, shard), ordered by
    * id, append documents to the current bin while they fit in `capacity`
    * tokens; a document that would overflow starts the next bin (so an
    * oversized document never shares a bin with a predecessor, even a
    * zero-size one). Null sizes count as 0. Returns
    * (group, shard, id, size, bin); bin identity is (group, shard, bin).
    *
    * The running-total-with-reset recurrence is inherently sequential, so
    * it cannot be a window function — but it only needs to be sequential
    * within one packing unit, and bins carry no cross-bin ordering
    * semantics. `shards` is the parallelism lever at scale: shard 1 packs
    * one sequence per group (parallelism = number of sources — fine when
    * sources are many); at 100 TB with few huge sources, shard by a
    * deterministic id hash so each group splits into `shards` independent
    * packing units. The plan is one shuffle (repartition by group+shard), a
    * sort-within-partitions, and a single imperative pass per partition. */
  def packBins(df: DataFrame, groupCol: String, idCol: String,
               sizeCol: String, capacity: Long, shards: Int = 1): DataFrame = {
    require(capacity > 0, s"capacity must be positive; got $capacity")
    require(shards >= 1, s"shards must be >= 1; got $shards")
    val spark = df.sparkSession
    import spark.implicits._
    val in = df.select(col(groupCol).cast("string").as("group"),
        pmod(xxhash64(col(idCol)), lit(shards.toLong)).as("shard"),
        col(idCol).cast("long").as("id"),
        coalesce(col(sizeCol).cast("long"), lit(0L)).as("size"))
      .as[(String, Long, Long, Long)]
      .repartition(col("group"), col("shard"))
      .sortWithinPartitions(col("group"), col("shard"), col("id"))
    in.mapPartitions { rows =>
      var started = false
      var group: String = null
      var shard = -1L
      var fill = 0L
      var bin = 0L
      rows.map { case (g, sh, id, size) =>
        if (!started || g != group || sh != shard) {
          started = true; group = g; shard = sh; bin = 0L; fill = size
        } else if (fill + size > capacity) { bin += 1L; fill = size }
        else fill += size
        (g, sh, id, size, bin)
      }
    }.toDF("group", "shard", "id", "size", "bin")
  }

  /** Deterministic seeded global shuffle + sharding — the training-export
    * ordering step: every epoch's data order must be reproducible (resume
    * after preemption, compare runs), so the "shuffle" is a pure function
    * of (seed, id), not RNG state. Each row gets an order key
    * md5(seed:id); the first two hex chars (a uniform byte) pick the
    * shard, and the row's position is its rank within the shard by key.
    *
    * Scale shape: NO global sort — the only wide operation is the
    * per-shard window (one hash Exchange on shard + per-partition sort),
    * so the plan parallelizes across shards however large the corpus; a
    * writer then streams each shard in key order. Shard counts that don't
    * divide 256 get a ≤1/256 occupancy tilt — negligible, documented.
    * The hex→int arithmetic uses ascii() only, so the same formula (and
    * therefore the same assignment) is expressible in any SQL engine. */
  def shuffleShards(df: DataFrame, idCol: String, seed: String,
                    nShards: Int): DataFrame = {
    require(nShards >= 1 && nShards <= 256,
      s"nShards must be in [1, 256] (one uniform byte picks the shard); got $nShards")
    import org.apache.spark.sql.expressions.Window
    def hexVal(c: org.apache.spark.sql.Column) = {
      val a = ascii(c) // '0'..'9' → 48..57, 'a'..'f' → 97..102
      a - lit(48) - when(a >= 97, lit(39)).otherwise(lit(0))
    }
    val keyed = df.select(col(idCol),
      md5(concat(lit(seed + ":"), col(idCol).cast("string"))).as("ord_key"))
    val sharded = keyed.withColumn("shard",
      pmod(hexVal(substring(col("ord_key"), 1, 1)) * lit(16)
        + hexVal(substring(col("ord_key"), 2, 1)), lit(nShards)))
    sharded.withColumn("pos", row_number().over(
      Window.partitionBy("shard").orderBy(col("ord_key"), col(idCol))))
  }

  /** Materialize the training export: the [[shuffleShards]] order written
    * as shard-partitioned parquet, each shard's file(s) physically sorted
    * by position — what a training loader streams sequentially per worker.
    *
    * Plan shape: ONE hash repartition on shard + sort-within-partitions;
    * a shard's rows hash to exactly one partition, so each shard directory
    * is written by a single task in position order (the writer splits a
    * partition's row stream across shard dirs without reordering it). No
    * global sort anywhere; shards are the parallelism unit for both the
    * write and the eventual read. */
  def writeTrainingShards(df: DataFrame, idCol: String, seed: String,
                          nShards: Int, path: String): Unit =
    shuffleShards(df, idCol, seed, nShards)
      // the md5 order key is encoded in pos; don't persist 32 bytes/row
      .drop("ord_key")
      .join(df, Seq(idCol))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("pos"))
      .write.mode("overwrite").partitionBy("shard").parquet(path)

  /** Per-stratum cap sampling — "keep at most `k` documents per source",
    * the source-balancing step that stops one over-crawled domain from
    * dominating a data recipe. Selection is deterministic: the `k` rows
    * with the smallest md5(seed:id) per stratum, so re-runs (and sibling
    * engines) pick the identical set.
    *
    * Scale shape — the naive formulation (row_number per stratum over
    * everything) serializes each stratum through one reducer: a 50 TB
    * source becomes a single-task sort. Instead, two phases:
    * 1. one aggregation counts each stratum (tiny result, broadcast), and
    *    a hash PREFILTER keeps each row iff its 32-bit key fraction <
    *    margin·k/n — a scan-side filter that cuts a stratum of any size
    *    down to ~margin·k expected survivors with no shuffle of the
    *    corpus;
    * 2. the exact top-k window then runs on the ~margin·k survivors per
    *    stratum — bounded work per reducer regardless of stratum size.
    * The prefilter keeps the SMALLEST-hash rows, i.e. a superset of the
    * true top-k unless fewer than k of the margin·k+16 expected survivors
    * land under the cutoff — a Chernoff-tail event (p ≤ e^-16 for every
    * k ≥ 1; the +16 cushion is what keeps quota-1 strata safe, see
    * capWithQuotas); the correctness gate exact-compares against the
    * full-window oracle, so any such miss is caught, not silent. Strata
    * smaller than margin·k+16 skip the prefilter entirely (rate clamps
    * to 1). */
  def capPerStratum(df: DataFrame, stratumCol: String, idCol: String, k: Int,
                    seed: String, margin: Double = 4.0): DataFrame = {
    require(k >= 1, s"k must be >= 1; got $k")
    val quotas = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__k", lit(k.toLong))
    capWithQuotas(df, stratumCol, idCol, quotas, seed, margin)
  }

  /** Temperature-scaled mixture sampling — the "flatten the source
    * distribution" step of a data recipe (sample source s with probability
    * ∝ n_s^α, α<1 upweighting small sources relative to their corpus
    * share; α=0.5 is the common temperature-2 recipe). Each source gets an
    * integer quota ⌊budget·w_s/Σw⌋ with w_s=⌊√n_s⌋, capped at n_s (no
    * replacement), filled with the quota smallest md5(seed:id) hashes.
    *
    * Engine-reproducibility is designed in: weights and quotas are BIGINT
    * arithmetic end to end (⌊√n⌋ via IEEE-correctly-rounded sqrt, integer
    * sum, integer floor-division), so quota values are bit-identical in
    * any engine and independent of aggregation order — no
    * floating-normalizer ulp hazard at the floor() boundary. A source
    * whose share ⌊budget·w_s/Σw⌋ rounds to 0 is dropped (documented; give
    * it a floor by raising `budget`). Selection then runs through the same
    * two-phase prefilter+window machinery as [[capPerStratum]] — bounded
    * work per reducer however large a source is. */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
                        budget: Long, seed: String,
                        margin: Double = 4.0): DataFrame = {
    require(budget >= 1, s"budget must be >= 1; got $budget")
    val w = df.groupBy(col(stratumCol)).agg(count(lit(1)).as("__n"))
      .withColumn("__w", floor(sqrt(col("__n").cast("double"))).cast("long"))
    val sumw = w.agg(sum("__w").as("__sw"))
    val quotas = w.crossJoin(broadcast(sumw))
      .withColumn("__k", least(expr(s"($budget * __w) div __sw"), col("__n")))
      .select(col(stratumCol), col("__n"), col("__k"))
    capWithQuotas(df, stratumCol, idCol, quotas, seed, margin)
  }

  /** Shared two-phase per-stratum top-k selection: `quotas` carries one
    * row per stratum with its size `__n` and quota `__k`. Phase 1 is the
    * scan-side hash prefilter at rate min(1, margin·k/n) (see
    * [[capPerStratum]] for the recall argument); phase 2 the exact
    * top-k window over the bounded survivors. */
  private def capWithQuotas(df: DataFrame, stratumCol: String, idCol: String,
                            quotas: DataFrame, seed: String,
                            margin: Double): DataFrame = {
    require(margin >= 2.0, s"margin < 2 makes the prefilter lossy; got $margin")
    import org.apache.spark.sql.expressions.Window
    // rate = min(1, (margin·k + 16)/n): the additive +16 cushion keeps the
    // expected survivor count ≥ margin·k + 16 even when k is tiny — a bare
    // margin·k/n rate at k=1 leaves ~e^-margin (≈2% at margin 4) odds that
    // NO row of the stratum lands under the cutoff and a quota-1 stratum
    // silently contributes nothing; with the cushion the tail is
    // P(X < k) ≤ e^-16 for every k ≥ 1 (Chernoff), at the cost of ≤16
    // extra survivors per stratum through the window
    val rates = quotas
      .withColumn("__rate", least(lit(1.0),
        (lit(margin) * col("__k").cast("double") + lit(16.0)) / col("__n")))
      .withColumn("__cutoff", lower(lpad(hex(
        floor(col("__rate") * lit(4294967296.0)).cast("long")), 8, "0")))
      .select(col(stratumCol), col("__k"), col("__rate"), col("__cutoff"))
    val keyed = df.withColumn("__ord",
      md5(concat(lit(seed + ":"), col(idCol).cast("string"))))
    // null-safe join: NULL is a stratum like any other (groupBy already
    // counted it as one, and SQL window PARTITION BY groups it) — a plain
    // equi-join would silently drop every NULL-stratum row between the
    // quota computation and the selection
    val survivors = keyed.as("d")
      .join(broadcast(rates.as("r")),
        col(s"d.$stratumCol") <=> col(s"r.$stratumCol"))
      .drop(col(s"r.$stratumCol"))
      .where(col("__rate") >= 1.0 ||
        substring(col("__ord"), 1, 8) < col("__cutoff"))
    survivors.withColumn("__rk", row_number().over(
        Window.partitionBy(stratumCol).orderBy(col("__ord"), col(idCol))))
      .where(col("__rk") <= col("__k"))
      .drop("__ord", "__rate", "__cutoff", "__rk", "__k", "__n")
  }
}
