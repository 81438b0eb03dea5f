package graft.io

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.util.Comparator

/** IO layer: schema-declared CSV scan (S2, ref `01_Feature
  * Engineering.py:62-65`), overwrite parquet sink (S3, `01:67-72` minus the
  * Delta transport), and the MERGE-equivalent upsert (S5, `03_Train & Deploy
  * Model.py:481-495`).
  *
  * Scale notes: the CSV reader keeps the schema explicit (no inference pass
  * over 100 TB); the upsert is a single left-outer join + left-anti join —
  * both shuffle on the merge key once, broadcastable when the source delta is
  * small, and the atomic swap never rewrites unmatched files' *content*
  * (row-identical output is verified in `IOSpec`).
  */
object IO {

  /** S2 — CSV scan with an explicitly declared schema, never inferred. */
  def readCsv(spark: SparkSession, path: String, schema: StructType,
              header: Boolean = true, sep: String = ","): DataFrame =
    spark.read.schema(schema).option("header", header.toString)
      .option("sep", sep).csv(path)

  /** S3 — overwrite sink. Parquet stands in for Delta (dependency absent
    * offline — SURVEY §7.6); `overwriteSchema` is implicit in a parquet
    * overwrite. */
  def writeOverwrite(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  /** Bucketed write: co-locate a table on its join key so repeated joins
    * and aggregations on that key skip the shuffle entirely (bucket
    * pruning + bucketed scan). Bucketing requires the catalog
    * (`saveAsTable`), not a bare path. At 100 TB this is the difference
    * between re-shuffling the fact table per query and shuffling once at
    * write time. */
  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
                    numBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(numBuckets, bucketCol).sortBy(bucketCol)
      .format("parquet").saveAsTable(table)

  /** S5 — MERGE-equivalent upsert, pure DataFrame ops.
    *
    * Semantics of `03:486-494`: `WHEN MATCHED UPDATE SET` only `updateCols`
    * (all other target columns retained byte-identical), `WHEN NOT MATCHED
    * INSERT *`. Implemented as one left-outer join (matched rows pick source
    * values for `updateCols`) plus one left-anti join (new source rows),
    * `unionByName`'d. Source side is broadcast when small (typical for an
    * incremental upsert against a large target).
    */
  def upsert(target: DataFrame, source: DataFrame,
             keys: Seq[String], updateCols: Seq[String],
             broadcastSource: Boolean = true): DataFrame = {
    val matchFlag = "__graft_matched"
    val src = source.withColumn(matchFlag, lit(1))
    // broadcast the DELTA side only, and only when the caller says it is
    // small (the default incremental-upsert shape); a bulk merge of two
    // large tables passes false and gets a shuffled hash join on the key
    val srcSide = if (broadcastSource) broadcast(src.as("s")) else src.as("s")
    val joined = target.as("t").join(
      srcSide,
      keys.map(k => col(s"t.$k") === col(s"s.$k")).reduce(_ && _),
      "left_outer")
    val updated = joined.select(target.columns.map { c =>
      if (updateCols.contains(c))
        when(col(matchFlag).isNotNull, col(s"s.$c")).otherwise(col(s"t.$c")).as(c)
      else col(s"t.$c").as(c)
    }.toSeq: _*)
    // No broadcast hint here: the anti-join's build side would be the TARGET
    // key set, which is the large table at scale (broadcasting it OOMs the
    // driver at 100 TB). Let the planner/AQE pick — with a small source and a
    // large target this resolves to a shuffled hash join keyed the same way
    // as the update join above, so the two passes share the exchange.
    val inserts = source.join(target.select(keys.map(col): _*), keys, "left_anti")
      .select(target.columns.map(col).toSeq: _*)
    updated.unionByName(inserts)
  }

  /** Path-level upsert with a tmp-dir swap.
    *
    * Durability contract (each `move` is metadata-only and atomic, but the
    * two-move *sequence* is not): a crash before the first move leaves the
    * original target untouched; a crash between the moves leaves the data
    * under `<target>.__graft_old`, and [[recoverPath]] (invoked here on
    * entry) restores it on the next call. There IS a window in which no
    * live `<target>` directory exists — concurrent readers must tolerate a
    * retry, which is why both reads in this method go through
    * [[recoverPath]]. Both paths must live on one filesystem
    * (`ATOMIC_MOVE` throws across mount points); a production deployment
    * on an object store would swap a manifest/table-catalog pointer
    * instead of a directory rename. */
  def upsertPath(spark: SparkSession, targetPath: String, source: DataFrame,
                 keys: Seq[String], updateCols: Seq[String]): Unit = {
    recoverPath(targetPath)
    val target = spark.read.parquet(targetPath)
    val merged = upsert(target, source, keys, updateCols)
    val tmp = targetPath + ".__graft_tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val tgt = Paths.get(targetPath)
    val old = Paths.get(targetPath + ".__graft_old")
    deleteRecursive(old)
    Files.move(tgt, old, StandardCopyOption.ATOMIC_MOVE)
    Files.move(Paths.get(tmp), tgt, StandardCopyOption.ATOMIC_MOVE)
    deleteRecursive(old)
  }

  /** Partition column used by the bucketed upsert store layout. */
  val BucketCol = "__graft_bucket"

  /** Deterministic bucket id for a row: pmod(xxhash64(keys), nBuckets).
    * Pure key arithmetic — any writer/reader computes the same bucket, so a
    * merge knows which partitions a source row can possibly live in. */
  def bucketExpr(keys: Seq[String], nBuckets: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(keys.map(col): _*), lit(nBuckets.toLong)).cast("int")

  /** Lay a store out partitioned by key-hash bucket
    * (`__graft_bucket=N/…`) so merges can prune to touched buckets. The
    * bucket count is persisted alongside the data ([[storeBuckets]]) —
    * merges MUST hash with the writer's count, never the caller's. */
  def writePartitionedStore(df: DataFrame, path: String, keys: Seq[String],
                            nBuckets: Int = 64): Unit = {
    // REBALANCE on the layout column before the partitionBy write: without
    // it every input task opens a writer in every bucket directory it has
    // a row for (tasks × nBuckets small files; measured 22 s for a 4k-row
    // store at 32 tasks × 64 buckets, and every later scan of the store
    // pays the file count again). With it AQE clusters rows by bucket into
    // a bounded task set — ~one file per bucket.
    df.withColumn(BucketCol, bucketExpr(keys, nBuckets))
      .hint("rebalance", col(BucketCol))
      .write.mode("overwrite").partitionBy(BucketCol).parquet(path)
    Files.writeString(Paths.get(path, "_graft_buckets"), nBuckets.toString)
  }

  /** The bucket count a partitioned store was written with. */
  def storeBuckets(path: String): Int = {
    val p = Paths.get(path, "_graft_buckets")
    require(Files.exists(p),
      s"$path is not a bucketed store (no _graft_buckets marker — " +
        "was it written by writePartitionedStore?)")
    Files.readString(p).trim.toInt
  }

  /** Read a partitioned store back without the layout column. */
  def readPartitionedStore(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path).drop(BucketCol)

  /** S5 at scale — partition-pruned MERGE. [[upsertPath]] rewrites the
    * whole store per merge (O(store)); an incremental pipeline merging a
    * small delta every batch needs O(delta). This variant:
    *
    *  1. buckets the source rows by key hash (same arithmetic as the store
    *     layout — ≤ `nBuckets` distinct values, so the driver-side collect
    *     of touched buckets is bounded and tiny);
    *  2. reads ONLY the touched buckets of the target (partition pruning on
    *     the `__graft_bucket=` directories);
    *  3. merges with the same WHEN MATCHED UPDATE / NOT MATCHED INSERT
    *     semantics as [[upsert]];
    *  4. writes back with DYNAMIC partition overwrite, which replaces only
    *     the partitions present in the merged frame — untouched buckets'
    *     files are never read, rewritten, or moved.
    *
    * The merged frame is locally checkpointed before the write (it is
    * small — touched buckets only) because a path cannot be overwritten
    * while the plan still scans it.
    *
    * Durability is WEAKER than [[upsertPath]]'s backup-and-swap: dynamic
    * overwrite replaces each touched partition through the file committer,
    * and a crash during the commit phase can lose a touched bucket's files
    * with no `.__graft_old` to recover from (untouched buckets are never
    * at risk). That is the price of not rewriting the store; a production
    * deployment on an object store gets atomicity back by swapping a
    * manifest/table-catalog pointer per merge instead of directories.
    *
    * Hashes with the count the store was WRITTEN with (persisted marker) —
    * a caller-supplied count that disagreed would read the wrong
    * partitions and re-insert keys it failed to find. */
  def upsertPartitionedStore(spark: SparkSession, targetPath: String,
                             source: DataFrame, keys: Seq[String],
                             updateCols: Seq[String]): Unit = {
    val nBuckets = storeBuckets(targetPath)
    val src = source.withColumn(BucketCol, bucketExpr(keys, nBuckets))
      .localCheckpoint()
    val touched = src.select(BucketCol).distinct().collect().map(_.getInt(0))
    val target = spark.read.parquet(targetPath)
      .where(col(BucketCol).isin(touched.toIndexedSeq: _*))
    // key join within a bucket only: rows agree on bucket by construction,
    // so the bucket column can ride through the merge as a plain column
    val merged = upsert(target, src, keys, updateCols).localCheckpoint()
    // same rebalance-before-partitionBy as writePartitionedStore: the
    // dynamic overwrite otherwise fans each task across every touched
    // bucket directory
    merged.hint("rebalance", col(BucketCol))
      .write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy(BucketCol).parquet(targetPath)
  }

  /** Crash recovery for [[upsertPath]]: if the target directory is missing
    * but the `.__graft_old` backup exists (crash between the two moves),
    * restore the backup. Idempotent; safe to call before any read of a
    * path that upsertPath manages. */
  def recoverPath(targetPath: String): Unit = {
    val tgt = Paths.get(targetPath)
    val old = Paths.get(targetPath + ".__graft_old")
    if (!Files.exists(tgt) && Files.exists(old))
      Files.move(old, tgt, StandardCopyOption.ATOMIC_MOVE)
  }

  /** Delete a path recursively (idempotent). Callers that own a scratch
    * store call this before first use so a leftover store from a prior
    * run (same deterministic path, different data) can't be silently
    * merged into. */
  def deletePath(path: String): Unit = deleteRecursive(Paths.get(path))

  private def deleteRecursive(p: Path): Unit =
    if (Files.exists(p))
      Files.walk(p).sorted(Comparator.reverseOrder[Path]()).forEach(f => Files.delete(f))
}
