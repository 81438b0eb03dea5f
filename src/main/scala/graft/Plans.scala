package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Dump `explain("formatted")` for representative queries → PLANS.md.
  * The plan shapes these document are enforced by PlanAuditSpec; this file
  * is the human-readable audit trail. */
object Plans {
  val picks: Seq[(String, String)] = Seq(
    "p5_filter" -> "predicate pushdown reaches the parquet scan (PushedFilters)",
    "s4_table_scan" -> "column pruning (ReadSchema carries only projected columns)",
    "j1_threeway_join" -> "dimension joins stay BroadcastHashJoin, no sort-merge",
    "w1_class_ratio" -> "global ratio as agg+broadcast — no single-partition Window",
    "u1_union_all" -> "union is a bag concat — zero Exchange",
    "p9_limit" -> "ordered limit collapses to TakeOrderedAndProject (top-k)",
    "x1_sqdist" -> "SqDist runs inside WholeStageCodegen — no ScalaUDF/BatchEval",
    "dd_ngram_jaccard" -> "near-dup as shingle equi-join + count agg — no cartesian",
    "ann_brute_topk" -> "broadcast query side; per-query top-k via ranked window",
    "dd_minhash" -> "banded signature equi-join; 16-byte rows through the distinct",
    "j7_asof_join" -> "as-of join as union + keyed window — ONE exchange, no range join",
    "j8_range_band" -> "interval table broadcast; fact side streams through BNL join",
    "s7_partition_pruned" -> "partition filter prunes to one directory before the scan",
    "a11_weighted_mean" -> "custom UDAF runs partial/final HashAggregate (map-side combine)",
    "x4_exists_subquery" -> "correlated EXISTS/NOT EXISTS decorrelated to semi/anti joins",
    "dd_curate" -> "curation gates in one projection; only survivors reach dedup shuffles",
    "tx_mixture" -> "deterministic sampling is a scan-side filter — zero Exchange, zero UDF",
    "dd_decontam" -> "benchmark shingle side broadcasts; contamination check runs map-side",
    "tx_pack" -> "packing = one Exchange on group + sort-within-partitions + one sequential pass",
    "tx_chunk" -> "chunking is a scan-side generator (sequence → posexplode → substr), no shuffle",
    "ann_quantize" -> "quantization is a one-pass projection — no shuffle, 4× smaller at rest",
    "dd_boilerplate" -> "gram df aggregates on an 8-byte hash; hot set joins back, no all-pairs",
    "ann_ivf_store" -> "IVF store scan prunes to probed cell partitions; centroids/probes broadcast",
    "ann_ivfpq_store" -> "IVF-PQ serve: scan reads ONLY probed cells' code rows (quantizers load via one bounded collect, never in the per-batch plan); ADC shortlist windows on codes, full-precision floats join back to refine*k survivors only",
    "tx_pii_scrub" -> "PII redaction is a scan-side codegen projection — zero shuffle, zero UDF",
    "tx_unigram_lp" -> "vocab agg partial-combines on token; scoring re-join broadcasts the vocab",
    "tx_shuffle_shard" -> "export shuffle = ONE hash Exchange on shard + per-shard sort; no global sort",
    "tx_cap_sample" -> "per-stratum cap: broadcast counts drive a scan-side prefilter; window sees ~margin*k rows",
    "tx_source_kl" -> "KL report: partial-combining aggs over one exploded pass; vocab re-joins broadcast",
    "dd_substring" -> "substring spans: window-frequency agg + hot join on 8-byte hashes; island window per doc — no cartesian, no global sort",
    "tx_temperature_mix" -> "temperature mix: integer quotas broadcast to a scan-side prefilter; per-source window on bounded survivors",
    "dd_bloom_decontam" -> "bloom decontam: map-side Bloom screen, exact shingle join confirms suspects only",
    "tx_vocab" -> "vocab report: token-count agg partial-combines; top-k via TakeOrdered; rank window sees only k rows",
    "tx_quality_model" -> "quality-model features: ten signals in ONE fused projection chain — no joins between signal frames",
    "ann_cluster_report" -> "cluster report: centroids broadcast, assignment map-side; the only exchange carries nCells rows",
    "tx_bigram_lp" -> "bigram LM: prev token by array index (no lag window); count tables partial-combine and join vocab-sized",
    "tx_export_shards" -> "export writer: ONE hash exchange on shard + sort-within-partitions — every shard dir written in position order",
    "x7_lateral_topk" -> "correlated LATERAL LIMIT decorrelated to a ranked window + equi-join — executed once, no per-row subquery",
    "f8_hashing_tf_counts" -> "vector invariants via the one-pass vec_stats kernel (O(nnz) over the sparse layout) — no vector_to_array densify of the 2^18-dim space",
    "ann_range_search" -> "radius search: broadcast query side + codegen cosine filter — zero Exchange (a filter, not a rank: not even a window)",
    "ann_knn_graph" -> "corpus k-NN graph: per-node probes equi-join cell members on the cell key — never a corpus broadcast, never all-pairs",
    "tx_normalize" -> "normalization is ONE codegen projection (native NFC expression + regex chain) — zero shuffle, zero UDF",
    "dd_segment" -> "segment dedup: window keyed on segment text + one doc-keyed reassembly agg — two linear exchanges, no cartesian",
    "dd_semantic_decontam" -> "semantic decontam: benchmark side broadcasts; corpus screened map-side through the codegen cosine kernel",
    "j9_edit_join" -> "edit-distance join: deletion-neighborhood EQUI-join on an 8-byte signature hash — never an all-pairs theta join",
    "j10_sorted_neighborhood" -> "sorted-neighborhood blocking: ONE checkpointed range exchange for the global rank (positions decode from monotonically_increasing_id — zero Window nodes; single materialization is REQUIRED, boundary samples are not reproducible across executions), pairs via a position-bucket equi-join",
    "w4_scd2" -> "SCD2 history: every window and the run collapse key on the entity — the whole build is ONE hash exchange",
    "s12_change_feed" -> "CDC diff: both sides scan ONLY the buckets whose manifest entry changed (file-list pruning before the plan); one key-keyed full-outer join, image structs compared null-safe, events explode scan-side",
    "s13_zorder_layout" -> "Z-order re-layout: width_bucket codes + Morton shift/mask interleave all codegen in one projection; the only exchange is the RangePartitioning on the Z-value",
    "j11_jaro_winkler" -> "Jaro-Winkler via the native codegen expression inside the residue equi-join projection — no ScalaUDF, no cartesian",
    "j12_bucketed_range" -> "bucketed range join: grid EQUI-join with scan-side interval explode + residual bound filter — no broadcast nested loop",
    "dq_profile" -> "column profile: ONE aggregation pass, all metrics partial-combine; the documented exact-distinct Expand is the only widening",
    "tx_bm25" -> "BM25: per-term tf is a scan-side projection (no token explode); N/avgdl/df partial-combine to ONE broadcast row — two scans, zero wide exchanges",
    "tx_rrf_fusion" -> "hybrid RRF: both rank lists are top-m bounded by their producers (TakeOrdered / per-query window), so the fusion exchange carries <= 2m tiny rows")

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan audit of representative queries\n\n")
    sb.append("Generated by `graft.Plans` at " + dir + "; shapes asserted in " +
      "`PlanAuditSpec`/`BlockingSpec`/`SqDistSpec`. Regenerate with " +
      "`sbt \"runMain graft.Plans\"`.\n")
    // several registered queries serve memoized checkpoints (shared across
    // sibling queries) or emit one-row contract frames; the audit wants the
    // underlying operator chain, so those picks are re-built raw here.
    // rawPlans also stops Dedup.releasing from checkpointing mid-operator.
    sys.props("graft.audit.rawPlans") = "true"
    val overrides: Map[String, (SparkSession, String) => org.apache.spark.sql.DataFrame] = Map(
      "dd_curate" -> ((s, d) => graft.queries.LlmQueries.buildCurated(s, d)
        .select("doc_id", "alnum_tokens")),
      "dd_ngram_jaccard" -> ((s, d) => graft.llm.Dedup.jaccardPairs(
        graft.Tables.documents(s, d), n = 3, threshold = 0.35)),
      "dd_minhash" -> ((s, d) => graft.llm.Dedup.minhashPairs(
        graft.Tables.documents(s, d), threshold = 0.35)),
      "dd_boilerplate" -> ((s, d) => graft.llm.Dedup.boilerplateStats(
        graft.Tables.documents(s, d), n = 3, minDf = 3)),
      "ann_brute_topk" -> ((s, d) => {
        val emb = graft.Tables.embeddings(s, d)
        graft.llm.Ann.bruteTopK(emb, emb.where("vec_id < 8"), k = 10)
      }),
      "ann_ivf_store" -> ((s, d) => {
        val emb = graft.Tables.embeddings(s, d)
        val path = "/root/repo/target/qtmp/plans_ivf_store"
        graft.io.IO.deletePath(path)
        graft.llm.Ann.writeIvfStore(emb, path)
        graft.llm.Ann.ivfStoreTopK(s, path, emb.where("vec_id < 8"), k = 10)
      }),
      "ann_ivfpq_store" -> ((s, d) => {
        val emb = graft.Tables.embeddings(s, d)
        val path = "/root/repo/target/qtmp/plans_ivfpq_store"
        graft.io.IO.deletePath(path)
        graft.llm.Ann.writeIvfPqStore(emb, path)
        graft.llm.Ann.ivfPqStoreTopK(s, path, emb.where("vec_id < 8"), k = 10,
          refineFrom = Some(emb))
      }),
      "ann_knn_graph" -> ((s, d) =>
        graft.llm.Ann.knnGraph(graft.Tables.embeddings(s, d), k = 10)),
      // contract frames hide the operator; audit the underlying chains
      "tx_quality_model" -> ((s, d) => graft.llm.QualityModel.features(
        graft.Tables.documents(s, d), "text", keep = Seq.empty)),
      "ann_cluster_report" -> ((s, d) => graft.llm.Ann.clusterReport(
        graft.Tables.embeddings(s, d))),
      // the registered query builds the store AND reads the feed; audit the
      // feed plan alone on a prepared store (scan pruning is the point)
      "s12_change_feed" -> ((s, d) => {
        import s.implicits._
        val path = "/root/repo/target/qtmp/plans_cdc_store"
        graft.io.IO.deletePath(path)
        graft.io.IO.writePartitionedStore(
          (1 to 64).map(i => (i.toLong, i.toDouble)).toDF("id", "v"),
          path, Seq("id"), nBuckets = 8)
        graft.io.IO.upsertPartitionedStore(s, path,
          Seq((3L, 300.0), (500L, 5.0)).toDF("id", "v"), Seq("id"), Seq("v"))
        graft.io.IO.storeChangeFeed(s, path, 1, 2, Seq("id"))
      }),
      // the contract frame hides the layout op; audit the exact frame
      // zorderWrite writes (one definition — Layout.zorderFrame)
      "s13_zorder_layout" -> ((s, d) =>
        graft.ops.Layout.zorderFrame(
          graft.Tables.lineitem(s, d).select("l_partkey", "l_suppkey", "l_orderkey"),
          Seq("l_partkey", "l_suppkey"), nFiles = 16, bits = 10)),
      // the writer is an action; audit the frame it writes
      "tx_export_shards" -> ((s, d) => {
        val docs = graft.Tables.documents(s, d)
        graft.llm.Mixing.shuffleShards(docs, "doc_id", "train42", 8)
          .join(docs, Seq("doc_id"))
          .repartition(8, org.apache.spark.sql.functions.col("shard"))
          .sortWithinPartitions(org.apache.spark.sql.functions.col("shard"),
            org.apache.spark.sql.functions.col("pos"))
      }))
    try {
      picks.foreach { case (name, why) =>
        val df = overrides.getOrElse(name, SparkEntry.queries(name))(spark, dir)
        sb.append(s"\n## $name — $why\n\n```\n")
        sb.append(df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).trim)
        sb.append("\n```\n")
      }
    } finally sys.props.remove("graft.audit.rawPlans") // never leaks past the audit
    sb.append(
      """
        |## Partitioned-store protocol (io.IO) — the table-format audit
        |
        |The bucketed store under `io.IO` is a manifest-pointer table
        |format over plain parquet, and every guarantee reduces to two
        |filesystem primitives: atomic create-if-absent (commit markers,
        |claim locks) and never-overwrite-a-live-file (generation dirs).
        |
        |- **Layout**: `__graft_gen=<v>-<nonce>/__graft_bucket=<b>/` data
        |  dirs; `_graft_manifests/v<N>` maps bucket → generation(s);
        |  `v<N>.committed` (atomic create) is the single commit point.
        |  Generation names carry a writer nonce, so racing writers can
        |  never clobber each other's uncommitted files.
        |- **Writes**: MERGE / DELETE rewrite only touched buckets
        |  (O(delta), key-hash pruning); APPEND adds delta generations
        |  without reading anything (LSM trade);
        |  `compactPartitionedStore` collapses fragmented buckets only.
        |- **Concurrency**: optimistic — per-version claim lock (atomic
        |  create + lease for crashed claimants), base re-check under the
        |  claim, losers recompute against the new current and retry;
        |  orphan generations are vacuum's to reclaim.
        |- **Reads**: always through the committed manifest (uncommitted
        |  or superseded files are invisible); `readPartitionedStoreAt`
        |  serves any retained version (time travel); `storeChangeFeed`
        |  diffs two versions scanning ONLY buckets whose manifest entry
        |  changed (asserted in PlanAuditSpec); `applyChangeFeed` /
        |  `syncMirror` are the consumer side with a cursor committed
        |  atomically alongside the mirror data.
        |- **Schema evolution**: `upsert(evolveSchema = true)` widens the
        |  schema; old generations read back as typed NULLs via parquet
        |  mergeSchema over the already-pruned file list; the feed aligns
        |  both versions on the column union.
        |- **Retention**: `vacuumPartitionedStore` deletes superseded
        |  generations, old manifests, and stale locks — after which only
        |  the current version is readable (the standard time-travel ↔
        |  vacuum trade) and a lagging mirror falls back to a snapshot.
        |
        |On an object store without atomic create, the claim/commit pair
        |becomes a conditional PUT per version; nothing else changes.
        |All of the above is exercised by IOSpec (crash injection, racing
        |writers, stale-claim break, evolution, mirror catch-up).
        |
        |## Streaming state backend (st_* family)
        |
        |The `st_*` streaming queries run on Structured Streaming's default
        |HDFS-backed state store, which keeps every key's state on the
        |executor HEAP — at 100× the stream cardinality that heap becomes
        |the bottleneck before any shuffle does. The engine's seam is
        |`EventStreams.withStateStoreProvider(spark) { ... }`, which pins
        |
        |```
        |spark.sql.streaming.stateStore.providerClass =
        |  org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider
        |```
        |
        |for the enclosed run — per-key state moves to native RocksDB
        |(off-heap, spill-to-disk, incremental checkpoints). StreamingSpec
        |proves the swap is semantics-free (dedup + windowed counts emit
        |identical rows under both providers) and that RocksDB actually
        |backed the run (rocksdb* custom metrics reported per batch).
        |Production guidance: RocksDB + changelog checkpointing is the
        |standard public configuration once keyed state exceeds executor
        |heap; nothing in the operator code changes.
        |""".stripMargin)
    Files.writeString(Paths.get("/root/repo/PLANS.md"), sb.toString)
    println("[plans] wrote PLANS.md")
    spark.stop()
  }
}
