package graft

import org.apache.spark.sql.functions._
import graft.queries.{LlmQueries, MatchQueries, RelationalQueries}

/** Plan-shape audits (the 100 TB checklist): filters and projections reach
  * the parquet scan, dimension joins broadcast, hot paths stay in
  * whole-stage codegen. */
class PlanAuditSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val q = (RelationalQueries.defs ++ MatchQueries.defs ++ LlmQueries.defs)
      .toMap.apply(name)
    q(spark, sf).queryExecution.executedPlan.toString
  }

  test("s4/p5: predicate pushed to parquet scan") {
    val plan = planOf("p5_filter")
    assert(plan.contains("PushedFilters: ["), s"no pushdown in:\n$plan")
    assert(plan.contains("p_size") && plan.contains("p_brand"))
  }

  test("s4: column pruning — scan reads only referenced columns") {
    val plan = planOf("s4_table_scan")
    assert(plan.contains("ReadSchema"), plan)
    // the scan schema must not include unprojected wide columns
    assert(!plan.contains("p_retailprice"), s"unpruned scan:\n$plan")
  }

  test("j1/j3: dimension joins execute as broadcast hash joins") {
    val p1 = planOf("j1_threeway_join")
    assert(p1.contains("BroadcastHashJoin"), p1)
    val p3 = planOf("j3_aliased_join")
    assert(p3.contains("BroadcastHashJoin"), p3)
    assert(!p3.contains("SortMergeJoin"), s"dimension join shuffled:\n$p3")
  }

  test("whole-stage codegen spans the scan+filter+project pipeline") {
    val plan = planOf("p1_clean_cast")
    // codegen stages render as "*(n) Op" in the executed plan string
    assert(plan.contains("*(1)") || plan.contains("WholeStageCodegen"), plan)
  }

  test("u1: union is a no-shuffle bag concat") {
    val plan = planOf("u1_union_all")
    assert(!plan.contains("Exchange"), s"union introduced a shuffle:\n$plan")
  }

  test("limit with order collapses to TakeOrderedAndProject (top-k)") {
    val plan = planOf("p9_limit")
    assert(plan.contains("TakeOrderedAndProject"), plan)
  }

  test("tx_mixture: hash sampling is a pure scan-side filter — no shuffle, no UDF") {
    val plan = planOf("tx_mixture")
    assert(!plan.contains("Exchange"), s"sampling shuffled:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"), plan)
  }

  test("dd_decontam: benchmark shingle side broadcasts (contamination check map-side)") {
    val plan = planOf("dd_decontam")
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side not broadcast:\n$plan")
  }

  test("dd_substring: window-hash shuffles only — no cartesian, no global sort") {
    val plan = planOf("dd_substring")
    assert(!plan.contains("CartesianProduct"), s"all-pairs substring check:\n$plan")
    assert(plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("rangepartitioning") && !plan.contains("SinglePartition"),
      s"single-reducer bottleneck:\n$plan")
  }

  test("tx_temperature_mix: quota side broadcasts; window partitions by source") {
    val plan = planOf("tx_temperature_mix")
    // quotas (one row per source) reach the corpus via broadcast, and the
    // top-k window hashes on the stratum — corpus rows shuffle at most once
    assert(plan.contains("BroadcastExchange"), s"quotas not broadcast:\n$plan")
    assert(plan.contains("hashpartitioning(source"), s"window not per-stratum:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort:\n$plan")
  }

  test("dd_bloom_decontam: no cartesian; exact confirm join is shingle-keyed") {
    val plan = planOf("dd_bloom_decontam")
    assert(!plan.contains("CartesianProduct"), s"all-pairs confirm:\n$plan")
    assert(plan.contains("hashpartitioning(shingle") ||
      plan.contains("BroadcastHashJoin"), s"confirm join not shingle-keyed:\n$plan")
  }

  test("tx_vocab: top-k via TakeOrdered, never a global sort of the corpus") {
    val plan = LlmQueries.defs.toMap.apply("tx_vocab")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"), s"no bounded top-k:\n$plan")
    assert(!plan.contains("rangepartitioning"), s"global sort:\n$plan")
  }

  test("quality-model features: one fused projection — no joins, no Exchange") {
    val plan = graft.llm.QualityModel.features(
        graft.Tables.documents(spark, sf), "text", keep = Seq.empty)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"signal frames joined/shuffled:\n$plan")
    assert(!plan.contains("Join"), s"signal frames joined:\n$plan")
  }

  test("tx_bigram_lp: no cartesian, no lag-window shuffle for bigram formation") {
    val plan = LlmQueries.defs.toMap.apply("tx_bigram_lp")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    // the previous token comes from array indexing, not a window function
    assert(!plan.contains("Window"), s"lag window crept in:\n$plan")
  }

  test("x7_lateral_topk: correlated LIMIT decorrelates — no per-row re-execution") {
    val plan = graft.queries.BreadthQueries.defs.toMap
      .apply("x7_lateral_topk")(spark, sf).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"lateral degenerated:\n$plan")
    // the rewrite is a ranked window (or group-limit) + equi-join, executed once
    assert(plan.contains("Window") || plan.contains("GroupLimit"), plan)
  }

  test("ann_cluster_report: centroids broadcast; no cartesian") {
    val plan = graft.llm.Ann.clusterReport(Tables.embeddings(spark, sf))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"centroid join not broadcast:\n$plan")
    assert(!plan.contains("CartesianProduct"), plan)
  }

  test("f8: vector invariants via vec_stats, not a vector_to_array densify") {
    val plan = graft.queries.FeatureQueries.defs.toMap
      .apply("f8_hashing_tf_counts")(spark, sf)
      .queryExecution.executedPlan.toString
    // the O(nnz) kernel replaced the O(dim) dense detour: no 2^18-element
    // array materialization, no higher-order aggregate over it
    assert(plan.contains("vec_stats"), s"vec_stats missing:\n$plan")
    assert(!plan.contains("vector_to_array"), s"dense detour crept back:\n$plan")
  }

  test("tx_normalize: one codegen projection — no shuffle, no ScalaUDF") {
    val plan = planOf("tx_normalize")
    assert(!plan.contains("Exchange"), s"normalization shuffled:\n$plan")
    assert(!plan.contains("BatchEvalPython") && !plan.contains("ScalaUDF"),
      s"UDF in the scan projection:\n$plan")
    assert(plan.contains("nfc_normalize"), s"native NFC expression missing:\n$plan")
  }

  test("j9_edit_join: deletion-neighborhood EQUI-join, never all-pairs") {
    val plan = graft.ops.EditDistance.selfJoin(
        Tables.customer(spark, sf), "c_custkey", "c_name")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"), s"all-pairs join:\n$plan")
    // the join keys on the 8-byte signature hash, not the name string
    assert(plan.contains("xxhash64"), s"signature hash missing:\n$plan")
  }

  test("dd_semantic_decontam: benchmark broadcasts; corpus screened map-side") {
    val emb = Tables.embeddings(spark, sf)
    val plan = graft.llm.Dedup.semanticDecontaminate(
        emb.where("vec_id % 13 != 0"), emb.where("vec_id % 13 = 0"), 0.3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      s"benchmark side not broadcast:\n$plan")
    assert(!plan.contains("SortMergeJoin") && !plan.contains("CartesianProduct"), plan)
  }

  test("zorder: one range exchange, Morton value codegen, no UDF") {
    val li = Tables.lineitem(spark, sf).select("l_partkey", "l_suppkey", "l_orderkey")
    val plan = graft.ops.Layout
      .zorderFrame(li, Seq("l_partkey", "l_suppkey"), nFiles = 16, bits = 10)
      .queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), s"no range exchange:\n$plan")
    assert(plan.split("Exchange").length - 1 == 1,
      s"re-layout must cost exactly ONE exchange:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"Morton value fell out of codegen:\n$plan")
    assert(plan.contains("width_bucket") && plan.contains("shiftleft"), plan)
  }

  test("filtered IVF serve: the allowed-id filter does NOT break the " +
       "probed-cell pruning of the store read") {
    import spark.implicits._
    val mk = (base: Array[Float], eps: Float) => base.zipWithIndex.map {
      case (x, i) => x + (if (i % 2 == 0) eps else -eps) }
    val c1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val c2 = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val c3 = Array(0.0f, 1.0f, 0.0f, 0.0f)
    val df = (0 until 18).map { i =>
      (i.toLong, mk(Seq(c1, c2, c3)(i / 6), 0.01f * (i % 4)))
    }.toDF("vec_id", "embedding")
    val path = "/root/repo/target/test_tmp/audit_filtered_ivf"
    graft.io.IO.deletePath(path)
    graft.llm.Ann.writeIvfStore(df, path, nCells = 3)
    // nProbe=1 on a 3-cell store: the serve must read ONE data cell even
    // with the filter attached (a filter that forced a full-store read
    // would be the quiet way to lose the pruning at 100 TB)
    val served = graft.llm.Ann.ivfStoreTopK(spark, path,
      df.where("vec_id = 0"), k = 3, nProbe = 1,
      allowedIds = Some(df.where("vec_id % 2 = 0").select("vec_id")))
    served.collect()
    val buckets = served.inputFiles
      .flatMap("__graft_bucket=(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).toSet
    assert(buckets.size == 1, s"filtered serve read ${buckets.size} cells: $buckets")
  }

  test("deleteFromVectorStore: the id-locate scan is column-pruned (never " +
       "reads the vectors) and the rewrite lists only touched cells") {
    import spark.implicits._
    val mk = (base: Array[Float], eps: Float) => base.zipWithIndex.map {
      case (x, i) => x + (if (i % 2 == 0) eps else -eps) }
    val c1 = Array(1.0f, 0.0f, 0.0f, 0.0f)
    val c2 = Array(0.0f, 0.0f, 1.0f, 0.0f)
    val df = (0 until 12).map { i =>
      (i.toLong, mk(if (i < 6) c1 else c2, 0.01f * (i % 4)))
    }.toDF("vec_id", "embedding")
    val path = "/root/repo/target/test_tmp/audit_delete_ivf"
    graft.io.IO.deletePath(path)
    graft.llm.Ann.writeIvfStore(df, path, nCells = 2)
    // the locate frame (same shape deleteFromVectorStore builds): its scan
    // schema must carry nn_id only — the embedding column must be pruned
    // away, or the "cheap id scan" silently reads the whole corpus width
    val located = graft.io.IO.readStoreBuckets(spark, path, Set(0, 1))
      .select(col("nn_id"), col(graft.io.IO.BucketCol))
      .join(broadcast(Seq(1L).toDF("nn_id")), Seq("nn_id"))
    val plan = located.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<nn_id:bigint>"),
      s"locate scan not pruned to the id column:\n$plan")
  }

  test("Bm25Store delete/upsert: the doc-locate scan is column-pruned " +
       "(doc_id + dl only — never the term or tf columns)") {
    import spark.implicits._
    val docs = Seq((1L, "cat dog"), (2L, "dog fish"), (3L, "owl cat dog"))
      .toDF("doc_id", "text")
    val path = "/root/repo/target/test_tmp/audit_bm25_locate"
    graft.io.IO.deletePath(path)
    graft.llm.Bm25Store.write(docs, path, termBuckets = 4)
    // the locate frame (same shape Bm25Store.locateDocs builds): its scan
    // schema must carry doc_id + the denormalized dl only — term/tf and
    // the stats columns must prune away, or the "cheap id scan" reads
    // the full posting width across every term bucket
    val located = graft.io.IO.readStoreBuckets(spark, path, Set(0, 1, 2, 3))
      .select(col("doc_id"), col("dl"), col(graft.io.IO.BucketCol))
      .join(broadcast(Seq(2L).toDF("doc_id")), Seq("doc_id"))
    val plan = located.queryExecution.executedPlan.toString
    assert(plan.contains("ReadSchema: struct<doc_id:bigint,dl:bigint>"),
      s"locate scan not pruned to (doc_id, dl):\n$plan")
  }

  test("storeChangeFeed: scans list ONLY changed bucket directories") {
    import spark.implicits._
    val path = "/root/repo/target/test_tmp/audit_cdc_store"
    graft.io.IO.writePartitionedStore(
      (1 to 64).map(i => (i.toLong, i.toDouble)).toDF("id", "v"),
      path, Seq("id"), nBuckets = 8)
    graft.io.IO.upsertPartitionedStore(spark, path,
      Seq((3L, 300.0)).toDF("id", "v"), Seq("id"), Seq("v"))
    val touched = Seq(3L).toDF("id")
      .select(graft.io.IO.bucketExpr(Seq("id"), 8).as("b")).as[Int].head()
    val plan = graft.io.IO.storeChangeFeed(spark, path, 1, 2, Seq("id"))
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
    // both scans' file indexes carry exactly the touched bucket's dirs —
    // the seven untouched buckets never appear in the plan at all
    (0 until 8).filter(_ != touched).foreach { b =>
      assert(!plan.contains(s"__graft_bucket=$b"),
        s"untouched bucket $b listed in:\n$plan")
    }
    assert(plan.contains(s"__graft_bucket=$touched"), plan)
  }
}
