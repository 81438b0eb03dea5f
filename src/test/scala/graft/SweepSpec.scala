package graft

/** Regression guard for the between-query session hygiene (graft.Sweep):
  * the round-5 driver bench regressed ~1.8× because checkpoint blocks,
  * stray caches, memory-sink views, and per-run qtmp stores accumulated
  * across the 129-query run. This suite runs one representative query per
  * leak class through the Bench protocol (query → consume → Sweep.drop)
  * and asserts the block manager drains to exactly the declared
  * session-lifetime memos each time.
  */
class SweepSpec extends SparkSpec {

  // one per leak class:
  //  - dd_exact        → Dedup.materialize localCheckpoint per call
  //  - s5_upsert       → IO.upsert localCheckpoint per call
  //  - j4_lsh_join     → Blocking checkpoint + MatchQueries stage memos
  //  - ann_brute_topk  → SessionMemo.frame localCheckpoint memo
  //  - p8_cache        → an explicitly cached query frame
  //  - st_dedup        → memory-sink streaming query (runToBatch)
  private val sample = Seq("dd_exact", "s5_upsert", "j4_lsh_join",
    "ann_brute_topk", "p8_cache", "st_dedup")

  test("persistent RDDs drain to the retained memos after every query + sweep") {
    val qs = SparkEntry.queries
    sample.foreach { name =>
      // Bench protocol: materialize every column, then sweep
      qs(name)(spark, sf).queryExecution.toRdd.count()
      Sweep.drop(spark)
      val left = spark.sparkContext.getPersistentRDDs.keySet.toSet
      val leaked = left.diff(Sweep.retainedIds)
      assert(leaked.isEmpty,
        s"after $name + sweep, non-retained RDDs persist: $leaked")
    }
  }

  test("retained memos stay executable across sweeps") {
    // j4 in the sample built the feature-stage memo; a sweep must not have
    // evicted the blocks that back it (a swept localCheckpoint cannot
    // recompute — this re-execution would throw)
    val n = SparkEntry.queries("f13_pipeline_chain")(spark, sf).count()
    assert(n > 0)
    Sweep.drop(spark)
    assert(SparkEntry.queries("x2_model_score")(spark, sf).count() > 0)
  }

  test("ephemeral qtmp stores are deleted once their query is consumed") {
    val before = qtmpPerRunStores()
    SparkEntry.queries("st_foreach_upsert")(spark, sf)
      .queryExecution.toRdd.count()
    Sweep.drop(spark)
    assert(qtmpPerRunStores() == before,
      "per-run store survived the post-consumption sweep")
  }

  private def qtmpPerRunStores(): Set[String] = {
    val dir = new java.io.File("/root/repo/target/qtmp")
    Option(dir.list()).map(_.toSet).getOrElse(Set.empty)
      .filter(n => n.startsWith("st_") || n.startsWith("ivf_store_")
        || n.startsWith("export_shards_"))
  }
}
