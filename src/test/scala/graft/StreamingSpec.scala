package graft

import java.time.LocalDateTime
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{OutputMode, Trigger}
import graft.streaming.EventStreams

/** Structured Streaming: incremental arrival via MemoryStream — windowed
  * counts accumulate across batches, dedup drops duplicate ids, sessionize
  * splits on the gap. */
class StreamingSpec extends SparkSpec {
  import spark.implicits._

  private def ev(id: Long, min: Int, user: Long, typ: String, v: Double) =
    (id, java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00"), user, typ, v)

  test("windowed counts accumulate over multiple incremental batches") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.windowedCounts(df, "10 minutes", "1 hour")
      .writeStream.format("memory").queryName("win_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 1, "click", 2.0))
      q.processAllAvailable()
      mem.addData(ev(3, 3, 1, "click", 3.0), ev(4, 11, 1, "buy", 4.0))
      q.processAllAvailable()
      val out = spark.table("win_test")
        .select("event_type", "n", "total_value")
        .as[(String, Long, Double)].collect().toSet
      assert(out == Set(("click", 3L, 6.0), ("buy", 1L, 4.0)))
    } finally q.stop()
  }

  test("streaming dedup drops re-arriving event ids") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.dedupEvents(df, "1 hour")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      mem.addData(ev(1, 1, 1, "click", 1.0), ev(1, 1, 1, "click", 1.0))
      q.processAllAvailable()
      mem.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 1, "click", 2.0))
      q.processAllAvailable()
      assert(spark.table("dedup_test").count() == 2) // ids 1 and 2, once each
    } finally q.stop()
  }

  test("RocksDB state store: stateful dedup + windowed counts are provider-invariant") {
    // same stream under the default (HDFS-backed) and RocksDB providers;
    // results must be identical, and the progress metrics must prove the
    // RocksDB provider actually backed the run (not a silently-ignored
    // conf). This is the 100×-state config: state lives off-heap in
    // native RocksDB instead of the executor heap.
    def run(name: String): (Set[(Long, Long, Double)], Boolean) = {
      val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
      val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      val q = EventStreams.dedupEvents(df, "1 hour")
        .groupBy("user_id").agg(count("*").as("n"), sum("value").as("v"))
        .writeStream.format("memory").queryName(name)
        .outputMode(OutputMode.Complete()).start()
      try {
        mem.addData(ev(1, 1, 1, "click", 1.0), ev(1, 1, 1, "click", 1.0),
          ev(2, 2, 1, "click", 2.0))
        q.processAllAvailable()
        mem.addData(ev(1, 1, 1, "click", 1.0), ev(3, 9, 2, "buy", 4.0))
        q.processAllAvailable()
        val rocks = q.lastProgress.stateOperators.exists(
          _.customMetrics.keySet().stream().anyMatch(_.startsWith("rocksdb")))
        (spark.table(name).as[(Long, Long, Double)].collect().toSet, rocks)
      } finally { q.stop(); spark.catalog.dropTempView(name) }
    }
    val (defaultOut, defaultRocks) = run("ss_default")
    val (rocksOut, rocksActive) =
      EventStreams.withStateStoreProvider(spark) { run("ss_rocksdb") }
    assert(defaultOut == Set((1L, 2L, 3.0), (2L, 1L, 4.0)))
    assert(rocksOut == defaultOut, "provider must not change results")
    assert(rocksActive, "RocksDB provider not active despite the conf")
    assert(!defaultRocks, "default run unexpectedly used RocksDB")
    // the scoped conf restored the session default
    val restored = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    assert(!restored.contains("RocksDB"), s"provider not restored: $restored")
  }

  test("dedupKeysWithinWatermark: duplicate keys within the horizon emit once") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.dedupKeysWithinWatermark(df,
        Seq("user_id", "event_type"), "1 hour")
      .select("user_id", "event_type")
      .writeStream.format("memory").queryName("dedup_wm_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // user 1 clicks twice in batch 1, again in batch 2; user 2 buys once
      mem.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 1, "click", 2.0),
        ev(3, 3, 2, "buy", 4.0))
      q.processAllAvailable()
      mem.addData(ev(4, 4, 1, "click", 3.0))
      q.processAllAvailable()
      val out = spark.table("dedup_wm_test")
        .as[(Long, String)].collect().toSeq
      assert(out.sorted == Seq((1L, "click"), (2L, "buy")))
    } finally q.stop()
  }

  test("sessionWindows (built-in): gap splits sessions; exact-gap event still merges") {
    val df = Seq(
      ev(1, 0, 1, "e", 1.0),   // 10:00
      ev(2, 29, 1, "e", 2.0),  // 10:29 — merges (gap < 30)
      ev(3, 59, 1, "e", 3.0),  // 10:59 — exactly +30 from 10:29: MERGES (inclusive)
      ev(4, 5, 2, "e", 5.0)
    ).toDF("event_id", "ts", "user_id", "event_type", "value")
    val merged = EventStreams.sessionWindows(df)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(merged == Set(
      (1L, "2024-01-01 10:00:00", 3L, 6.0),
      (2L, "2024-01-01 10:05:00", 1L, 5.0)))
    // one microsecond past the gap starts a new session
    val past = df.withColumn("ts",
      when(col("event_id") === 3, expr("ts + INTERVAL 1 MICROSECOND"))
        .otherwise(col("ts")))
    assert(EventStreams.sessionWindows(past)
      .where($"user_id" === 1).count() == 2)
  }

  test("sessionize: gap splits sessions, aggregates per session") {
    def mk(id: Long, t: String, u: Long, v: Double) =
      EventStreams.Ev(id, LocalDateTime.parse(t), u, "e", v)
    val evs = Seq(
      mk(1, "2024-01-01T10:00:00", 1, 1.0),
      mk(2, "2024-01-01T10:10:00", 1, 2.0),   // same session (10 < 30 gap)
      mk(3, "2024-01-01T11:30:00", 1, 3.0),   // 80-min gap → new session
      mk(4, "2024-01-01T10:05:00", 2, 5.0)).toDS()
    val out = EventStreams.sessionize(evs, 30).collect().toSet
    assert(out == Set(
      EventStreams.Session(1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.0),
      EventStreams.Session(1, "2024-01-01 11:30:00", "2024-01-01 11:30:00", 1, 3.0),
      EventStreams.Session(2, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1, 5.0)))
  }

  test("streaming sessionize: state stitches batches, watermark timeout emits") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    val evs = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .as[EventStreams.EvI]
    val q = EventStreams.sessionizeStream(evs, gapMinutes = 30)
      .writeStream.format("memory").queryName("sess_stream_test")
      .outputMode(OutputMode.Append()).start()
    try {
      // batch 1: user 1 opens a session (2 events), user 2 opens one
      mem.addData(ev(1, 0, 1, "e", 1.0), ev(2, 10, 1, "e", 2.0), ev(3, 5, 2, "e", 5.0))
      q.processAllAvailable()
      assert(spark.table("sess_stream_test").count() == 0) // all still open
      // batch 2: a 12:00 event closes user 1's session by gap; the watermark
      // advance (12:00) times out user 2's open session (ends 10:05+30 < 12:00)
      mem.addData((4L, java.sql.Timestamp.valueOf("2024-01-01 12:00:00"), 1L, "e", 4.0))
      q.processAllAvailable()
      val out = spark.table("sess_stream_test")
        .as[EventStreams.Session].collect().toSet
      assert(out == Set(
        EventStreams.Session(1, "2024-01-01 10:00:00", "2024-01-01 10:10:00", 2, 3.0),
        EventStreams.Session(2, "2024-01-01 10:05:00", "2024-01-01 10:05:00", 1, 5.0)))
      // user 1's 12:00 session never times out (watermark stays at 12:00)
    } finally q.stop()
  }

  test("foreachBatch+MERGE maintains a parquet aggregate store across batches") {
    val store = "/root/repo/target/test_tmp/fb_store"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store + ".__graft_old"))
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    val agg = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
      .groupBy("event_type")
      .agg(count(lit(1)).as("n"), round(sum("value"), 2).as("total_value"))
    val q = EventStreams.maintainAggregateStore(agg, store,
      keys = Seq("event_type"), updateCols = Seq("n", "total_value"),
      availableNow = false)
    try {
      mem.addData(ev(1, 1, 1, "click", 1.0), ev(2, 2, 1, "buy", 4.0))
      q.processAllAvailable()
      mem.addData(ev(3, 3, 2, "click", 2.5)) // click count 1 -> 2 via MERGE
      q.processAllAvailable()
      val out = graft.io.IO.readPartitionedStore(spark, store)
        .as[(String, Long, Double)].collect().toSet
      assert(out == Set(("click", 2L, 3.5), ("buy", 1L, 4.0)))
    } finally q.stop()
  }

  test("incremental dedup: cross-batch duplicates are dropped via the persisted store") {
    import graft.streaming.DocStreams
    val store = "/root/repo/target/test_tmp/incdedup_store"
    val out = "/root/repo/target/test_tmp/incdedup_out"
    Seq(store, out).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val mem = MemoryStream[(Long, String)](spark)
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = DocStreams.incrementalExactDedup(docs, store, out,
      availableNow = false)
    try {
      mem.addData((1L, "alpha"), (2L, "beta"), (3L, "alpha")) // 3 dups 1 in-batch
      q.processAllAvailable()
      mem.addData((4L, "beta"), (5L, "gamma"))                // 4 dups 2 cross-batch
      q.processAllAvailable()
      val survivors = spark.read.parquet(out)
        .as[(String, Long)].collect().map(_._2).toSet
      assert(survivors == Set(1L, 2L, 5L))
      val stored = graft.io.IO.readPartitionedStore(spark, store)
        .as[(String, Long)].collect().toMap
      assert(stored.values.toSet == Set(1L, 2L, 5L))
      assert(stored.size == 3) // alpha, beta, gamma — each hashed once
    } finally q.stop()
  }

  test("incremental dedup: replaying a batch is a no-op (idempotent ingest)") {
    import graft.streaming.DocStreams
    val store = "/root/repo/target/test_tmp/incdedup_replay"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(store))
    val batch = Seq((1L, "alpha"), (2L, "beta")).toDF("doc_id", "text")
    assert(DocStreams.dedupBatchAgainstStore(batch, store).count() == 2L)
    // replay (at-least-once delivery, a retried micro-batch): nothing new
    assert(DocStreams.dedupBatchAgainstStore(batch, store).count() == 0L)
    assert(graft.io.IO.readPartitionedStore(spark, store).count() == 2L)
  }

  test("incremental near-dup: cross-batch near-duplicates are flagged via the band store") {
    import graft.streaming.DocStreams
    val store = "/root/repo/target/test_tmp/incnd_store"
    val out = "/root/repo/target/test_tmp/incnd_out"
    Seq(store, out).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val mem = MemoryStream[(Long, String)](spark)
    val docs = mem.toDF().toDF("doc_id", "text")
    val q = DocStreams.incrementalNearDup(docs, store, out, availableNow = false)
    try {
      mem.addData(
        (1L, "the quick brown fox jumps over the lazy dog tonight"),
        (2L, "completely unrelated text about spark physical planning"))
      q.processAllAvailable()
      mem.addData(
        (3L, "the quick brown fox jumps over the lazy dog today"), // near-dup of 1
        (4L, "a third subject entirely unrelated to either document"),
        (5L, null.asInstanceOf[String]))                           // no surface
      q.processAllAvailable()
      val flags = spark.read.parquet(out)
        .as[(Long, Boolean)].collect().toMap
      assert(flags == Map(1L -> true, 2L -> true,   // first batch all novel
        3L -> false,                                 // caught by the store
        4L -> true, 5L -> true))
      // flagged docs' keys are in the store too: a THIRD copy still collides
      val again = DocStreams.nearDupBatchAgainstStore(
        Seq((6L, "the quick brown fox jumps over the lazy dog today"))
          .toDF("doc_id", "text"), store)
      assert(again.as[(Long, Boolean)].collect().toMap == Map(6L -> false))
    } finally q.stop()
  }

  test("incremental stores: empty or surface-less batches never seed an empty store") {
    import graft.streaming.DocStreams
    val s1 = "/root/repo/target/test_tmp/incdedup_empty"
    val s2 = "/root/repo/target/test_tmp/incnd_empty"
    Seq(s1, s2).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val empty = Seq.empty[(Long, String)].toDF("doc_id", "text")
    assert(DocStreams.dedupBatchAgainstStore(empty, s1).count() == 0L)
    assert(!new java.io.File(s1).exists()) // no data-less store on disk
    // all-null texts have no shingles: flagged novel, store untouched
    val nulls = Seq((1L, null.asInstanceOf[String])).toDF("doc_id", "text")
    assert(DocStreams.nearDupBatchAgainstStore(nulls, s2)
      .as[(Long, Boolean)].collect().toMap == Map(1L -> true))
    assert(!new java.io.File(s2).exists())
    // and a real batch afterwards seeds + dedups normally
    val real = Seq((2L, "alpha beta gamma delta epsilon")).toDF("doc_id", "text")
    assert(DocStreams.nearDupBatchAgainstStore(real, s2)
      .as[(Long, Boolean)].collect().toMap == Map(2L -> true))
    assert(DocStreams.nearDupBatchAgainstStore(real.withColumn("doc_id", lit(3L)), s2)
      .as[(Long, Boolean)].collect().toMap == Map(3L -> false))
  }

  test("stream-stream interval join: watermark evicts state to the horizon") {
    val c = EventStreams.readEventStream(spark, sf).where("event_type = 'click'")
      .selectExpr("user_id AS c_user", "ts AS c_ts", "event_id AS c_id")
    val p = EventStreams.readEventStream(spark, sf).where("event_type = 'purchase'")
      .selectExpr("user_id AS p_user", "ts AS p_ts", "event_id AS p_id")
    val (out, progress) = EventStreams.runToBatchTracked(
      EventStreams.streamIntervalJoin(c, p, intervalMinutes = 24 * 60)
        .select("c_id", "p_id"),
      "st_state_bound_test", complete = false)
    assert(out.count() > 0)
    val stateTotals = progress.flatMap(_.stateOperators.map(_.numRowsTotal))
    assert(stateTotals.nonEmpty, "no state operator metrics reported")
    // both sides fully buffer during the data batch (watermark still 0)...
    val events = EventStreams.readEvents(spark, sf)
    val total = events.where("event_type IN ('click', 'purchase')").count()
    assert(stateTotals.max <= total)
    // ...then the no-data batch advances the watermark to max(ts) - 1h and
    // evicts everything older than the join horizon (24h interval + 1h
    // delay + slack). The fixture spans 30 days, so the bound is a small
    // fraction of the input — the documented state bound, enforced.
    val maxTs = events.agg(max("ts")).head().getTimestamp(0)
    val horizon = new java.sql.Timestamp(maxTs.getTime - 28L * 3600 * 1000)
    val bound = events
      .where("event_type IN ('click', 'purchase')")
      .where(col("ts") >= lit(horizon)).count() + 8
    assert(stateTotals.last <= bound,
      s"final join state ${stateTotals.last} exceeds horizon bound $bound")
    assert(stateTotals.last < total,
      s"watermark never evicted: state ${stateTotals.last} of $total rows")
  }

  test("file-source stream over the events fixture runs AvailableNow") {
    val out = EventStreams.runToBatch(
      EventStreams.windowedCounts(EventStreams.readEventStream(spark, sf)),
      "fixture_win_test", complete = true)
    assert(out.count() > 0)
    assert(out.columns.toSeq == Seq("w_start", "event_type", "n", "total_value"))
  }

  // The two deep stream≡batch equivalence checks below used to live INSIDE
  // the registered queries st_incremental_neardup / st_quality_stream,
  // where every bench run paid an O(corpus) batch recomputation just to
  // re-verify the operator. They are correctness facts, not query outputs,
  // so they run once here; the registered queries emit stream-side
  // contracts only.

  test("incremental near-dup over staged splits equals the batch novelty rule") {
    import graft.streaming.DocStreams
    val store = "/root/repo/target/test_tmp/incnd_eq_store"
    val out = "/root/repo/target/test_tmp/incnd_eq_out"
    Seq(store, out).foreach(p =>
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(p)))
    val q = DocStreams.incrementalNearDup(
      DocStreams.readDocumentStream(spark, sf, nSplits = 3), store, out)
    q.awaitTermination()
    val streamed = spark.read.parquet(out)
    val docs = Tables.documents(spark, sf)
    // batch recomputation of the same rule: a doc is novel iff it shares no
    // (band, band_key) with a doc from an EARLIER split (split =
    // pmod(doc_id, 3), the staging rule; arrival order pinned by mtimes)
    val bk = graft.llm.Dedup.bandKeys(
        graft.llm.Dedup.signatures(docs, "text", 3, 36, 42L), 12, 3)
      .withColumn("split", pmod(col("id"), lit(3)))
    val earlier = bk.select(col("band"), col("band_key"),
      col("split").as("splitB"))
    val dupIds = bk.join(earlier, Seq("band", "band_key"))
      .where(col("splitB") < col("split"))
      .select(col("id").as("doc_id")).distinct()
    val batchFlags = docs.select("doc_id").distinct()
      .join(dupIds.withColumn("__dup", lit(true)), Seq("doc_id"), "left")
      .select(col("doc_id"), not(coalesce(col("__dup"), lit(false))).as("bn"))
    val mismatch = streamed.withColumnRenamed("is_novel", "sn")
      .join(batchFlags, Seq("doc_id"), "full_outer")
      .where(col("sn").isNull || col("bn").isNull || col("sn") =!= col("bn"))
      .count()
    assert(mismatch == 0L)
    assert(streamed.count() == docs.count())
  }

  test("streaming quality scoring equals batch scoring doc-for-doc") {
    import graft.streaming.DocStreams
    val docs = Tables.documents(spark, sf)
    val fitted = graft.llm.QualityModel.fit(docs)
    val streamed = EventStreams.runToBatch(
      graft.llm.QualityModel.score(fitted.model,
        DocStreams.readDocumentStream(spark, sf, nSplits = 3)),
      "quality_eq_test", complete = false)
      .withColumnRenamed("quality_prob", "sp")
    val batch = graft.llm.QualityModel.score(fitted.model, docs)
      .withColumnRenamed("quality_prob", "bp")
    // the scoring chain is deterministic per-row arithmetic, so stream and
    // batch must agree EXACTLY, not approximately
    val mismatch = streamed.join(batch, Seq("doc_id"), "full_outer")
      .where(col("sp").isNull || col("bp").isNull || col("sp") =!= col("bp"))
      .count()
    assert(mismatch == 0L)
    assert(streamed.count() == docs.count())
  }

  test("sliding windows: each event lands in width/slide windows; " +
       "overlapping windows sum independently") {
    val mem = MemoryStream[(Long, java.sql.Timestamp, Long, String, Double)](spark)
    val df = mem.toDF().toDF("event_id", "ts", "user_id", "event_type", "value")
    val q = EventStreams.slidingCounts(df) // 10-min width, 5-min slide
      .writeStream.format("memory").queryName("slide_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      mem.addData(ev(1, 1, 1, "click", 1.0)) // 10:01 → windows 09:55, 10:00
      mem.addData(ev(2, 7, 1, "click", 2.0)) // 10:07 → windows 10:00, 10:05
      q.processAllAvailable()
      val rows = spark.table("slide_test")
        .select("w_start_s", "n", "total_value")
        .as[(Long, Long, Double)].collect()
      val base = rows.map(_._1).min
      // timezone-proof: compare window starts relative to the earliest
      assert(rows.map { case (w, n, v) => (w - base, n, v) }.toSet ==
        Set((0L, 1L, 1.0), (300L, 2L, 3.0), (600L, 1L, 2.0)))
    } finally q.stop()
  }

  test("streaming ANN serve: per-batch serves against the persisted store " +
       "union to exactly the batch serve") {
    import graft.llm.Ann
    val emb = Tables.embeddings(spark, sf).where("embedding IS NOT NULL")
    val store = "/root/repo/target/test_tmp/ann_serve_store"
    graft.io.IO.deletePath(store)
    Ann.writeIvfStore(emb, store, nCells = 8)
    // serve the query set in two arrival batches exactly as the query's
    // foreachBatch does; the serve is stateless per query, so batching
    // must not change any result
    val outDir = "/root/repo/target/test_tmp/ann_serve_out"
    graft.io.IO.deletePath(outDir)
    val ids = emb.where("vec_id < 12").select("vec_id").as[Long].collect().sorted
    val (first, second) = ids.splitAt(ids.length / 2)
    Seq(first, second).foreach { batchIds =>
      Ann.ivfStoreTopK(spark, store,
          emb.where(col("vec_id").isin(batchIds.toSeq: _*)), k = 5)
        .write.mode("append").parquet(outDir)
    }
    val streamed = spark.read.parquet(outDir)
    val batchServe = Ann.ivfStoreTopK(spark, store, emb.where("vec_id < 12"), k = 5)
    assert(streamed.exceptAll(batchServe).isEmpty &&
      batchServe.exceptAll(streamed).isEmpty)
    assert(streamed.select("query_id").distinct().count() == ids.length)
  }

  test("streaming decontamination: per-batch survivor union equals batch " +
       "decontamination of the whole corpus") {
    import graft.llm.Dedup
    import graft.streaming.DocStreams
    val docs = Tables.documents(spark, sf)
    val benchmark = docs.where("doc_id % 97 = 0")
    val streamed = EventStreams.runToBatch(
      DocStreams.readDocumentStream(spark, sf, nSplits = 3),
      "decontam_src_test", complete = false)
    // replay the per-batch screen exactly as the query's foreachBatch does
    val perBatch = (0 until 3).map { k =>
      Dedup.decontaminate(
        streamed.where(pmod(col("doc_id"), lit(3)) === k), benchmark,
        threshold = 0.5).select("doc_id")
    }.reduce(_ unionByName _)
    val batch = Dedup.decontaminate(docs, benchmark, threshold = 0.5)
      .select("doc_id")
    assert(perBatch.exceptAll(batch).isEmpty && batch.exceptAll(perBatch).isEmpty)
    // the screen actually removes something at fixture scale (benchmark
    // docs collide with themselves)
    assert(batch.count() < docs.count())
  }
}
