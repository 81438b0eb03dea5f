package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 perf diagnostic (evidence tooling, not query-path code — the
  * PlanDumpR14 precedent): phase-by-phase wall clock of the two biggest
  * non-ER bench walls, tx_bm25_upsert and s12_change_feed, so optimization
  * effort goes where the time is. Mirrors the query bodies in
  * LlmQueries/RelationalQueries; drift here affects only profiling.
  * Run: `sbt "runMain graft.ProfileR15 [sfDir]"`. */
object ProfileR15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    import s.implicits._
    def timed[T](name: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[profile] $name%-34s ${(System.nanoTime() - t0) / 1e9}%8.2f s")
      r
    }
    // warmup (same shape as Bench's)
    locally {
      val t = spark.range(1000).select(col("id"), (col("id") % 7).as("k"))
      t.join(broadcast(t.limit(10).select(col("k").as("k2"))), col("k") === col("k2"))
        .groupBy("k").count().queryExecution.toRdd.count()
      spark.read.parquet(s"$dir/region.parquet").queryExecution.toRdd.count()
    }

    // ---- same-JVM interleaved A/B: indexRows base uncached vs cached ----
    // (host dilation between runs is 30-40% on this box, so cross-run
    // phase numbers cannot adjudicate a 1-2 s delta; alternating forms in
    // one session can)
    locally {
      import graft.llm.TextAnalysis
      val docs0 = Tables.documents(s, dir).select("doc_id", "text")
        .where("doc_id % 3 != 2")
      val nullLong = lit(null).cast("long")
      def tb(c: org.apache.spark.sql.Column) =
        pmod(xxhash64(c), lit(64L)).cast("int")
      def rowsOver(base: DataFrame): DataFrame = {
        val posts = base.where(col("dl") > 0)
          .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
          .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
          .select(col("term"), col("doc_id"), col("tf"),
            col("dl").cast("long").as("dl"), nullLong.as("n_docs"),
            nullLong.as("n_dl"), nullLong.as("sum_dl"), tb(col("term")).as("b"))
        val registry = base.select(lit("__DOC__").as("term"), col("doc_id"),
          nullLong.as("tf"), col("dl").cast("long").as("dl"),
          nullLong.as("n_docs"), nullLong.as("n_dl"), nullLong.as("sum_dl"),
          pmod(xxhash64(col("doc_id")), lit(64L)).cast("int").as("b"))
        val stats = base.agg(count(lit(1)).as("n_docs"),
            count(col("dl")).as("n_dl"),
            coalesce(sum(col("dl").cast("long")), lit(0L)).as("sum_dl"))
          .select(lit("__STATS__").as("term"), lit(-1L).as("doc_id"),
            nullLong.as("tf"), nullLong.as("dl"),
            col("n_docs"), col("n_dl"), col("sum_dl"), lit(64).as("b"))
        posts.unionByName(registry).unionByName(stats)
      }
      def baseOf(d: DataFrame) = d.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      def noop(df: DataFrame): Unit =
        df.write.format("noop").mode("overwrite").save()
      for (i <- 1 to 3) {
        timed(s"ab$i: indexRows UNCACHED base (noop)") { noop(rowsOver(baseOf(docs0))) }
        timed(s"ab$i: indexRows CACHED base (noop)") {
          val b = baseOf(docs0).cache()
          try noop(rowsOver(b)) finally b.unpersist(blocking = false)
        }
      }
    }

    // ---- tx_bm25_upsert, decomposed (mirrors LlmQueries) ----
    import graft.llm.{Bm25Store, TextAnalysis}
    val docs = Tables.documents(s, dir).select("doc_id", "text")
    val shared = timed("bm25: shared store build+append") {
      graft.queries.LlmQueries.sharedBm25Store(s, dir)
    }
    val path = "/root/repo/target/qtmp/profile_bm25_upsert"
    timed("bm25: cloneStore") { graft.io.IO.cloneStore(s, shared, path) }
    val tokenful = docs.where(size(TextAnalysis.tokens(col("text"))) > 0)
    val (deleted, reindexed, novel) = timed("bm25: pin 3 mutation frames") {
      val d = tokenful.where("doc_id % 11 = 5").localCheckpoint()
      val r = tokenful.where("doc_id % 7 = 3 and doc_id % 11 != 5")
        .select(col("doc_id"), concat(col("text"), lit(" graftupd graftupd")).as("text"))
        .localCheckpoint()
      val n = tokenful.where("doc_id % 31 = 0")
        .select((col("doc_id") + 1000000000L).as("doc_id"), col("text"))
        .localCheckpoint()
      (d, r, n)
    }
    timed("bm25: counts") { deleted.count(); reindexed.count(); novel.count() }
    // replicate the delete's locate phases to attribute its wall
    locally {
      val termBuckets = graft.io.IO.storeBuckets(path) - 1
      val keySet = broadcast(deleted.select(col("doc_id")).distinct())
      val located = timed("bm25: [locate] scan+join+pin") {
        val l = graft.io.IO.readStoreBuckets(s, path, (0 until termBuckets).toSet)
          .select(col("doc_id"), col("dl"), col(graft.io.IO.BucketCol))
          .join(keySet, Seq("doc_id")).localCheckpoint()
        l.count(); l
      }
      val del = timed("bm25: [locate] del distinct pin") {
        val d = located.select(col("doc_id"), col(graft.io.IO.BucketCol))
          .distinct().localCheckpoint()
        d.count(); d
      }
      val touched = timed("bm25: [locate] touched collect") {
        del.select(graft.io.IO.BucketCol).distinct().collect().map(_.getInt(0)).toSet
      }
      timed("bm25: [rewrite] read+antijoin (noop)") {
        graft.io.IO.readStoreBuckets(s, path, touched)
          .join(broadcast(del.drop(graft.io.IO.BucketCol)), Seq("doc_id"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      located.unpersist(blocking = false); del.unpersist(blocking = false)
    }
    timed("bm25: delete") { Bm25Store.delete(s, path, deleted.select("doc_id")) }
    timed("bm25: upsert") { Bm25Store.upsert(reindexed.unionByName(novel), path) }
    val updated = docs
      .join(deleted.select("doc_id").unionByName(reindexed.select("doc_id")),
        Seq("doc_id"), "left_anti")
      .unionByName(reindexed).unionByName(novel)
    val terms = graft.queries.LlmQueries.bm25Terms :+ "graftupd"
    val served = timed("bm25: store serve (pruned)") {
      val df = Bm25Store.scores(s, path, terms); df.queryExecution.toRdd.count(); df
    }
    val rebuilt = timed("bm25: full-scan rebuild oracle") {
      val df = TextAnalysis.bm25(updated, terms); df.queryExecution.toRdd.count(); df
    }
    timed("bm25: multisetEquals") {
      graft.queries.LlmQueries.multisetEquals(served, rebuilt,
        Seq("doc_id", "n_hit_terms", "bm25"))
    }
    timed("bm25: leftover + preLeft counts") {
      graft.io.IO.readPartitionedStore(s, path)
        .join(broadcast(deleted.select("doc_id")), Seq("doc_id")).count()
      val pre = graft.io.IO.storeVersions(s, path).head
      graft.io.IO.readPartitionedStoreAt(s, path, pre)
        .join(broadcast(deleted.select("doc_id")), Seq("doc_id")).count()
    }

    // ---- s12_change_feed, decomposed (mirrors RelationalQueries) ----
    import graft.io.IO
    val p12 = "/root/repo/target/qtmp/profile_s12_store"
    IO.deletePath(p12)
    val target = Tables.part(s, dir)
      .selectExpr("p_partkey as id", "p_name as name", "round(p_retailprice, 2) as price")
    timed("s12: writePartitionedStore") {
      IO.writePartitionedStore(target, p12, Seq("id"), nBuckets = 16)
    }
    val source = Tables.part(s, dir).where("p_partkey % 5 = 0")
      .selectExpr("p_partkey as id", "p_name as name", "round(p_retailprice * 2, 2) as price")
      .unionByName(Tables.part(s, dir).where("p_partkey % 97 = 0")
        .selectExpr("p_partkey + 10000000 as id", "p_name as name",
          "round(p_retailprice, 2) as price"))
    timed("s12: upsertPartitionedStore") {
      IO.upsertPartitionedStore(s, p12, source, Seq("id"), Seq("price"))
    }
    timed("s12: deleteFromPartitionedStore") {
      IO.deleteFromPartitionedStore(s, p12,
        Tables.part(s, dir).where("p_partkey % 11 = 0").selectExpr("p_partkey as id"),
        Seq("id"))
    }
    timed("s12: changeFeed 1->2 (materialize)") {
      IO.storeChangeFeed(s, p12, 1, 2, Seq("id")).queryExecution.toRdd.count()
    }
    timed("s12: changeFeed 2->3 (materialize)") {
      IO.storeChangeFeed(s, p12, 2, 3, Seq("id")).queryExecution.toRdd.count()
    }
    timed("s12: full query (as registered)") {
      graft.SparkEntry.queries("s12_change_feed")(s, dir).queryExecution.toRdd.count()
    }
    spark.stop()
  }
}
