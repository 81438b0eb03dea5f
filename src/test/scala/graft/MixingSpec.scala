package graft

import org.apache.spark.sql.functions._
import graft.llm.Mixing

/** Data-mixing operators: deterministic hash sampling and greedy packing. */
class MixingSpec extends SparkSpec {
  import spark.implicits._

  test("rateCutoffHex: hex cutoffs match the rate's 32-bit fraction") {
    assert(Mixing.rateCutoffHex(0.5) == "80000000")
    assert(Mixing.rateCutoffHex(0.25) == "40000000")
    assert(Mixing.rateCutoffHex(0.1) == "19999999")
    assert(Mixing.rateCutoffHex(0.0) == "00000000")
    assertThrows[IllegalArgumentException](Mixing.rateCutoffHex(1.0))
  }

  test("hashSample: rate-1 strata keep everything, rate-0 nothing, deterministic") {
    val df = (0L until 400L).map(i => (i, if (i % 2 == 0) "keep" else "half"))
      .toDF("id", "stratum")
    val out = Mixing.hashSample(df, "id", "stratum",
      Seq("keep" -> 1.0), defaultRate = 0.5)
    val kept = out.groupBy("stratum").count().as[(String, Long)].collect().toMap
    assert(kept("keep") == 200L)                      // rate 1.0 is exact
    assert(kept("half") > 60L && kept("half") < 140L) // ~100 expected
    // bit-identical on re-run (pure hash, no RNG state)
    assert(out.select("id").as[Long].collect().toSet ==
      Mixing.hashSample(df, "id", "stratum", Seq("keep" -> 1.0), 0.5)
        .select("id").as[Long].collect().toSet)
    val none = Mixing.hashSample(df, "id", "stratum",
      Seq("keep" -> 0.0, "half" -> 0.0), defaultRate = 0.9)
    assert(none.count() == 0L)
  }

  test("hashSample: samples are nested — raising a rate only ADDS rows") {
    // hex cutoffs grow with the rate, so the kept set at rate r is a subset
    // of the kept set at r' > r: changing a recipe's mix never churns
    // already-selected documents
    val df = (0L until 500L).map(i => (i, "s")).toDF("id", "stratum")
    def kept(r: Double) = Mixing.hashSample(df, "id", "stratum", Seq("s" -> r), 0.0)
      .select("id").as[Long].collect().toSet
    val (a, b, c) = (kept(0.1), kept(0.3), kept(0.8))
    assert(a.subsetOf(b) && b.subsetOf(c))
    assert(a.size < b.size && b.size < c.size)
  }

  test("packBins: greedy fill with reset per group; oversized doc gets own bin") {
    val df = Seq(
      // group g1, capacity 10: [4, 5] -> bin 0; [7] overflows -> bin 1;
      // [12] oversized alone -> bin 2; [2] after oversized -> bin 3
      ("g1", 1L, 4L), ("g1", 2L, 5L), ("g1", 3L, 7L), ("g1", 4L, 12L), ("g1", 5L, 2L),
      // group g2 restarts at bin 0
      ("g2", 1L, 10L), ("g2", 2L, 1L))
      .toDF("src", "doc", "sz")
    val out = Mixing.packBins(df, "src", "doc", "sz", capacity = 10L)
      .select("group", "id", "bin").as[(String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out == Map(
      ("g1", 1L) -> 0L, ("g1", 2L) -> 0L, ("g1", 3L) -> 1L,
      ("g1", 4L) -> 2L, ("g1", 5L) -> 3L,
      ("g2", 1L) -> 0L, ("g2", 2L) -> 1L))
  }

  test("packBins: zero-size docs never let an oversized doc share their bin") {
    val df = Seq(("g", 1L, 0L), ("g", 2L, 12L), ("g", 3L, 0L)).toDF("src", "doc", "sz")
    val out = Mixing.packBins(df, "src", "doc", "sz", capacity = 10L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 1L, 3L -> 2L))
  }

  test("packBins: null sizes pack as zero instead of crashing") {
    val df = Seq(("g", 1L, Some(4L)), ("g", 2L, None), ("g", 3L, Some(5L)))
      .toDF("src", "doc", "sz")
    val out = Mixing.packBins(df, "src", "doc", "sz", capacity = 10L)
      .select("id", "bin").as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 0L, 2L -> 0L, 3L -> 0L)) // 4 + 0 + 5 fits one bin
  }

  test("packBins: bins never exceed capacity unless a single doc does") {
    val df = (0L until 100L).map(i => ("s" + (i % 3), i, 1L + i % 40))
      .toDF("src", "doc", "sz")
    val bins = Mixing.packBins(df, "src", "doc", "sz", capacity = 64L)
      .groupBy("group", "shard", "bin")
      .agg(sum("size").as("tot"), count(lit(1)).as("n"))
      .where(col("tot") > 64L && col("n") > 1L)
    assert(bins.count() == 0L)
  }

  test("packBins: sharding preserves the doc set and per-shard capacity") {
    val df = (0L until 200L).map(i => ("src", i, 1L + i % 30)).toDF("src", "doc", "sz")
    val out = Mixing.packBins(df, "src", "doc", "sz", capacity = 64L, shards = 4)
    assert(out.select("id").as[Long].collect().toSet == (0L until 200L).toSet)
    assert(out.select("shard").distinct().count() == 4L)
    val over = out.groupBy("group", "shard", "bin")
      .agg(sum("size").as("tot"), count(lit(1)).as("n"))
      .where(col("tot") > 64L && col("n") > 1L)
    assert(over.count() == 0L)
  }

  test("shuffleShards: permutation, contiguous per-shard ranks, seeded determinism") {
    val df = (0L until 400L).toDF("doc_id")
    val a = Mixing.shuffleShards(df, "doc_id", "s1", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    // every id exactly once; shards in range
    assert(a.map(_._1).toSet == (0L until 400L).toSet)
    assert(a.forall(r => r._2 >= 0 && r._2 < 8))
    // per-shard positions are contiguous 1..n
    a.groupBy(_._2).foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq == (1 to rows.length)) }
    // same seed reproduces bit-identically; a different seed reorders
    val a2 = Mixing.shuffleShards(df, "doc_id", "s1", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(a.toSet == a2.toSet)
    val b = Mixing.shuffleShards(df, "doc_id", "s2", 8)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect()
    assert(a.toSet != b.toSet)
  }

  test("capPerStratum: exact per-stratum top-k-by-hash, small strata kept whole") {
    // strata: "big" 300 rows (prefilter engages), "tiny" 5 rows (rate clamps to 1)
    val df = ((0L until 300L).map(i => (i, "big")) ++
      (1000L until 1005L).map(i => (i, "tiny"))).toDF("doc_id", "src")
    val out = Mixing.capPerStratum(df, "src", "doc_id", k = 10, seed = "s")
      .select("doc_id", "src").as[(Long, String)].collect().toSet
    // naive oracle: global window top-k by the same md5 key
    import org.apache.spark.sql.expressions.Window
    val naive = df.withColumn("ord", md5(concat(lit("s:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("ord"), col("doc_id"))))
      .where(col("rk") <= 10).select("doc_id", "src")
      .as[(Long, String)].collect().toSet
    assert(out == naive)
    assert(out.count(_._2 == "big") == 10)
    assert(out.count(_._2 == "tiny") == 5)  // below the cap: kept whole
    // determinism
    val out2 = Mixing.capPerStratum(df, "src", "doc_id", k = 10, seed = "s")
      .select("doc_id", "src").as[(Long, String)].collect().toSet
    assert(out == out2)
  }

  test("capPerStratum: NULL is an ordinary stratum — counted, quota'd, selected") {
    // the quota join is null-safe (<=>): a plain equi-join would compute a
    // quota for the NULL stratum and then silently drop every NULL row
    // between the count and the selection (the divergence the adversarial
    // fixture sweep caught end-to-end in tx_cap_sample)
    val df = ((0L until 50L).map(i => (i, "a")) ++
      (100L until 130L).map(i => (i, null.asInstanceOf[String])))
      .toDF("doc_id", "src")
    val out = Mixing.capPerStratum(df, "src", "doc_id", k = 8, seed = "s")
      .select("doc_id", "src").as[(Long, String)].collect()
    assert(out.count(_._2 == null) == 8, "NULL stratum must be capped, not dropped")
    assert(out.count(_._2 == "a") == 8)
    // same rows a global per-stratum window (which groups NULLs) selects
    import org.apache.spark.sql.expressions.Window
    val naive = df.withColumn("ord", md5(concat(lit("s:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("ord"), col("doc_id"))))
      .where(col("rk") <= 8).select("doc_id", "src")
      .as[(Long, String)].collect().toSet
    assert(out.toSet == naive)
  }

  test("temperatureSample: integer quotas flatten the mix; equals naive selection") {
    // skewed corpus: big=400, mid=100, tiny=25 → sqrt weights 20/10/5 (Σ35)
    // budget 70 → quotas 40/20/10: big:mid corpus ratio 4:1 flattens to 2:1
    val df = ((0L until 400L).map(i => (i, "big")) ++
      (1000L until 1100L).map(i => (i, "mid")) ++
      (2000L until 2025L).map(i => (i, "tiny"))).toDF("doc_id", "src")
    val out = Mixing.temperatureSample(df, "src", "doc_id", budget = 70L, seed = "t")
      .select("doc_id", "src").as[(Long, String)].collect().toSet
    val bySrc = out.groupBy(_._2).view.mapValues(_.size).toMap
    assert(bySrc == Map("big" -> 40, "mid" -> 20, "tiny" -> 10))
    // selection within each quota = the naive full-window top-k by hash
    import org.apache.spark.sql.expressions.Window
    val naive = df.withColumn("ord", md5(concat(lit("t:"), col("doc_id").cast("string"))))
      .withColumn("rk", row_number().over(
        Window.partitionBy("src").orderBy(col("ord"), col("doc_id"))))
      .withColumn("k", when(col("src") === "big", 40)
        .when(col("src") === "mid", 20).otherwise(10))
      .where(col("rk") <= col("k")).select("doc_id", "src")
      .as[(Long, String)].collect().toSet
    assert(out == naive)
  }

  test("temperatureSample: quotas cap at the stratum size (no replacement)") {
    // tiny stratum whose quota exceeds its size is kept whole, not inflated
    val df = ((0L until 900L).map(i => (i, "big")) ++
      (1000L until 1004L).map(i => (i, "tiny"))).toDF("doc_id", "src")
    // weights 30/2 (Σ32); budget 320 → raw quotas 300/20; tiny capped at 4
    val bySrc = Mixing.temperatureSample(df, "src", "doc_id", budget = 320L, seed = "t")
      .groupBy("src").count().as[(String, Long)].collect().toMap
    assert(bySrc == Map("big" -> 300L, "tiny" -> 4L))
  }

  test("writeTrainingShards: files are physically sorted by position per shard") {
    val docs = (0L until 300L).map(i => (i, s"doc $i payload")).toDF("doc_id", "text")
    val path = "/root/repo/target/test_tmp/export_shards"
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(path))
    Mixing.writeTrainingShards(docs, "doc_id", "s1", 4, path)
    val back = spark.read.parquet(path)
    // the export is a permutation of the input, assignments intact
    assert(back.count() == 300L)
    assert(back.select("doc_id").distinct().count() == 300L)
    val expected = Mixing.shuffleShards(docs, "doc_id", "s1", 4)
      .select("doc_id", "shard", "pos").as[(Long, Int, Int)].collect().toSet
    assert(back.select(col("doc_id"), col("shard").cast("int"), col("pos"))
      .as[(Long, Int, Int)].collect().toSet == expected)
    // each shard file streams in position order (what a loader relies on)
    new java.io.File(path).listFiles.filter(_.getName.startsWith("shard=")).foreach { d =>
      d.listFiles.filter(f => f.getName.endsWith(".parquet")).foreach { f =>
        val pos = spark.read.parquet(f.getPath).select("pos")
          .as[Int].collect()
        assert(pos.nonEmpty && pos.sameElements(pos.sorted),
          s"${f.getPath} not in position order")
      }
    }
  }

  test("shuffleShards: no global single-partition sort in the plan") {
    val df = (0L until 100L).toDF("doc_id")
    val plan = Mixing.shuffleShards(df, "doc_id", "s1", 8)
      .queryExecution.executedPlan.toString
    // the only Exchange is hash partitioning on shard — a range/global
    // Exchange (SinglePartition sort) would serialize the export at scale
    assert(plan.contains("hashpartitioning"), plan)
    assert(!plan.contains("rangepartitioning"), plan)
    assert(!plan.contains("SinglePartition"), plan)
  }
}
