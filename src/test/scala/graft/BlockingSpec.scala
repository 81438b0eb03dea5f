package graft

import org.apache.spark.ml.linalg.Vectors
import org.apache.spark.sql.functions._
import graft.blocking.Blocking

/** J4/J5 — LSH similarity-join semantics vs the exact cross-join oracle
  * (SURVEY §5 property tests; A-vs-B semantics pinned per §7.4). */
class BlockingSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(rows: (Int, Array[Double])*) =
    rows.map { case (id, a) => (id, Vectors.dense(a)) }.toDF("id", "f")

  private val a = vecs(
    1 -> Array(0.0, 0.0), 2 -> Array(5.0, 5.0), 3 -> Array(10.0, 0.0))
  private val b = vecs(
    11 -> Array(0.1, 0.0), 12 -> Array(5.0, 5.2), 13 -> Array(-10.0, 0.0))

  test("precision: every LSH pair is within the exact threshold") {
    val model = Blocking.fitLsh(a, "f", bucketLength = 2.0, numHashTables = 6)
    val approx = Blocking.similarityJoin(model, a, b, threshold = 1.0)
      .select("idA", "idB").as[(Int, Int)].collect().toSet
    val exact = Blocking.crossJoinExact(a, b, "f", threshold = 1.0)
      .select("idA", "idB").as[(Int, Int)].collect().toSet
    assert(approx.subsetOf(exact)) // distance filter is exact post-blocking
  }

  test("recall: zero-distance pairs always collide (same buckets)") {
    val ident = vecs(21 -> Array(0.0, 0.0), 22 -> Array(5.0, 5.0))
    val model = Blocking.fitLsh(a, "f", bucketLength = 2.0, numHashTables = 6)
    val approx = Blocking.similarityJoin(model, a, ident, threshold = 0.5)
      .select("idA", "idB").as[(Int, Int)].collect().toSet
    assert(approx.contains((1, 21)) && approx.contains((2, 22)))
  }

  test("A-vs-B semantics: idA drawn from side A, idB from side B " +
       "(not the reference's 02:144-145 self-join slip)") {
    val model = Blocking.fitLsh(a, "f", bucketLength = 2.0, numHashTables = 6)
    val pairs = Blocking.similarityJoin(model, a, b, threshold = 2.0)
      .select("idA", "idB").as[(Int, Int)].collect()
    assert(pairs.nonEmpty)
    pairs.foreach { case (ia, ib) =>
      assert(Set(1, 2, 3)(ia) && Set(11, 12, 13)(ib))
    }
  }

  test("recall on real features: LSH finds all golden identity pairs") {
    // identical name → identical tf-idf vector → distance 0 → guaranteed hit
    val names = Tables.part(spark, sf).limit(60)
      .selectExpr("p_partkey as id", "p_name as name")
    val m = graft.features.TextFeatures.namePipeline().fit(names)
    val feats = m.transform(names).select($"id", $"name_features".as("f"))
    val model = Blocking.fitLsh(feats, "f")
    val approx = Blocking.similarityJoin(model, feats, feats, threshold = 0.1)
      .where($"idA" === $"idB") // self-pairs = golden identity matches
      .count()
    assert(approx == 60)
  }

  test("salted bucket join: a hot bucket spreads across reducers, pairs unchanged") {
    // every vector identical -> every key lands in the SAME bucket of every
    // hash table; unsalted, each table's 60x60 pair space serializes
    // through one reducer
    val hotA = (1 to 60).map(i => (s"a$i", Vectors.dense(1.0, 1.0))).toDF("key", "f")
    val hotB = (1 to 60).map(i => (s"b$i", Vectors.dense(1.0, 1.0))).toDF("key", "f")
    val model = Blocking.fitLsh(hotA, "f", bucketLength = 2.0, numHashTables = 4)
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "32")
    // AQE would re-coalesce these KB-sized test partitions into one, and a
    // KB-sized side would broadcast (no shuffle by join key = nothing to
    // salt); at real scale partitions exceed the coalesce target and the
    // sides exceed the broadcast threshold — force the shuffle path the
    // skew story is about
    val prevCoalesce = spark.conf.get("spark.sql.adaptive.coalescePartitions.enabled")
    val prevBroadcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      def partCounts(df: org.apache.spark.sql.DataFrame): Seq[Int] =
        df.rdd.mapPartitions(it => Iterator(it.size)).collect().toSeq.filter(_ > 0)
      val un = Blocking.saltedBucketJoin(model, hotA, hotB, salts = 1)
      val sa = Blocking.saltedBucketJoin(model, hotA, hotB, salts = 8)
      // identical candidate pairs — salting only re-routes the work
      assert(sa.distinct().count() == un.distinct().count())
      assert(un.count() == 4L * 60 * 60)
      val (unParts, saParts) = (partCounts(un), partCounts(sa))
      // unsalted: at most numHashTables join keys -> at most 4 busy reducers
      assert(unParts.size <= 4, s"unsalted spread: $unParts")
      // salted: 4 tables x 8 salts = 32 join keys fan out wide, and no
      // reducer carries a full table-bucket anymore
      assert(saParts.size >= 3 * unParts.size, s"salted spread: $saParts")
      assert(saParts.max < unParts.max,
        s"salting must shrink the largest reducer: ${unParts.max} -> ${saParts.max}")
    } finally {
      spark.conf.set("spark.sql.shuffle.partitions", prev)
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", prevCoalesce)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBroadcast)
    }
  }

  test("dedupedSimilarityJoin matches the MLlib approxSimilarityJoin pair set") {
    // same fitted hashes, same exact-distance post-filter -> same pairs
    val names = Tables.part(spark, sf).limit(80)
      .selectExpr("p_partkey as id", "p_name as name")
    val m = graft.features.TextFeatures.namePipeline().fit(names)
    val feats = m.transform(names).select($"id", $"name", $"name_features")
    val manual = Blocking.dedupedSimilarityJoin(feats, feats, keyCol = "name",
        featureCol = "name_features", threshold = 1.3)
      .select("idA", "idB").as[(Long, Long)].collect().toSet
    val reps = feats.groupBy($"name".as("key"))
      .agg(first($"name_features").as("f")).withColumn("id", $"key")
    val model = Blocking.fitLsh(reps, "f")
    val mllib = Blocking.similarityJoin(model, reps, reps, threshold = 1.3)
      .join(feats.select($"name".as("idA"), $"id".as("ida2")), Seq("idA"))
      .join(feats.select($"name".as("idB"), $"id".as("idb2")), Seq("idB"))
      .select($"ida2", $"idb2").as[(Long, Long)].collect().toSet
    assert(manual == mllib)
  }

  test("plan: similarity join stays an equi-join, never cartesian") {
    val model = Blocking.fitLsh(a, "f", bucketLength = 2.0, numHashTables = 6)
    val plan = Blocking.similarityJoin(model, a, b, threshold = 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"LSH join degraded to cartesian:\n$plan")
  }
}
