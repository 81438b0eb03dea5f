package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-15 plan-evidence dump (evidence tooling, not query-path code —
  * the PlanDumpR14 precedent): writes `plans/r15/<name>_{before,after}.txt`
  * for each operator this optimization round touched. "Before" forms are
  * reconstructed inline from the round-14 code (noted per block); "after"
  * forms call the live code. Run from the repo root:
  * `sbt "runMain graft.PlanDumpR15 [sfDir]"`. */
object PlanDumpR15 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val out = java.nio.file.Paths.get("/root/repo/plans/r15")
    java.nio.file.Files.createDirectories(out)
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val s = spark
    def dump(name: String, df: DataFrame): Unit = {
      java.nio.file.Files.writeString(out.resolve(s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode))
      println(s"[plandump] wrote $name")
    }

    // ---- a12 exact median: percentile() buffer vs two-pass band ----
    val li = Tables.lineitem(s, dir)
    // before (round 14): single mixed aggregate with the distinct-value-
    // buffering percentile()
    dump("a12_exact_p50_before",
      li.agg(expr("percentile(l_extendedprice, 0.5)").as("exact_p50")))
    // after: the two cheap column-scan aggregates + the tiny band collect
    // (pass 2 of exactMedianTwoPass; band bounds from a live pass 1)
    dump("a12_exact_p50_after_pass1",
      li.agg(count(col("l_extendedprice")).as("n"),
        expr("approx_percentile(l_extendedprice, array(0.496, 0.504), 1000)")
          .as("bracket")))
    locally {
      val r = li.agg(
        expr("approx_percentile(l_extendedprice, array(0.496, 0.504), 1000)"))
        .head().getSeq[Double](0)
      dump("a12_exact_p50_after_pass2",
        li.agg(sum(when(col("l_extendedprice") < r(0), 1L).otherwise(0L)),
          sum(when(col("l_extendedprice").between(r(0), r(1)), 1L).otherwise(0L))))
      dump("a12_exact_p50_after_band_collect",
        li.select(col("l_extendedprice").as("x"))
          .where(col("x").between(r(0), r(1))).sort("x"))
    }

    // ---- bm25 indexRows: 3x tokenize vs cached base ----
    locally {
      import graft.llm.TextAnalysis
      val docs = Tables.documents(s, dir).select("doc_id", "text")
      val nullLong = lit(null).cast("long")
      def tb(c: org.apache.spark.sql.Column) =
        pmod(xxhash64(c), lit(64L)).cast("int")
      def rowsOver(base: DataFrame): DataFrame = {
        val posts = base.where(col("dl") > 0)
          .select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
          .groupBy("term", "doc_id", "dl").agg(count(lit(1)).as("tf"))
          .select(col("term"), col("doc_id"), col("tf"),
            col("dl").cast("long").as("dl"), nullLong.as("n_docs"),
            nullLong.as("n_dl"), nullLong.as("sum_dl"),
            tb(col("term")).as(graft.io.IO.BucketCol))
        val registry = base.select(lit("__DOC__").as("term"), col("doc_id"),
          nullLong.as("tf"), col("dl").cast("long").as("dl"),
          nullLong.as("n_docs"), nullLong.as("n_dl"), nullLong.as("sum_dl"),
          pmod(xxhash64(col("doc_id")), lit(64L)).cast("int")
            .as(graft.io.IO.BucketCol))
        val stats = base.agg(count(lit(1)).as("n_docs"),
            count(col("dl")).as("n_dl"),
            coalesce(sum(col("dl").cast("long")), lit(0L)).as("sum_dl"))
          .select(lit("__STATS__").as("term"), lit(-1L).as("doc_id"),
            nullLong.as("tf"), nullLong.as("dl"),
            col("n_docs"), col("n_dl"), col("sum_dl"),
            lit(64).as(graft.io.IO.BucketCol))
        posts.unionByName(registry).unionByName(stats)
      }
      val baseRaw = docs.select(col("doc_id"),
          TextAnalysis.tokens(col("text")).as("toks"))
        .select(col("doc_id"), col("toks"), size(col("toks")).as("dl"))
      // before (round 14): the union's three branches each re-derive the
      // tokenized base — three tokenize subtrees in one plan
      dump("bm25_index_rows_before", rowsOver(baseRaw))
      // after: the branches read one cached base (InMemoryTableScan x3)
      val baseCached = baseRaw.cache()
      baseCached.count()
      dump("bm25_index_rows_after", rowsOver(baseCached))
      baseCached.unpersist(blocking = false)
    }

    // ---- bm25 maintenance locate: full term-bucket scan vs registry-only ----
    locally {
      import graft.llm.Bm25Store
      val path = "/root/repo/target/qtmp/plandump_bm25_locate"
      graft.io.IO.deletePath(path)
      Bm25Store.write(Tables.documents(s, dir).select("doc_id", "text")
        .where("doc_id % 5 = 0"), path, termBuckets = 64)
      val keySet = broadcast(Tables.documents(s, dir)
        .select(col("doc_id")).where("doc_id % 55 = 0").distinct())
      // before (round 14): column-pruned (doc_id, dl, bucket) scan of
      // EVERY term bucket joined to the id set — O(store id column)
      dump("bm25_locate_before",
        graft.io.IO.readStoreBuckets(s, path, (0 until 64).toSet)
          .select(col("doc_id"), col("dl"), col(graft.io.IO.BucketCol))
          .join(keySet, Seq("doc_id")))
      // after: ONE pruned read of the ids' registry buckets; each located
      // registry row explodes to its recorded posting buckets — note the
      // scan lists only the registry buckets of the requested ids
      val regBuckets = keySet
        .select(pmod(xxhash64(col("doc_id")), lit(64L)).cast("int").as("b"))
        .distinct().collect().map(_.getInt(0)).toSet
      dump("bm25_locate_after",
        graft.io.IO.readStoreBuckets(s, path, regBuckets)
          .where(col("term") === "__DOC__")
          .join(keySet, Seq("doc_id"))
          .select(col("doc_id"), col("dl"),
            explode(array_union(col("postb"),
              array(col(graft.io.IO.BucketCol)))).as(graft.io.IO.BucketCol)))
    }

    // ---- m4/m5 trial frames: 8-partition split windows vs coalesce(1) ----
    locally {
      import org.apache.spark.ml.feature.VectorAssembler
      val weighted = graft.matching.Matcher.addClassWeights(
        graft.queries.Fixtures.labeledPairs(s, dir)
          .withColumn("name_sqdist", (col("idA") % 97).cast("double") / 97.0)
          .withColumn("descript_sqdist", (col("idB") % 89).cast("double") / 89.0)
          .withColumn("price_sqdist", (col("idA") % 7).cast("double") / 7.0))
        .coalesce(1)
      val Seq(tr0, _) = graft.matching.Matcher.stratifiedSplit(weighted, Seq(0.8, 0.2))
      val asm = new VectorAssembler()
        .setInputCols(graft.matching.Matcher.FeatureCols)
        .setOutputCol("features").setHandleInvalid("keep")
      // before (round 14): the assembled trial frame kept the split
      // window's spark.sql.shuffle.partitions partitioning (32 on the
      // bench, 30 empty for a 2-label corpus) — every tiny MLlib job over
      // it scheduled that many tasks
      dump("m4_trial_frame_before", asm.transform(tr0))
      // after: coalesced to the search's own coalesceTo (1 at sf0.1) —
      // note the Coalesce node capping the frame at one partition
      dump("m4_trial_frame_after", asm.transform(tr0).coalesce(1))
    }

    spark.stop()
  }
}
