package graft

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Optimization-round-14 plan evidence: `explain("formatted")` dumps for
  * the operator chains the round touched, written to `plans/r14/`.
  *
  * For each touched chain the tool dumps the CURRENT engine form
  * (`<name>_after.txt`) and, where the change replaced an expression
  * inside a helper, a verbatim inline copy of the pre-change form
  * (`<name>_before.txt` — the exact body the helper had at the round-14
  * build HEAD, cited per entry) so the before/after plan diff is
  * reproducible from one run of this tool. Run:
  * `sbt "runMain graft.PlanDumpR14 [sfDir]"` (default sf0.001).
  */
object PlanDumpR14 {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val out = Paths.get("/root/repo/plans/r14")
    Files.createDirectories(out)

    def dump(name: String, df: DataFrame): Unit = {
      Files.writeString(out.resolve(s"$name.txt"),
        df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode).trim + "\n")
      println(s"[plans-r14] wrote $name")
    }

    // ---- multisetEquals (queries/LlmQueries.scala) ----------------------
    // The comparison frame of the ann_ivf_store contract (served-from-store
    // vs batch recomputation). BEFORE (verbatim pre-change multisetEquals
    // body, commit 60c5565): two per-side aggregations full-outer-joined.
    // AFTER: one side-tagged aggregation over the union.
    locally {
      val emb = Tables.embeddings(spark, dir)
      val path = "/root/repo/target/qtmp/plans_r14_ivf_store"
      graft.io.IO.deletePath(path)
      graft.llm.Ann.writeIvfStore(emb, path)
      val queries = emb.where("vec_id < 8")
      val fromStore = graft.llm.Ann.ivfStoreTopK(spark, path, queries, k = 10)
      val cents = graft.llm.Ann.readCentroids(spark, path)
      val batch = graft.llm.Ann.ivfTopKFromAssigned(
        graft.llm.Ann.assignCells(emb, cents), cents, queries, k = 10)
      val cols = Seq("query_id", "nn_id", "cosine", "rank")
      locally { // BEFORE form (verbatim old body)
        val ka = fromStore.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__na"))
        val kb = batch.groupBy(cols.map(col): _*).agg(count(lit(1)).as("__nb"))
        dump("multiset_equals_before",
          ka.join(kb, cols, "full_outer")
            .where(col("__na").isNull || col("__nb").isNull ||
              col("__na") =!= col("__nb")))
      }
      dump("multiset_equals_after",
        graft.queries.LlmQueries.multisetMismatches(fromStore, batch, cols))
    }

    // ---- one-read probe curve (llm/Ann.scala tuneProbe) -----------------
    // BEFORE: each curve grid point ran a full serve pipeline —
    // ivfStoreTopK(nProbe = p) (probe window + pruned store read + rank
    // window), |grid|+1 times. AFTER: one full-probe candidates pass
    // carrying the probe rank; each grid point is a cell_rk <= p window
    // prefix (topKAtProbe). The BEFORE form is still the live serve API —
    // dumped here at p = 2 as the per-point plan the tune used to pay.
    locally {
      val emb = Tables.embeddings(spark, dir)
      val path = "/root/repo/target/qtmp/plans_r14_ivf_store"
      val queries = emb.where("vec_id < 8")
      val nCells = graft.io.IO.storeBuckets(path) - 1
      dump("tune_probe_point_before",
        graft.llm.Ann.ivfStoreTopK(spark, path, queries, k = 10, nProbe = 2))
      val cands = graft.llm.Ann.ivfStoreProbeCandidates(spark, path, queries, nCells)
      dump("tune_probe_candidates_after", cands)
      dump("tune_probe_point_after", graft.llm.Ann.topKAtProbe(cands, k = 10, 2))
    }

    // ---- one-pass refine curve (llm/Ann.scala tuneRefine) ---------------
    // Same shape: BEFORE = one full ADC + flat-refine serve per grid
    // point (ivfPqStoreTopK at refine = r); AFTER = one never-cut ADC +
    // refine candidates pass, each grid point a crk <= r·k prefix.
    locally {
      val emb = Tables.embeddings(spark, dir)
      val path = "/root/repo/target/qtmp/plans_r14_ivfpq_store"
      graft.io.IO.deletePath(path)
      graft.llm.Ann.writeIvfPqStore(emb, path)
      val queries = emb.where("vec_id < 8")
      dump("tune_refine_point_before",
        graft.llm.Ann.ivfPqStoreTopK(spark, path, queries, k = 10,
          nProbe = 4, refine = 2, refineFrom = Some(emb)))
      val cands = graft.llm.Ann.ivfPqRefineCandidates(spark, path, queries,
        nProbe = 4, refineFrom = emb)
      dump("tune_refine_candidates_after", cands)
      dump("tune_refine_point_after", graft.llm.Ann.topKAtRefine(cands, k = 10, 2))
    }

    // ---- survivors-only PQ flat refine (llm/Ann.scala) ------------------
    // BEFORE (verbatim pre-change refine arm, commit af82e2c): the flat
    // corpus is usability-filtered and element-wise double-cast BEFORE
    // the shortlist join — O(corpus × dim) per-row work at serve. AFTER:
    // the current ivfPqStoreTopK serve (refineAgainstFlat) joins the raw
    // vector column first; filter + cast + cosine run on survivors only.
    locally {
      import org.apache.spark.sql.expressions.Window
      val emb = Tables.embeddings(spark, dir)
      val path = "/root/repo/target/qtmp/plans_r14_ivfpq_store"
      val queries = emb.where("vec_id < 8")
      val after = graft.llm.Ann.ivfPqStoreTopK(spark, path, queries, k = 10,
        nProbe = 4, refine = 8, refineFrom = Some(emb))
      dump("pq_refine_after", after)
      // BEFORE form: same shortlist ids (taken from the current serve's
      // output ids — the shortlist derivation is unchanged), old re-attach
      val shortIds = after.select("query_id", "nn_id")
      val qPinned = queries.select(col("vec_id").as("query_id"),
        transform(col("embedding"), x => x.cast("double")).as("qv"))
      val cOld = emb.where(graft.llm.Ann.cosineUsable(col("embedding")))
        .select(col("vec_id").as("nn_id"),
          transform(col("embedding"), x => x.cast("double")).as("cv"))
      dump("pq_refine_before", shortIds
        .join(cOld, Seq("nn_id"))
        .join(broadcast(qPinned), Seq("query_id"))
        .select(col("query_id"), col("nn_id"),
          round(graft.llm.Ann.cosine(col("cv"), col("qv")), 4).as("cosine"))
        .withColumn("rank", row_number().over(Window.partitionBy("query_id")
          .orderBy(col("cosine").desc, col("nn_id").asc)))
        .where(col("rank") <= 10))
    }

    // ---- pairDistances broadcast projection (matching/Distances.scala) --
    // The flagship scoring chain's distance attach. BEFORE (verbatim
    // pre-change body): attachFeatures broadcasts the FULL feature frames
    // (incl. the unused name/description strings). AFTER: projected to
    // (id, three vectors) before the exchange.
    locally {
      val a = graft.er.Catalogs.sideA(spark, dir).where("id % 10 = 0")
        .withColumn("table", lit("abt"))
      val b = graft.er.Catalogs.sideB(spark, dir).where("id % 10 = 0")
        .withColumn("table", lit("buy"))
      val all = a.unionByName(b).select("table", "id", "name", "description", "price")
      val feats = graft.er.EntityResolution.fitFeatures(all,
        graft.er.EntityResolution.Config(w2vMaxIter = 4, descriptBlocking = false))
      val featA = feats.where("table = 'abt'")
      val featB = feats.where("table = 'buy'")
      val pairs = featA.select(col("id").as("idA"))
        .crossJoin(featB.select(col("id").as("idB"))).limit(1000)
      locally { // BEFORE form (verbatim old pairDistances body)
        val attached = pairs
          .join(broadcast(featA.as("A")), col("idA") === col("A.id"))
          .join(broadcast(featB.as("B")), col("idB") === col("B.id"))
        dump("pair_distances_before", attached.select(
          col("idA"), col("idB"),
          graft.matching.Distances.sqdistNative(
            col("A.name_features"), col("B.name_features")).as("name_sqdist"),
          graft.matching.Distances.sqdistNative(
            col("A.descript_features"), col("B.descript_features")).as("descript_sqdist"),
          graft.matching.Distances.sqdistNative(
            col("A.price_features"), col("B.price_features")).as("price_sqdist")))
      }
      dump("pair_distances_after",
        graft.matching.Distances.pairDistances(pairs, featA, featB))
    }

    spark.stop()
  }
}
