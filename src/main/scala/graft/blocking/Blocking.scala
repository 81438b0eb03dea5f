package graft.blocking

import org.apache.spark.ml.feature.{BucketedRandomProjectionLSH, BucketedRandomProjectionLSHModel}
import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocking layer — the operator that makes entity resolution sub-O(n²)
  * (J4/J5, ref `02_Build Training Pairs.py:93-106,142-155`,
  * `03_Train & Deploy Model.py:506-538`).
  *
  * `approxSimilarityJoin` internally posexplodes the `numHashTables` bucket
  * ids per row and equi-joins on (hash-table index, bucket id) — a plain
  * shuffled hash join, never a cartesian product. `fitLsh` takes an explicit
  * seed (the reference relies on default seeding; semantics unchanged).
  *
  * Scale notes: keep `numHashTables`/`bucketLength` configurable — on skewed
  * data a hot bucket turns the equi-join into a skew join; AQE skew-join
  * handles moderate cases, shorter `bucketLength` splits hot buckets.
  * `crossJoinExact` is the correctness oracle only (`02:52` discusses and
  * rejects it at scale); guard its use to small inputs.
  *
  * Note: the reference's description-candidate join accidentally joins the
  * abt side to itself (`02:144-145`) where its prose says abt↔buy. This
  * engine implements the documented A-vs-B semantics; `BlockingSpec` pins it.
  */
object Blocking {

  /** Fit a bucketed random-projection LSH model (Euclidean). */
  def fitLsh(df: DataFrame, inputCol: String, bucketLength: Double = 1.0,
             numHashTables: Int = 10, seed: Long = 42L,
             outputCol: String = "hashes"): BucketedRandomProjectionLSHModel =
    new BucketedRandomProjectionLSH()
      .setInputCol(inputCol).setOutputCol(outputCol)
      .setBucketLength(bucketLength).setNumHashTables(numHashTables)
      .setSeed(seed)
      .fit(df)

  /** J4 — approximate similarity join, flattened to the reference's
    * candidate-pair projection (`02:100-106`): idA/idB plus the exact
    * distance of each surviving pair. */
  def similarityJoin(model: BucketedRandomProjectionLSHModel,
                     a: DataFrame, b: DataFrame, threshold: Double,
                     distCol: String = "distance"): DataFrame =
    model.approxSimilarityJoin(a, b, threshold, distCol)
      .selectExpr("datasetA.id as idA", "datasetB.id as idB", distCol)

  /** Scale-critical variant: LSH-join *distinct blocking keys* (e.g. the
    * normalized name string — identical key ⇒ identical feature vector),
    * then expand back to id pairs only for key pairs that already passed
    * the exact distance filter.
    *
    * Why: duplicate keys must never flow through an LSH join. With g ids
    * sharing a key, the naive join carries g×g id pairs per colliding key
    * pair through the explode/dedup shuffle — quadratic in the duplication
    * factor (observed: ~10⁷-row shuffles on a 2k-row catalog sample at
    * sf0.1). Joining representatives is lossless (same vectors, same
    * distances), keeps the LSH shuffle linear in *distinct* keys, and the
    * id expansion afterwards is exactly the size of the true candidate
    * set — irreducible output, not intermediate state.
    */
  def dedupedSimilarityJoin(a: DataFrame, b: DataFrame, keyCol: String,
                            featureCol: String, threshold: Double,
                            bucketLength: Double = 1.0, numHashTables: Int = 10,
                            seed: Long = 42L): DataFrame = {
    def reps(df: DataFrame) =
      df.groupBy(col(keyCol).as("key"))
        .agg(first(col(featureCol)).as(featureCol))
        .withColumn("id", col("key")) // similarityJoin expects an `id` column
    val ra = reps(a).cache()
    val rb = reps(b).cache()
    val model = fitLsh(ra, featureCol, bucketLength, numHashTables, seed)
    val keyPairs = similarityJoin(model, ra, rb, threshold)
      .select(col("idA").as("keyA"), col("idB").as("keyB"), col("distance"))
    val out = keyPairs
      .join(a.select(col(keyCol).as("keyA"), col("id").as("idA")), Seq("keyA"))
      .join(b.select(col(keyCol).as("keyB"), col("id").as("idB")), Seq("keyB"))
      .select("idA", "idB", "distance")
      // materialize (lineage-truncating local checkpoint), then drop the
      // representative caches — otherwise every invocation in a long
      // session leaks two cached frames into storage memory
      .localCheckpoint()
    ra.unpersist(blocking = false)
    rb.unpersist(blocking = false)
    out
  }

  private val sqdistUdf = udf { (x: Vector, y: Vector) => Vectors.sqdist(x, y) }

  /** J5 — exact cross-join similarity oracle (small inputs only). */
  def crossJoinExact(a: DataFrame, b: DataFrame, featureCol: String,
                     threshold: Double): DataFrame = {
    val aa = a.select(col("id").as("idA"), col(featureCol).as("fA"))
    val bb = b.select(col("id").as("idB"), col(featureCol).as("fB"))
    aa.crossJoin(bb)
      .withColumn("distance", sqrt(sqdistUdf(col("fA"), col("fB"))))
      .where(col("distance") < threshold)
      .select("idA", "idB", "distance")
  }
}
