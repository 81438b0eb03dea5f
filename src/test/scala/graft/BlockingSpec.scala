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

  test("plan: similarity join stays an equi-join, never cartesian") {
    val model = Blocking.fitLsh(a, "f", bucketLength = 2.0, numHashTables = 6)
    val plan = Blocking.similarityJoin(model, a, b, threshold = 1.0)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"LSH join degraded to cartesian:\n$plan")
  }
}
