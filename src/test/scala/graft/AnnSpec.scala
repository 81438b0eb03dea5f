package graft

import org.apache.spark.sql.functions._
import graft.llm.Ann

/** ANN: brute-force exactness + LSH recall against it. */
class AnnSpec extends SparkSpec {
  import spark.implicits._

  test("bruteTopK: hand-built vectors rank by cosine, query excluded") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0.0f, 1.0f)), (4L, Array(-1.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = Ann.bruteTopK(corpus, corpus.where($"vec_id" === 1), k = 2)
      .select("query_id", "nn_id", "rank").as[(Long, Long, Int)].collect().toSet
    assert(out == Set((1L, 2L, 1), (1L, 3L, 2))) // 2 closest, then orthogonal; self excluded
  }

  test("lshTopK recall vs brute on the embeddings fixture") {
    val emb = Tables.embeddings(spark, sf)
    val queries = emb.where("vec_id < 5")
    val brute = Ann.bruteTopK(emb, queries, k = 10)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val lsh = Ann.lshTopK(emb, queries, k = 10, numHashTables = 12, bucketLength = 4.0)
      .select("query_id", "nn_id").as[(Long, Long)].collect().toSet
    val recall = brute.intersect(lsh).size.toDouble / brute.size
    assert(recall >= 0.5, s"LSH recall too low: $recall")
  }

  test("bruteTopK: k bound respected per query") {
    val emb = Tables.embeddings(spark, sf)
    val out = Ann.bruteTopK(emb, emb.where("vec_id < 3"), k = 7)
    val counts = out.groupBy("query_id").count().as[(Long, Long)].collect().toMap
    assert(counts.values.forall(_ == 7))
  }
}
