package graft

import org.apache.spark.sql.functions._
import graft.llm.QualityModel

/** Weak-label quality classifier: degradations, separability, scoring. */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private lazy val real = (1L to 60L).map { i =>
    (i, s"the quick brown fox number $i jumps over the lazy dog and then " +
      s"walks to the market with a basket of ${i % 7} apples for the fair")
  }.toDF("doc_id", "text")

  test("fitScore: separates real text from degradations on a holdout") {
    val r = QualityModel.fitScore(real)
    assert(r.auc >= 0.9, s"auc=${r.auc}")
    assert(r.nPos == 60 && r.nNeg == 60)
    val probs = r.scores.select("quality_prob").as[Double].collect()
    assert(probs.length == 60)
    assert(probs.forall(p => p >= 0.0 && p <= 1.0))
    assert(probs.sum / probs.length > 0.5, "real docs should score high on average")
  }

  test("garble: deterministic, and each mode is degenerate by construction") {
    val g = real.select($"doc_id",
      QualityModel.garble($"text", $"doc_id").as("g"))
    val again = real.select($"doc_id",
      QualityModel.garble($"text", $"doc_id").as("g"))
    assert(g.collect().toSeq == again.collect().toSeq)
    val rep = g.where($"doc_id" % 3 === 0).select("g").as[String].head()
    assert(rep.split(" ").distinct.length == 1) // repetition mode: one token
    val strip = g.where($"doc_id" % 3 === 1).select("g").as[String].head()
    assert(!strip.contains(" "))                // stripping mode: mega-token
    val trunc = g.where($"doc_id" % 3 === 2).select("g").as[String].head()
    assert(trunc.split(" ").length == 2)        // truncation mode: 2 tokens
  }

  test("fitScore: null-text rows are excluded from training but still scored") {
    val withNull = real.unionByName(
      Seq((999L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val r = QualityModel.fitScore(withNull)
    assert(r.nPos == 60)
    assert(r.scores.count() == 61)
    assert(r.scores.where($"doc_id" === 999L && $"quality_prob".isNotNull)
      .count() == 1)
  }
}
