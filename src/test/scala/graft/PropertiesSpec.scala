package graft

import org.apache.spark.ml.linalg.Vectors
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.apache.spark.sql.functions._
import graft.llm.{Ann, TextAnalysis}

/** ScalaCheck-generator-driven properties (SURVEY §5): kernel identities and
  * idempotences. Generators are sampled with fixed seeds (the
  * scalatestplus bridge artifact is not in the offline cache, so sampling
  * is driven manually — same generators, deterministic). */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private val vecGen = Gen.listOfN(8, Gen.chooseNum(-10.0, 10.0))

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(i.toLong)))

  test("sqdist: zero on self, symmetric, nonnegative (50 random vectors)") {
    samples(Gen.zip(vecGen, vecGen), 50).foreach { case (a, b) =>
      val (va, vb) = (Vectors.dense(a.toArray), Vectors.dense(b.toArray))
      assert(math.abs(Vectors.sqdist(va, vb) - Vectors.sqdist(vb, va)) < 1e-9)
      assert(Vectors.sqdist(va, vb) >= 0.0)
      assert(Vectors.sqdist(va, va) == 0.0)
    }
  }

  test("union+distinct idempotent: candidates(x, x) == distinct(x)") {
    val base = Seq((1, 2), (1, 2), (3, 4)).toDF("idA", "idB")
    val once = graft.pairs.Pairs.candidates(base, base)
    assert(once.count() == 2)
    assert(graft.pairs.Pairs.candidates(once, once).count() == 2)
  }

  test("normalizer idempotent: normalizing a unit vector is identity") {
    val units = samples(vecGen.suchThat(_.exists(_ != 0.0)), 20).map { a =>
      val v = a.toArray
      val n = math.sqrt(v.map(x => x * x).sum)
      Vectors.dense(v.map(_ / n))
    }
    val df = units.map(Tuple1(_)).toDF("v")
    val out = new org.apache.spark.ml.feature.Normalizer()
      .setInputCol("v").setOutputCol("o").setP(2.0)
      .transform(df).select("v", "o").collect()
      .map(r => (r.getAs[org.apache.spark.ml.linalg.Vector](0),
                 r.getAs[org.apache.spark.ml.linalg.Vector](1)))
    out.foreach { case (u, r) =>
      u.toArray.zip(r.toArray).foreach { case (x, y) =>
        assert(math.abs(x - y) < 1e-9)
      }
    }
  }

  test("cosine bounded in [-1, 1] on fixture embeddings") {
    val emb = Tables.embeddings(spark, sf).limit(100)
    val vals = emb.as("a").crossJoin(emb.as("b")).limit(500)
      .select(Ann.cosine(
        transform(col("a.embedding"), x => x.cast("double")),
        transform(col("b.embedding"), x => x.cast("double"))).as("c"))
      .as[Double].collect()
    vals.foreach(c => assert(c >= -1.0000001 && c <= 1.0000001))
  }

  test("fingerprint stable under identity, sensitive to permutation") {
    val strs = samples(Gen.alphaNumStr.suchThat(s => s.length > 1 && s.toSet.size > 1), 20)
    strs.foreach { s =>
      val df = Seq((1L, s), (2L, s), (3L, s.reverse)).toDF("doc_id", "text")
      val fp = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("f"))
        .as[(Long, Long)].collect().toMap
      assert(fp(1L) == fp(2L))
      if (s != s.reverse) assert(fp(1L) != fp(3L))
    }
  }

  test("charEntropy bounded: 0 <= H <= log2(len) on fixture documents") {
    val docs = Tables.documents(spark, sf)
    val bad = TextAnalysis.charEntropy(docs)
      .join(docs.select($"doc_id", length($"text").as("len")), "doc_id")
      .where($"char_entropy" < 0.0 ||
        $"char_entropy" > log2(greatest($"len", lit(2)).cast("double")) + 1e-9)
      .count()
    assert(bad == 0L)
  }

  test("boilerplateStats invariants: 0 <= bp_grams <= n_grams, frac consistent") {
    val out = graft.llm.Dedup.boilerplateStats(Tables.documents(spark, sf))
    val bad = out.where($"bp_grams" < 0 || $"bp_grams" > $"n_grams" ||
      $"bp_frac" < 0.0 || $"bp_frac" > 1.0 ||
      abs($"bp_frac" - round($"bp_grams".cast("double") /
        greatest($"n_grams", lit(1L)).cast("double"), 6)) > 1e-9).count()
    assert(bad == 0L)
    // every fixture doc gets a row
    assert(out.count() == Tables.documents(spark, sf).count())
  }

  test("piiScrub invariants: doc count preserved; scrubbed text carries no matches") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.piiScrub(docs)
    assert(out.count() == docs.count())
    // re-scanning the scrubbed text finds nothing left to redact
    val residual = out.where(
      col("scrubbed").rlike(TextAnalysis.EmailRe) ||
      col("scrubbed").rlike(TextAnalysis.Ipv4Re) ||
      col("scrubbed").rlike(TextAnalysis.PhoneRe)).count()
    assert(residual == 0L)
  }

  test("unigramLogProb invariants: score <= 0, n_tok consistent, count preserved") {
    val docs = Tables.documents(spark, sf)
    val out = TextAnalysis.unigramLogProb(docs)
    assert(out.count() == docs.count())
    // probabilities are <= 1 so mean log-prob is <= 0; token-less docs null
    val bad = out.where(
      (col("n_tok") > 0 && (col("avg_logp").isNull || col("avg_logp") > 0.0)) ||
      (col("n_tok") === 0 && col("avg_logp").isNotNull)).count()
    assert(bad == 0L)
  }

  test("sourceDivergence invariants: KL >= 0 per source (Gibbs)") {
    val out = TextAnalysis.sourceDivergence(Tables.documents(spark, sf))
    // round(4) can leave a -0.0; anything below -1e-9 would break Gibbs
    assert(out.where(col("kl") < -1e-9).count() == 0L)
    assert(out.count() == Tables.documents(spark, sf)
      .select("source").distinct().count())
  }

  test("capPerStratum invariants on the fixture: cap respected, subset, deterministic") {
    val docs = Tables.documents(spark, sf)
    val out = graft.llm.Mixing.capPerStratum(docs, "source", "doc_id", k = 10, seed = "p")
    val over = out.groupBy("source").count().where(col("count") > 10)
    assert(over.count() == 0L)
    // output rows are original rows (subset semantics, no mutation)
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() == 0L)
  }

  test("dupSpans invariants on the fixture: disjoint maximal spans, window math") {
    val out = graft.llm.Dedup.dupSpans(Tables.documents(spark, sf), k = 8)
      .select("doc_id", "span_start", "span_len", "n_windows")
      .as[(Long, Int, Int, Long)].collect()
    assert(out.nonEmpty) // the fixture plants near-dup docs with shared runs
    // a span of consecutive duplicated windows has exactly len-k+1 windows
    assert(out.forall { case (_, _, len, nw) => nw == len - 8 + 1 && len >= 8 })
    // spans within a doc are maximal, hence separated by > 0 clean positions
    out.groupBy(_._1).foreach { case (_, spans) =>
      val sorted = spans.sortBy(_._2)
      sorted.sliding(2).foreach {
        case Array((_, s1, l1, _), (_, s2, _, _)) => assert(s1 + l1 - 8 + 1 < s2)
        case _ =>
      }
    }
  }

  test("temperatureSample invariants on the fixture: subset, quota math, determinism") {
    val docs = Tables.documents(spark, sf)
    val out = graft.llm.Mixing.temperatureSample(docs, "source", "doc_id",
      budget = 150L, seed = "p")
    // subset of the corpus, selected at most once
    assert(out.join(docs, Seq("doc_id"), "left_anti").count() == 0L)
    assert(out.select("doc_id").distinct().count() == out.count())
    // integer quotas never overshoot the budget in total
    assert(out.count() <= 150L)
    val again = graft.llm.Mixing.temperatureSample(docs, "source", "doc_id",
      budget = 150L, seed = "p")
    assert(out.select("doc_id").as[Long].collect().toSet ==
      again.select("doc_id").as[Long].collect().toSet)
  }

  test("vocabulary invariants on the fixture: coverage monotone in rank, <= 1") {
    val v = graft.llm.TextAnalysis.vocabulary(Tables.documents(spark, sf), topK = 50)
      .select("rank", "coverage").as[(Int, Double)].collect().sortBy(_._1)
    assert(v.nonEmpty && v.forall(_._2 <= 1.0 + 1e-9))
    v.sliding(2).foreach {
      case Array((_, c1), (_, c2)) => assert(c2 >= c1 - 1e-9)
      case _ =>
    }
    // counts are monotone non-increasing in rank by construction
    val cnts = graft.llm.TextAnalysis.vocabulary(Tables.documents(spark, sf), topK = 50)
      .select("rank", "cnt").as[(Int, Long)].collect().sortBy(_._1).map(_._2)
    cnts.sliding(2).foreach {
      case Array(a, b) => assert(b <= a)
      case _ =>
    }
  }

  test("shuffleShards invariants on the fixture: permutation across shards") {
    val docs = Tables.documents(spark, sf)
    val out = graft.llm.Mixing.shuffleShards(docs, "doc_id", "p", 8)
    assert(out.count() == docs.count())
    assert(out.select("doc_id").distinct().count() == docs.count())
    // per-shard max pos equals per-shard count (contiguous ranks)
    val bad = out.groupBy("shard")
      .agg(max("pos").as("mx"), count(lit(1)).as("n"))
      .where(col("mx") =!= col("n"))
    assert(bad.count() == 0L)
  }
}
