package graft

import org.apache.spark.ml.linalg.Vector
import org.apache.spark.sql.functions._
import graft.features.{CharNGrams, TextFeatures}

/** F1-F13 unit tests with hand-computed expectations (SURVEY §5). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("CharNGrams: hand-computed trigram bag, short tokens drop") {
    val df = Seq((1, Seq("widget", "a", "kit"))).toDF("id", "toks")
    val out = df.select(CharNGrams.charNGrams(col("toks"), 3).as("ng"))
      .as[Seq[String]].head()
    // "widget" -> wid,idg,dge,get ; "a" -> (too short) ; "kit" -> kit
    assert(out == Seq("wid", "idg", "dge", "get", "kit"))
  }

  test("CharNGrams transformer: persists and reloads with params intact") {
    val t = new CharNGrams().setInputCol("toks").setOutputCol("ng").setN(4)
    val path = "/root/repo/target/test_tmp/charngrams"
    t.write.overwrite().save(path)
    val loaded = CharNGrams.load(path)
    assert(loaded.getN == 4)
    val out = loaded.transform(Seq((1, Seq("abcde"))).toDF("id", "toks"))
      .select("ng").as[Seq[String]].head()
    assert(out == Seq("abcd", "bcde"))
  }

  test("tokenizer: lowercases and splits on non-word chars, minTokenLength=1") {
    val df = Seq((1, "Sharp TV-42in & dock!")).toDF("id", "name")
    val out = TextFeatures.tokenizer("name", "toks").transform(df)
      .select("toks").as[Seq[String]].head()
    assert(out == Seq("sharp", "tv", "42in", "dock"))
  }

  test("name pipeline: L2 norm of features is 1 (Normalizer last)") {
    val df = Seq(("abt", 1, "cold steel widget"), ("abt", 2, "fine brass bolt"),
      ("buy", 3, "cold iron widget")).toDF("table", "id", "name")
    val m = TextFeatures.namePipeline().fit(df)
    val norms = m.transform(df).select("name_features")
      .collect().map(_.getAs[Vector](0)).map(v => math.sqrt(v.toArray.map(x => x * x).sum))
    norms.foreach(n => assert(math.abs(n - 1.0) < 1e-9))
  }

  test("IDF weights: 3-doc corpus, hand-computed log((N+1)/(df+1))") {
    // "shared" appears in all 3 docs, "rare" in 1.
    val df = Seq((1, "shared rare"), (2, "shared other"), (3, "shared more"))
      .toDF("id", "text")
    val docs = df.select($"id", split($"text", " ").as("toks"))
    val tf = new org.apache.spark.ml.feature.CountVectorizer()
      .setInputCol("toks").setOutputCol("tf").fit(docs)
    val idf = new org.apache.spark.ml.feature.IDF().setInputCol("tf")
      .setOutputCol("tfidf").fit(tf.transform(docs))
    val byWord = tf.vocabulary.zip(idf.idf.toArray).toMap
    assert(math.abs(byWord("shared") - math.log(4.0 / 4.0)) < 1e-9)
    assert(math.abs(byWord("rare") - math.log(4.0 / 2.0)) < 1e-9)
  }

  test("HashingTF binary: presence-only values, configured dim") {
    val df = Seq((1, Seq("a", "a", "a", "b"))).toDF("id", "toks")
    val tf = new org.apache.spark.ml.feature.HashingTF()
      .setInputCol("toks").setOutputCol("v").setNumFeatures(64).setBinary(true)
    val v = tf.transform(df).select("v").collect().head.getAs[Vector](0)
    assert(v.size == 64)
    assert(v.toArray.forall(x => x == 0.0 || x == 1.0)) // binary despite a×3
  }

  test("Word2Vec: seeded fit is deterministic; vector size as configured") {
    val docs = Tables.documents(spark, sf).where("doc_id < 60")
    def fit() = TextFeatures.descriptW2VPipeline(
      input = "text", output = "f", vectorSize = 16, minCount = 2, maxIter = 1)
      .fit(docs).transform(docs.limit(5))
      .select("f").collect().map(_.getAs[Vector](0).toArray.toSeq).toSeq
    val (a, b) = (fit(), fit())
    assert(a.head.size == 16)
    assert(a.toSeq == b.toSeq) // same seed → identical embeddings
  }

  test("VectorAssembler handleInvalid=keep: null price kept as NaN vector") {
    val df = Seq((1, Some(9.5f)), (2, None)).toDF("id", "price_f")
    val out = TextFeatures.pricePipeline().fit(df).transform(df)
      .select("price_features").collect().map(_.getAs[Vector](0))
    assert(out(0)(0) == 9.5)
    assert(out(1)(0).isNaN) // row kept, not dropped
  }

  test("buildFeatures: emits the abtbuyfeatures-shaped table") {
    val cats = Tables.part(spark, sf).limit(40)
      .selectExpr("'abt' as table", "p_partkey as id", "p_name as name",
        "p_type as description", "concat('$', p_retailprice) as price")
    val (_, _, _, feats) = TextFeatures.buildFeatures(cats, w2vMaxIter = 1)
    assert(feats.columns.toSeq ==
      Seq("table", "id", "name", "description",
        "name_features", "descript_features", "price_features"))
    assert(feats.count() == 40)
  }
}
