package graft

import org.apache.spark.sql.functions._
import graft.llm.{LangId, TextAnalysis}

/** Text-analysis operators: hand-computed expectations. */
class TextAnalysisSpec extends SparkSpec {
  import spark.implicits._

  test("tokens: lowercase alnum, empty tokens dropped") {
    val out = Seq((1, "Hello, World!! 42x  ")).toDF("id", "text")
      .select(TextAnalysis.tokens($"text")).as[Seq[String]].head()
    assert(out == Seq("hello", "world", "42x"))
  }

  test("normalizeText: NFC composition, control strip, whitespace collapse, trim") {
    // "e" + COMBINING ACUTE (U+0301) must compose to U+00E9 under NFC —
    // the decomposed and precomposed spellings of the same word become
    // byte-identical (what every hash-keyed dedup upstream relies on)
    val decomposed = "cafe\u0301"  // e + COMBINING ACUTE ACCENT
    val precomposed = "caf\u00e9"  // precomposed e-acute
    val df = Seq(
      (1L, s"  $decomposed \u0007 bar\t\tbaz \n"),  // BEL strips, tabs collapse
      (2L, precomposed + " bar baz"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    val got = df.select($"doc_id",
        TextAnalysis.normalizeText($"text").as("n"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) == got(2L))            // NFC unifies the two spellings
    assert(got(2L) == precomposed + " bar baz")
    assert(got(3L) == null)               // null propagates, no NPE
  }

  test("normalizeText: already-normalized ASCII is identity") {
    val s = "plain ascii text 123"
    val out = Seq(Tuple1(s)).toDF("text")
      .select(TextAnalysis.normalizeText($"text")).as[String].head()
    assert(out == s)
  }

  test("tokenCounts: whitespace vs alnum vs BPE-ish") {
    val df = Seq((1L, "don't stop-me now 99")).toDF("doc_id", "text")
    val (ws, alnum, bpe) = TextAnalysis.tokenCounts(df)
      .select("ws_tokens", "alnum_tokens", "bpeish_tokens")
      .as[(Int, Int, Int)].head()
    assert(ws == 4)        // don't | stop-me | now | 99
    assert(alnum == 6)     // don, t, stop, me, now, 99
    assert(bpe == 9)       // don ' t stop - me now 9 9
  }

  test("fingerprint: deterministic rolling hash, differs across texts") {
    val df = Seq((1L, "abc"), (2L, "abd"), (3L, "abc")).toDF("doc_id", "text")
    val fp = df.select($"doc_id", TextAnalysis.fingerprint($"text").as("f"))
      .as[(Long, Long)].collect().toMap
    // hand-computed: ((0*31+97)*31+98)*31+99 = 97*961 + 98*31 + 99
    assert(fp(1L) == 97L * 961 + 98 * 31 + 99)
    assert(fp(1L) == fp(3L) && fp(1L) != fp(2L))
  }

  test("langid: marker-word argmax with deterministic tie-break") {
    val df = Seq(
      (1L, "the cat and the dog is in that house"),
      (2L, "der hund ist nicht ein problem und das"),
      (3L, "zzz qqq xxx")) // no markers anywhere → tie at 0 → first lang asc
      .toDF("doc_id", "text")
    val out = LangId.predict(df).select("doc_id", "lang_pred")
      .as[(Long, String)].collect().toMap
    assert(out(1L) == "en" && out(2L) == "de" && out(3L) == "de")
  }

  test("qualityScore: ratios bounded and consistent") {
    val out = TextAnalysis.qualityScore(
      Seq((1L, "Clean text, with words.")).toDF("doc_id", "text"))
      .as[(Long, Double, Double, Double, Double, Double)].head()
    val (_, n, alpha, punct, stopr, mwl) = out
    assert(n == 23.0)
    assert(alpha > 0.7 && alpha < 1.0)
    assert(punct > 0.0 && punct < 0.2)
    assert(stopr >= 0.0 && stopr <= 1.0 && mwl > 0)
  }

  test("repetitionStats: hand-computed token/bigram mode fractions") {
    val df = Seq(
      (1L, "a a a b"),   // toks: a,a,a,b  bigrams: "a a","a a","a b"
      (2L, "x y z"),     // all distinct; bigrams "x y","y z" each once
      (3L, "solo"))      // 1 token, 0 bigrams
      .toDF("doc_id", "text")
    val out = TextAnalysis.repetitionStats(df)
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((4, 0.5, 0.75, round6(2.0 / 3))))
    assert(out(2L) == ((3, 1.0, round6(1.0 / 3), 0.5)))
    assert(out(3L) == ((1, 1.0, 1.0, 0.0)))
  }

  private def round6(d: Double): Double = BigDecimal(d)
    .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("chunk: overlapping windows cover the text; short docs get one chunk") {
    // len 10, chunkLen 6, stride 4 → starts 0,4,8 → "abcdef","efghij","ij"
    val df = Seq((1L, "abcdefghij"), (2L, "xy"), (3L, "")).toDF("doc_id", "text")
    val out = TextAnalysis.chunk(df, chunkLen = 6, stride = 4)
      .as[(Long, Int, String)].collect().toSet
    assert(out == Set((1L, 0, "abcdef"), (1L, 1, "efghij"), (1L, 2, "ij"),
      (2L, 0, "xy"))) // empty text yields no chunks
  }

  test("charEntropy: hand-computed bits/char, null and empty edges") {
    val df = Seq((1L, "aaaa"), (2L, "ab"), (3L, "abcd"), (4L, ""),
      (5L, null.asInstanceOf[String]), (6L, "😀😀"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.charEntropy(df)
      .as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(0.0))   // one symbol, no information
    assert(out(2L).contains(1.0))   // two equiprobable symbols = 1 bit
    assert(out(3L).contains(2.0))   // four equiprobable symbols = 2 bits
    assert(out(4L).contains(0.0))   // empty text
    assert(out(5L).isEmpty)         // null propagates
    assert(out(6L).contains(0.0))   // two identical emoji = ONE codepoint
                                    // symbol repeated, not 4 UTF-16 units
  }

  test("piiScrub: hand-built PII is counted and redacted; clean text untouched") {
    val df = Seq(
      (1L, "mail a.b+c@ex-1.org and d@e.co here"),
      (2L, "server 192.168.0.1 and 10.0.0.255"),
      (3L, "call +4915112345678 now"),
      (4L, "nothing sensitive 1.2 here"),      // 1.2 is not an IPv4
      (5L, "mixed x@y.zz at 8.8.8.8 tel +1234567"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.piiScrub(df)
      .as[(Long, Int, Int, Int, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out(1L) == ((2, 0, 0, "mail <EMAIL> and <EMAIL> here")))
    assert(out(2L) == ((0, 2, 0, "server <IP> and <IP>")))
    assert(out(3L) == ((0, 0, 1, "call <PHONE> now")))
    assert(out(4L) == ((0, 0, 0, "nothing sensitive 1.2 here")))
    assert(out(5L) == ((1, 1, 1, "mixed <EMAIL> at <IP> tel <PHONE>")))
  }

  test("sourceDivergence: hand-computed KL(source || corpus)") {
    // source A tokens: a a b ; source B tokens: a b b b
    // corpus: p(a)=3/7, p(b)=4/7
    val df = Seq((1L, "a a b", "A"), (2L, "a b b b", "B"))
      .toDF("doc_id", "text", "source")
    val out = TextAnalysis.sourceDivergence(df)
      .as[(String, Long, Double)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val klA = 2.0/3 * math.log((2.0/3) / (3.0/7)) + 1.0/3 * math.log((1.0/3) / (4.0/7))
    val klB = 1.0/4 * math.log((1.0/4) / (3.0/7)) + 3.0/4 * math.log((3.0/4) / (4.0/7))
    assert(out("A") == ((3L, r4(klA))))
    assert(out("B") == ((4L, r4(klB))))
    assert(klA > 0 && klB > 0) // KL is positive for differing distributions
  }

  test("bm25: hand-computed scores; null/empty docs count toward N but never hit") {
    val docs = Seq(
      (1L, "cat dog cat"),
      (2L, "dog fish"),
      (3L, "bird"),
      (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("cat", "fish"))
      .as[(Long, Int, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // N = 4 docs; avgdl over the 3 token-bearing docs = (3+2+1)/3 = 2.0;
    // df(cat) = df(fish) = 1 → idf = ln(1 + 3.5/1.5)
    val idf = math.log(1.0 + 3.5 / 1.5)
    def w(tf: Double, dl: Double) =
      idf * (tf * 2.2) / (tf + 1.2 * (0.25 + 0.75 * dl / 2.0))
    // HALF_UP: Spark's round() rule
    def r4(x: Double) =
      BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out.keySet == Set(1L, 2L))
    assert(out(1L) == ((1, r4(w(2.0, 3.0)))))  // "cat" twice in a 3-token doc
    assert(out(2L) == ((1, r4(w(1.0, 2.0)))))
    // two-term hit: both terms contribute
    val multi = TextAnalysis.bm25(docs, Seq("cat", "dog"))
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._2).toMap
    assert(multi(1L) == 2 && multi(2L) == 1)
  }

  test("bm25 retrieval properties: tf saturation, length normalization, idf") {
    // one query term "cat"; docs engineered to isolate each property
    val docs = Seq(
      (1L, "cat dog pig owl"),            // tf 1, dl 4
      (2L, "cat cat dog pig"),            // tf 2, dl 4 — more hits, same length
      (3L, "cat dog pig owl bat cow hen fox"), // tf 1, dl 8 — same hits, longer
      (4L, "dog pig owl bat"))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bm25(docs, Seq("cat"))
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._3).toMap
    // monotone in tf at equal length...
    assert(out(2L) > out(1L), s"more occurrences must score higher: $out")
    // ...but saturating: the second occurrence adds less than the first
    assert(out(2L) < 2 * out(1L), s"tf must saturate, not scale linearly: $out")
    // length normalization: same tf in a longer doc scores lower
    assert(out(3L) < out(1L), s"longer doc with equal tf must score lower: $out")
    // idf: the same corpus scored for a COMMON term ("dog", df 4) ranks
    // any hit below the rare term's hit ("cat", df 3) at equal tf/dl
    val common = TextAnalysis.bm25(docs, Seq("dog"))
      .as[(Long, Int, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(common(1L) < out(1L),
      s"common-term hit must weigh less than rare-term hit: $common vs $out")
  }

  test("Bm25Store: build + O(delta) append serve EXACTLY the full-scan " +
       "scores (df/avgdl/n_docs included), reading only the query terms' " +
       "buckets") {
    import graft.llm.Bm25Store
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "bird"),
      (4L, null.asInstanceOf[String]), (5L, ""), // stats-only docs
      (6L, "cat fish fish dog"), (7L, "owl bat cat"))
      .toDF("doc_id", "text")
    val path = "/root/repo/target/qtmp/txspec_bm25_store"
    graft.io.IO.deletePath(path)
    // build on part of the corpus, append the rest — full coverage must
    // come out of the atomic (postings + stats-delta) append commits
    Bm25Store.write(docs.where("doc_id <= 4"), path, termBuckets = 16)
    Bm25Store.append(docs.where("doc_id > 4"), path)
    val terms = Seq("cat", "fish")
    val served = Bm25Store.scores(spark, path, terms)
      .as[(Long, Int, Double)].collect().toSet
    val scanned = TextAnalysis.bm25(docs, terms)
      .as[(Long, Int, Double)].collect().toSet
    assert(served == scanned, s"served=$served scanned=$scanned")
    // pruned read: the serve plan's input files span at most
    // |query terms| posting buckets plus the one stats bucket
    val buckets = Bm25Store.scores(spark, path, terms).inputFiles
      .flatMap("__graft_bucket=(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).toSet
    assert(buckets.size <= terms.size + 1,
      s"serve read ${buckets.size} buckets ($buckets) for ${terms.size} terms")
    assert(buckets.contains(16), "the reserved stats bucket must be read")
    // topK: deterministic (score desc, id asc) bound
    val top = Bm25Store.topK(spark, path, terms, k = 2)
      .as[(Long, Int, Double)].collect()
    assert(top.length == 2)
    assert(top.map(_._3).toSeq == top.map(_._3).sortBy(-_).toSeq)
    // served history is versioned: the pre-append snapshot scores the
    // BUILD corpus exactly (consistent postings+stats at that version)
    val v1 = graft.io.IO.storeVersions(spark, path).head
    val statsV1 = graft.io.IO.readPartitionedStoreAt(spark, path, v1)
      .where(col("term") === "__STATS__")
      .agg(sum("n_docs"), sum("sum_dl")).as[(Long, Long)].head()
    assert(statsV1 == ((4L, 6L))) // 4 docs, 3+2+1 tokens at build time
  }

  test("Bm25Store: staleness report — append accounting from the stats " +
       "rows, fragmentation pressure from the manifest, fresh build clean") {
    import graft.llm.Bm25Store
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "bird"),
      (4L, "cat fish fish dog"), (5L, "owl bat cat"), (6L, "dog owl"))
      .toDF("doc_id", "text")
    val path = "/root/repo/target/qtmp/txspec_bm25_stale"
    graft.io.IO.deletePath(path)
    Bm25Store.write(docs.where("doc_id <= 4"), path, termBuckets = 8)
    val fresh = Bm25Store.staleness(spark, path)
      .as[(Long, Long, Double, Long, Long)].head()
    assert(fresh == ((4L, 4L, 0.0, 0L, 1L)),
      s"fresh build should report zero appends and one generation: $fresh")
    Bm25Store.append(docs.where("doc_id > 4"), path)
    val after = Bm25Store.staleness(spark, path)
      .as[(Long, Long, Double, Long, Long)].head()
    assert(after._1 == 4L && after._2 == 6L, s"doc accounting drifted: $after")
    assert(math.abs(after._3 - 2.0 / 6.0) < 1e-6, s"appended_frac wrong: $after")
    // the append touched at least one posting bucket twice
    assert(after._4 >= 1L && after._5 == 2L, s"fragmentation not surfaced: $after")
    // compaction clears the fragmentation pressure while serving
    // bit-identical scores (summed stats rows preserved, co-located)
    val terms = Seq("cat", "dog", "owl")
    val pre = Bm25Store.scores(spark, path, terms)
      .as[(Long, Int, Double)].collect().toSet
    Bm25Store.compact(spark, path)
    val post = Bm25Store.staleness(spark, path)
      .as[(Long, Long, Double, Long, Long)].head()
    assert(post._4 == 0L && post._5 == 1L,
      s"compaction left fragmentation: $post")
    assert(post._1 == 4L && post._2 == 6L,
      s"compaction changed doc accounting: $post")
    val post2 = Bm25Store.scores(spark, path, terms)
      .as[(Long, Int, Double)].collect().toSet
    assert(post2 == pre, "compaction changed served scores")
  }

  test("Bm25Store: keyed DELETE + re-index UPSERT — one atomic commit " +
       "each, postings and stats adjust so serve equals a from-scratch " +
       "rebuild bit-for-bit, history preserved, no-ops commit nothing") {
    import graft.llm.Bm25Store
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "bird"),
      (4L, "cat fish fish dog"), (5L, "owl bat cat"))
      .toDF("doc_id", "text")
    val path = "/root/repo/target/qtmp/txspec_bm25_mut"
    graft.io.IO.deletePath(path)
    Bm25Store.write(docs, path, termBuckets = 8)
    val v1 = graft.io.IO.storeVersions(spark, path).last
    def serveEqualsRebuild(corpus: org.apache.spark.sql.DataFrame,
                           terms: Seq[String]): Unit = {
      val rb = "/root/repo/target/qtmp/txspec_bm25_mut_rb"
      graft.io.IO.deletePath(rb)
      Bm25Store.write(corpus, rb, termBuckets = 8)
      val a = Bm25Store.scores(spark, path, terms)
        .as[(Long, Int, Double)].collect().toSet
      val b = Bm25Store.scores(spark, rb, terms)
        .as[(Long, Int, Double)].collect().toSet
      assert(a == b, s"served=$a rebuild=$b")
    }
    // DELETE doc 2: its postings vanish from every term bucket, the
    // stats compensate (n_docs/avgdl shift), ONE commit
    Bm25Store.delete(spark, path, Seq(2L).toDF("doc_id"))
    assert(graft.io.IO.storeVersions(spark, path).last == v1 + 1)
    val afterDel = docs.where("doc_id != 2")
    serveEqualsRebuild(afterDel, Seq("dog", "fish", "cat"))
    // UPSERT: doc 3 re-indexes to entirely different terms (its old
    // posting must vanish, the new ones land), doc 9 is novel — ONE
    // commit for both
    Bm25Store.upsert(Seq((3L, "omega cat"), (9L, "omega omega bat"))
      .toDF("doc_id", "text"), path)
    assert(graft.io.IO.storeVersions(spark, path).last == v1 + 2)
    val updated = afterDel.where("doc_id != 3")
      .unionByName(Seq((3L, "omega cat"), (9L, "omega omega bat"))
        .toDF("doc_id", "text"))
    serveEqualsRebuild(updated, Seq("omega", "cat", "bird", "bat"))
    // the replaced doc's OLD term no longer hits it
    assert(Bm25Store.scores(spark, path, Seq("bird"))
      .where(col("doc_id") === 3L).count() == 0L)
    // time travel: the pre-mutation version still scores the original
    // corpus (postings + stats consistent at that version)
    val statsV1 = graft.io.IO.readPartitionedStoreAt(spark, path, v1)
      .where(col("term") === "__STATS__")
      .agg(sum("n_docs")).as[Long].head()
    assert(statsV1 == 5L)
    // no-op delete (no posting for the id) and empty upsert commit nothing
    val vNow = graft.io.IO.storeVersions(spark, path).last
    Bm25Store.delete(spark, path, Seq(777L).toDF("doc_id"))
    Bm25Store.upsert(Seq.empty[(Long, String)].toDF("doc_id", "text"), path)
    assert(graft.io.IO.storeVersions(spark, path).last == vNow)
    // a duplicated delta doc_id fails fast (its texts would silently
    // merge in the tf groupBy)
    intercept[Exception] {
      Bm25Store.upsert(Seq((8L, "x y"), (8L, "z")).toDF("doc_id", "text"), path)
    }
  }

  test("Bm25Store: registry rows make delete/upsert stats EXACT for " +
       "token-less and null-text docs (idf equals a from-scratch rebuild); " +
       "the -1 stats sentinel is rejected loudly") {
    import graft.llm.Bm25Store
    // docs 6 (empty token surface) and 7 (null text) leave no posting
    // trail — the exact cases the old aggregate-stats layout could not
    // un-count from n_docs on delete, and double-counted on upsert
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "bird cat"),
      (6L, "!!!"), (7L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val path = "/root/repo/target/qtmp/txspec_bm25_reg"
    graft.io.IO.deletePath(path)
    Bm25Store.write(docs, path, termBuckets = 8)
    def servedStats(): (Long, Long) = {
      val r = graft.io.IO.readPartitionedStore(spark, path)
        .where(col("term") === "__STATS__")
        .agg(sum("n_docs"), sum("n_dl")).as[(Long, Long)].head()
      r
    }
    assert(servedStats() == ((5L, 4L)),
      "build: 5 docs, 4 with a (possibly empty) token surface")
    def serveEqualsRebuild(corpus: org.apache.spark.sql.DataFrame): Unit = {
      val rb = "/root/repo/target/qtmp/txspec_bm25_reg_rb"
      graft.io.IO.deletePath(rb)
      Bm25Store.write(corpus, rb, termBuckets = 8)
      val terms = Seq("cat", "dog", "fish", "bird")
      val a = Bm25Store.scores(spark, path, terms)
        .as[(Long, Int, Double)].collect().toSet
      val b = Bm25Store.scores(spark, rb, terms)
        .as[(Long, Int, Double)].collect().toSet
      assert(a == b, s"served=$a rebuild=$b")
    }
    // DELETE the token-less and null-text docs: n_docs must drop to 3
    // (idf shifts — serveEqualsRebuild would catch a stale count)
    Bm25Store.delete(spark, path, Seq(6L, 7L).toDF("doc_id"))
    assert(servedStats() == ((3L, 3L)), "token-less docs un-counted exactly")
    serveEqualsRebuild(docs.where("doc_id in (1, 2, 3)"))
    // UPSERT a doc back in with real text: previously its stored
    // token-less twin double-counted n_docs; now it replaces cleanly
    Bm25Store.upsert(Seq((1L, "owl owl")).toDF("doc_id", "text"), path)
    assert(servedStats() == ((3L, 3L)), "re-index keeps n_docs exact")
    // and a doc RE-INDEXED TO token-less text stays a counted corpus
    // member (exactly as a fresh build over the updated corpus counts it)
    Bm25Store.upsert(Seq((2L, "???")).toDF("doc_id", "text"), path)
    assert(servedStats() == ((3L, 3L)))
    serveEqualsRebuild(Seq((1L, "owl owl"), (2L, "???"), (3L, "bird cat"))
      .toDF("doc_id", "text"))
    // doc_id -1 is the stats sentinel: delete/upsert reject it loudly
    // instead of silently skipping the locate (which would let an upsert
    // insert rows whose old postings were never removed)
    intercept[Exception] {
      Bm25Store.delete(spark, path, Seq(-1L).toDF("doc_id"))
    }
    intercept[Exception] {
      Bm25Store.upsert(Seq((-1L, "evil")).toDF("doc_id", "text"), path)
    }
    // sentinel "terms" are rejected at the serve boundary, not scored
    intercept[IllegalArgumentException] {
      Bm25Store.scores(spark, path, Seq("cat", "__DOC__"))
    }
  }

  test("Bm25Store: batch serve equals the single serve per query " +
       "(duplicate-term doubling included); topKBatch bounds per query; " +
       "empty/no-hit queries produce no rows") {
    import graft.llm.Bm25Store
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "bird"),
      (4L, "cat fish fish dog"), (5L, "owl bat cat"))
      .toDF("doc_id", "text")
    val path = "/root/repo/target/qtmp/txspec_bm25_batch"
    graft.io.IO.deletePath(path)
    Bm25Store.write(docs, path, termBuckets = 8)
    val batch = Seq(
      (0, Seq("cat", "fish")),
      (1, Seq("dog", "dog")), // duplicate term scores twice, like scores()
      (2, Seq("owl")),
      (3, Seq("nosuchterm")),
      (4, Seq.empty[String]))
      .toDF("query_id", "terms")
    val got = Bm25Store.scoresBatch(spark, path, batch)
      .as[(Int, Long, Int, Double)].collect()
      .groupBy(_._1).view.mapValues(_.map(r => (r._2, r._3, r._4)).toSet).toMap
    Seq(0 -> Seq("cat", "fish"), 1 -> Seq("dog", "dog"), 2 -> Seq("owl"))
      .foreach { case (qid, terms) =>
        val single = Bm25Store.scores(spark, path, terms)
          .as[(Long, Int, Double)].collect().toSet
        assert(got(qid) == single,
          s"batch query $qid diverged from the single serve: " +
            s"${got(qid)} vs $single")
      }
    assert(!got.contains(3) && !got.contains(4),
      "no-hit and empty-term queries must be absent from the output")
    // ONE pruned read covers the whole batch: input files span at most
    // the batch's distinct term buckets plus the stats bucket
    val nTerms = 5 // cat, fish, dog, owl, nosuchterm
    val buckets = Bm25Store.scoresBatch(spark, path, batch).inputFiles
      .flatMap("__graft_bucket=(\\d+)".r.findFirstMatchIn(_))
      .map(_.group(1).toInt).toSet
    assert(buckets.size <= nTerms + 1,
      s"batch serve read ${buckets.size} buckets ($buckets) for $nTerms terms")
    assert(buckets.contains(8), "the reserved stats bucket must be read")
    val top = Bm25Store.topKBatch(spark, path, batch, k = 2)
      .as[(Int, Long, Int, Double, Int)].collect()
    assert(top.groupBy(_._1).forall(_._2.length <= 2))
    assert(top.filter(_._1 == 0).sortBy(_._5).map(_._4).toSeq ==
      top.filter(_._1 == 0).map(_._4).sortBy(-_).toSeq,
      "per-query ranks must follow score desc")
    // a duplicated query_id fails fast — posexplode would otherwise merge
    // both rows' occurrences into one blended query
    intercept[Exception] {
      Bm25Store.scoresBatch(spark, path,
        Seq((7, Seq("cat")), (7, Seq("dog"))).toDF("query_id", "terms"))
        .count()
    }
  }

  test("Bm25Store: width-constant serve — duplicate query terms " +
       "double-score like the full scan's per-index columns, and a " +
       "multi-hundred-term query serves with no per-term plan columns") {
    import graft.llm.Bm25Store
    val docs = Seq(
      (1L, "cat dog cat"), (2L, "dog fish"), (3L, "bird owl"),
      (6L, "cat fish fish dog"), (7L, "owl bat cat"))
      .toDF("doc_id", "text")
    val path = "/root/repo/target/qtmp/txspec_bm25_wide"
    graft.io.IO.deletePath(path)
    Bm25Store.write(docs, path, termBuckets = 8)
    // a term listed twice contributes twice to score and n_hit_terms in
    // the full scan's per-index tf_i shape; the row-wise serve must
    // replicate the posting per occurrence to agree
    val dup = Seq("cat", "fish", "cat")
    val servedDup = Bm25Store.scores(spark, path, dup)
      .as[(Long, Int, Double)].collect().toSet
    val scannedDup = TextAnalysis.bm25(docs, dup)
      .as[(Long, Int, Double)].collect().toSet
    assert(servedDup == scannedDup, s"dup-term drift: $servedDup vs $scannedDup")
    // long query (the decontamination-probe shape): parity holds, and the
    // serve plan carries NO per-term pivot columns — its aggregation
    // width is independent of query length, unlike the full scan's
    val longQ = (1 to 300).map(i => s"filler$i") ++ Seq("cat", "dog", "fish", "owl")
    val servedL = Bm25Store.scores(spark, path, longQ)
    assert(!servedL.queryExecution.optimizedPlan.toString.contains("tf_"),
      "serve plan regrew per-term pivot columns")
    val scannedL = TextAnalysis.bm25(docs, longQ)
      .as[(Long, Int, Double)].collect().toSet
    assert(servedL.as[(Long, Int, Double)].collect().toSet == scannedL)
  }

  test("Bm25Store: driver-side bucket hash equals the executor-side " +
       "xxhash64/pmod expression (ASCII, non-ASCII, empty, long terms)") {
    import graft.llm.Bm25Store
    val terms = Seq("cat", "fish", "", "naïve", "日本語", "ümlaut",
      "a" * 300, "MixedCase", "with space", "0123456789")
    for (buckets <- Seq(1, 7, 64, 255)) {
      val viaSpark = terms.toDF("term")
        .select(col("term"),
          pmod(xxhash64(col("term")), lit(buckets.toLong)).cast("int").as("b"))
        .as[(String, Int)].collect().toMap
      terms.foreach { t =>
        assert(Bm25Store.termBucketLocal(t, buckets) == viaSpark(t),
          s"driver/executor hash drift for '$t' at $buckets buckets")
      }
    }
  }

  test("unigramLogProb: hand-computed probabilities on a 3-doc corpus") {
    // corpus tokens: a a a b  → p(a)=3/4, p(b)=1/4
    val df = Seq((1L, "a a"), (2L, "a b"), (3L, ""))
      .toDF("doc_id", "text")
    val out = TextAnalysis.unigramLogProb(df)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    val lpA = math.log(0.75); val lpB = math.log(0.25)
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(out(1L) == ((2L, Some(r4(lpA)))))            // (lpA+lpA)/2
    assert(out(2L) == ((2L, Some(r4((lpA + lpB) / 2)))))
    assert(out(3L) == ((0L, None)))                     // token-less doc kept, null score
  }

  test("lengthHistogram: integer log2 buckets; token-less docs in bucket -1") {
    val d = Seq(
      (1L, "a", "s1"),                // 1 token  → bucket 0
      (2L, "a b c", "s1"),            // 3 tokens → bucket 1
      (3L, "a b c d e f g h", "s1"),  // 8 tokens → bucket 3 (power boundary)
      (4L, null.asInstanceOf[String], "s2"),
      (5L, "", "s2")
    ).toDF("doc_id", "text", "source")
    val out = TextAnalysis.lengthHistogram(d)
      .as[(String, Int, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out(("s1", 0)) == ((1L, 1L)))
    assert(out(("s1", 1)) == ((1L, 3L)))
    assert(out(("s1", 3)) == ((1L, 8L)))   // floor(log2 8) = 3 exactly
    assert(out(("s2", -1)) == ((2L, 0L)))  // null + empty, zero token mass
    assert(out.size == 4)
  }

  test("bigramLogProb: hand-computed interpolated probabilities") {
    // corpus: uni a=3 b=2 (N=5); bi (a,b)=2 (b,a)=1
    val d = Seq((1L, "a b a b"), (2L, "a"), (3L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val out = TextAnalysis.bigramLogProb(d)
      .as[(Long, Long, Option[Double])].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def r4(x: Double) = BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val l6 = math.log(0.6) // p(a|start)=pu(a)=.6 and p(b|a)=.75*(2/3)+.25*.4=.6
    val l525 = math.log(0.525) // p(a|b)=.75*(1/2)+.25*.6
    assert(out(1L) == ((4L, Some(r4((l6 + l6 + l525 + l6) / 4)))))
    assert(out(2L) == ((1L, Some(r4(l6)))))
    assert(out(3L) == ((0L, None)))
  }

  test("vocabulary: hand-computed counts, ranks, cumulative coverage") {
    val d = Seq((1L, "a a a b b c"), (2L, "a b d"),
      (3L, null.asInstanceOf[String])).toDF("doc_id", "text")
    // counts: a=4 b=3 c=1 d=1 (total 9); tie between c and d breaks by token
    val out = TextAnalysis.vocabulary(d, topK = 3)
      .as[(String, Long, Int, Double)].collect().toList
    assert(out == List(
      ("a", 4L, 1, 0.444444),
      ("b", 3L, 2, 0.777778),
      ("c", 1L, 3, 0.888889)))
  }

  // Genuinely multilingual mini-corpus (the parquet fixture's text is the
  // same synthetic English-ish vocabulary for every lang label, so it
  // cannot demonstrate a language classifier — this can).
  private lazy val multiCorpus: Seq[(Long, String, String)] = Seq(
    (1L, "en", "the weather was cold and the children stayed inside the house"),
    (2L, "en", "she walked to the market and bought fresh bread for the family"),
    (3L, "en", "a long road leads through the forest toward the old stone bridge"),
    (4L, "en", "they watched the evening sky change color over the quiet harbor"),
    (5L, "en", "his brother works in the city and comes home every weekend"),
    (6L, "en", "reading books by the window is her favorite way to spend sunday"),
    (7L, "de", "das wetter war kalt und die kinder blieben im haus bei den eltern"),
    (8L, "de", "sie ging zum markt und kaufte frisches brot für die ganze familie"),
    (9L, "de", "ein langer weg führt durch den wald zur alten steinernen brücke"),
    (10L, "de", "sie beobachteten den abendhimmel über dem ruhigen hafen der stadt"),
    (11L, "de", "sein bruder arbeitet in der stadt und kommt jedes wochenende nach hause"),
    (12L, "de", "am fenster bücher zu lesen ist ihre liebste beschäftigung am sonntag"),
    (13L, "fr", "le temps était froid et les enfants sont restés dans la maison"),
    (14L, "fr", "elle est allée au marché et a acheté du pain frais pour la famille"),
    (15L, "fr", "un long chemin traverse la forêt vers le vieux pont de pierre"),
    (16L, "fr", "ils regardaient le ciel du soir changer de couleur sur le port calme"),
    (17L, "fr", "son frère travaille en ville et rentre à la maison chaque week-end"),
    (18L, "fr", "lire des livres près de la fenêtre est sa façon préférée de passer le dimanche"),
    (19L, "es", "el tiempo era frío y los niños se quedaron dentro de la casa"),
    (20L, "es", "ella fue al mercado y compró pan fresco para toda la familia"),
    (21L, "es", "un largo camino atraviesa el bosque hacia el viejo puente de piedra"),
    (22L, "es", "miraban el cielo de la tarde cambiar de color sobre el puerto tranquilo"),
    (23L, "es", "su hermano trabaja en la ciudad y vuelve a casa cada fin de semana"),
    (24L, "es", "leer libros junto a la ventana es su manera favorita de pasar el domingo"))

  test("langid NB: holdout accuracy on a real multilingual corpus beats the marker heuristic") {
    // hold out the last 2 docs of each language, train on the first 4
    val holdoutIds = Set(5L, 6L, 11L, 12L, 17L, 18L, 23L, 24L)
    val all = multiCorpus.toDF("doc_id", "lang", "text")
    val train = all.where(!$"doc_id".isInCollection(holdoutIds))
    val test = all.where($"doc_id".isInCollection(holdoutIds))
    val model = LangId.fitNb(train)
    val truth = multiCorpus.map(r => r._1 -> r._2).toMap
    val nbAcc = LangId.predictNb(test, model)
      .select("doc_id", "lang_nb").as[(Long, String)].collect()
      .count { case (id, l) => truth(id) == l } / holdoutIds.size.toDouble
    val markerAcc = LangId.predict(test)
      .select("doc_id", "lang_pred").as[(Long, String)].collect()
      .count { case (id, l) => truth(id) == l } / holdoutIds.size.toDouble
    assert(nbAcc >= 0.75, s"NB holdout accuracy $nbAcc")
    assert(nbAcc > markerAcc,
      s"NB ($nbAcc) should beat the marker heuristic ($markerAcc) on held-out docs")
  }

  test("langid NB: classifies marker-free text the heuristic cannot") {
    // no marker function words at all -> every heuristic count is 0 and
    // the tie-break blindly answers the first lang code; the char-gram
    // model still reads the orthography
    val model = LangId.fitNb(multiCorpus.toDF("doc_id", "lang", "text"))
    val probes = Seq((100L, "es", "puente piedra ciudad mercado bosque"),
                     (101L, "fr", "enfants couleur pierre maison chemin"),
                     (102L, "de", "wochenende bruder hafen markt kinder"))
    val got = LangId.predictNb(probes.toDF("doc_id", "lang", "text"), model)
      .select("doc_id", "lang_nb").as[(Long, String)].collect().toMap
    probes.foreach { case (id, want, _) => assert(got(id) == want, s"doc $id") }
    val marker = LangId.predict(probes.toDF("doc_id", "lang", "text"))
      .select("doc_id", "marker_hits").as[(Long, Int)].collect()
    assert(marker.forall(_._2 == 0), "probes must be marker-free")
  }

  test("langid NB: fit is invariant to a non-binding gram cap; n_grams is text length") {
    val df = multiCorpus.toDF("doc_id", "lang", "text")
    val m1 = LangId.fitNb(df, maxGramsPerLang = 65536)
    val m2 = LangId.fitNb(df, maxGramsPerLang = 100000)
    assert(m1 == m2)
    val ng = LangId.predictNb(df.limit(1), m1)
      .select("n_grams").as[Int].head()
    assert(ng == multiCorpus.head._3.length) // ' '-padded trigrams: L+2-3+1
  }

  test("Bm25Store: registry postb covers every posting bucket after " +
       "build, append, and upsert — the registry-only locate's invariant") {
    import graft.llm.Bm25Store
    val path = "/root/repo/target/qtmp/txspec_bm25_postb"
    graft.io.IO.deletePath(path)
    val docs = Seq((1L, "cat dog cat"), (2L, "dog fish bird owl"),
      (3L, ""), (4L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    Bm25Store.write(docs, path, termBuckets = 8)
    Bm25Store.append(Seq((5L, "bat cat owl"), (6L, "newt")).toDF("doc_id", "text"), path)
    Bm25Store.upsert(Seq((2L, "entirely different words"), (7L, "eel ray"))
      .toDF("doc_id", "text"), path)
    def check(): Unit = {
      val all = graft.io.IO.readPartitionedStore(spark, path)
      // recompute each doc's ACTUAL posting buckets from the postings and
      // compare against its registry row's postb set
      val actual = all.where($"term" =!= "__DOC__" && $"term" =!= "__STATS__")
        .select($"doc_id",
          pmod(xxhash64($"term"), lit(8L)).cast("int").as("b"))
        .groupBy("doc_id").agg(collect_set($"b").as("actual"))
      val recorded = all.where($"term" === "__DOC__")
        .select($"doc_id", $"postb")
      val rows = recorded.join(actual, Seq("doc_id"), "full_outer")
        .select($"doc_id", $"postb", $"actual")
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val rec = Option(r.getSeq[Int](1)).map(_.toSet)
        val act = Option(r.getSeq[Int](2)).map(_.toSet).getOrElse(Set.empty[Int])
        assert(rec.isDefined, s"doc ${r.getLong(0)} has postings but no registry row")
        assert(rec.get == act,
          s"doc ${r.getLong(0)}: recorded postb ${rec.get} != actual $act")
      }
    }
    check()
    // and the pruned locate built on it: delete/upsert leave no stale row
    Bm25Store.delete(spark, path, Seq(1L, 5L).toDF("doc_id"))
    val left = graft.io.IO.readPartitionedStore(spark, path)
      .where($"doc_id".isin(1L, 5L)).count()
    assert(left == 0L, "pruned locate stranded rows of deleted docs")
    check()
  }
}
