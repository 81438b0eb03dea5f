package graft

import org.apache.spark.sql.functions._
import graft.ops.EditDistance

/** Deletion-neighborhood (FastSS) edit-distance self-join: completeness
  * vs the naive all-pairs formulation, hot-group capping, null safety. */
class EditDistanceSpec extends SparkSpec {
  import spark.implicits._

  private val names = Seq(
    (1L, "spark"),   // dist 1 to "spare" (sub), "sparks" (ins), "park" (del)
    (2L, "spare"),
    (3L, "sparks"),
    (4L, "park"),
    (5L, "flink"),   // isolated
    (6L, "spark"),   // exact dup of 1
    (7L, null.asInstanceOf[String])
  ).toDF("id", "name")

  private def naive(df: org.apache.spark.sql.DataFrame) = {
    val a = df.where($"name".isNotNull).select($"id".as("idA"), $"name".as("nameA"))
    val b = df.where($"name".isNotNull).select($"id".as("idB"), $"name".as("nameB"))
    a.crossJoin(b).where($"idA" < $"idB")
      .withColumn("dist", levenshtein($"nameA", $"nameB").cast("long"))
      .where($"dist" <= 1)
      .select("idA", "idB", "dist")
  }

  test("selfJoin equals the naive all-pairs lev<=1 result exactly") {
    val got = EditDistance.selfJoin(names, "id", "name")
      .as[(Long, Long, Long)].collect().toSet
    val want = naive(names).as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // and the fixture exercises all three edit kinds plus an exact dup
    assert(got.contains((1L, 2L, 1L)))  // substitution
    assert(got.contains((1L, 3L, 1L)))  // insertion
    assert(got.contains((1L, 4L, 1L)))  // deletion
    assert(got.contains((1L, 6L, 0L)))  // equality
    assert(!got.exists(p => p._1 == 5L || p._2 == 5L)) // isolated stays out
  }

  test("selfJoin completeness on randomized digit-string data") {
    // identifier-like strings (the customer-name shape): random digits
    // with planted single-edit neighbors
    val rnd = new scala.util.Random(7)
    val base = (0 until 60).map(i => f"ID#${rnd.nextInt(100000)}%05d")
    val mutated = base.take(20).map { s =>
      val p = rnd.nextInt(s.length)
      s.updated(p, ('0' + rnd.nextInt(10)).toChar)
    }
    val df = (base ++ mutated).zipWithIndex
      .map { case (s, i) => (i.toLong, s) }.toDF("id", "name")
    val got = EditDistance.selfJoin(df, "id", "name")
      .as[(Long, Long, Long)].collect().toSet
    val want = naive(df).as[(Long, Long, Long)].collect().toSet
    assert(got == want && want.nonEmpty)
  }

  test("surrogate-pair characters delete as one codepoint (astral-name completeness)") {
    // "ok" + U+1F600 (a surrogate PAIR in UTF-16) vs plain "ok": one
    // codepoint apart. A UTF-16-unit deletion scheme never generates
    // "ok" from the emoji form and silently loses the pair.
    val astral = Seq((1L, "ok😀"), (2L, "ok"), (3L, "ok😀"))
      .toDF("id", "name")
    val got = EditDistance.selfJoin(astral, "id", "name")
      .as[(Long, Long, Long)].collect().toSet
    val want = naive(astral).as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    assert(got.contains((1L, 2L, 1L)) && got.contains((1L, 3L, 0L)))
  }

  test("maxGroup drops hot signature groups (explicit recall trade)") {
    // every name is one deletion from "ab" → the "ab"-derived signatures
    // are hot; capping at 2 must drop some true pairs but never error
    val hot = Seq((1L, "ab"), (2L, "ab"), (3L, "ab"), (4L, "ab"))
      .toDF("id", "name")
    val exact = EditDistance.selfJoin(hot, "id", "name").count()
    val capped = EditDistance.selfJoin(hot, "id", "name", maxGroup = Some(2)).count()
    assert(exact == 6L)      // all C(4,2) pairs at dist 0
    assert(capped < exact)
  }
}
