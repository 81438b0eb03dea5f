package graft

import org.apache.spark.sql.functions._
import graft.ops.DataQuality
import graft.ops.DataQuality._

/** Data-quality operators against a deliberately dirty frame: exact
  * metrics, violation counts, and the referential orphan count. */
class DataQualitySpec extends SparkSpec {
  import spark.implicits._

  private val dirty = Seq(
    (1, Some("a"), 10.0),
    (2, None, -5.0),     // null name, negative value
    (2, Some("b"), 0.0), // duplicate key, zero value
    (3, Some("b"), 7.5)
  ).toDF("id", "name", "v")

  test("profile: exact per-column metrics in one pass") {
    val p = DataQuality.profile(dirty, Seq("id", "name"))
      .as[(String, Long, Long, Long, String, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(p("id") == (("id", 4L, 0L, 3L, "1", "3")))
    assert(p("name") == (("name", 4L, 1L, 2L, "a", "b")))
    // approx mode keeps the plan Expand-free and lands near the truth
    val a = DataQuality.profile(dirty, Seq("id"), approxDistinct = true)
      .select("n_distinct").as[Long].head()
    assert(a >= 2L && a <= 4L)
  }

  test("checks: uniqueness, completeness, predicate — one pass; " +
       "referential orphans via anti-join") {
    val out = checks(dirty, Seq(
        unique(Seq("id")),
        complete("name"),
        satisfies("v_nonneg", col("v") >= 0)))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out("unique(id)") == ((1L, false)))
    assert(out("complete(name)") == ((1L, false)))
    assert(out("v_nonneg") == ((1L, false)))
    val parents = Seq(1, 3).toDF("pid")
    val ref = referential(dirty, "id", parents, "pid")
      .as[(String, Long, Boolean)].head()
    assert(ref._2 == 2L && !ref._3) // both id=2 rows are orphans
    // a clean table passes everything
    val clean = checks(dirty.where("id <> 2"), Seq(
        unique(Seq("id")), complete("name"), satisfies("v_nonneg", col("v") >= 0)))
      .as[(String, Long, Boolean)].collect()
    assert(clean.forall(_._3))
  }

  test("unique: NULL keys are never violations (SQL UNIQUE semantics), " +
       "single and composite") {
    val t = Seq(
      (Some(1), Some("x")), (Some(2), None), (Some(2), None),
      (None, Some("y")), (None, Some("y"))
    ).toDF("a", "b")
    val out = checks(t, Seq(unique(Seq("a")), unique(Seq("a", "b"))))
      .as[(String, Long, Boolean)].collect().map(r => r._1 -> r._2).toMap
    // 'a': non-null values 1,2,2 → one duplicate; the two NULLs don't count
    assert(out("unique(a)") == 1L)
    // composite: fully-non-null rows are only (1,x) → distinct; rows with
    // any NULL component are excluded from both sides
    assert(out("unique(a,b)") == 0L)
  }

  test("empty table: zero violations, passed=true, profile all-zero") {
    val empty = dirty.where("id < 0")
    val out = checks(empty, Seq(unique(Seq("id")), complete("name")))
      .as[(String, Long, Boolean)].collect()
    assert(out.forall(c => c._2 == 0L && c._3))
    val p = DataQuality.profile(empty, Seq("id"))
      .as[(String, Long, Long, Long, Option[String], Option[String])].head()
    assert(p._2 == 0L && p._3 == 0L && p._4 == 0L && p._5.isEmpty)
  }
}
