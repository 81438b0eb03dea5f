package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-quality operators — the profile / constraint-check pair every
  * large-scale ingest pipeline runs before anything downstream trusts a
  * table (the public shape: Deequ-style metrics + checks).
  *
  * Scale shape: [[profile]] is ONE aggregation job over the table — all
  * per-column metrics partial-combine map-side, and the result is ncols
  * rows however large the input. The one deliberate cost: EXACT distinct
  * counts for several columns make Catalyst Expand the scan ncols-fold
  * (one copy per distinct aggregate class). That is the documented price
  * of exact profiling; monitoring pipelines that only need trends pass
  * `approxDistinct = true` and keep the scan single-width (HLL sketches
  * partial-combine with no Expand). [[checks]] evaluates every
  * constraint in the same one-pass conditional-aggregation style;
  * referential integrity is the only join (anti-join on the parent key,
  * broadcast when the parent is a dimension).
  */
object DataQuality {

  /** Per-column profile in long form: (column, n_rows, n_nulls,
    * n_distinct, min_value, max_value) — min/max as strings so one frame
    * carries mixed column types (the cross-engine-comparable form). */
  def profile(df: DataFrame, cols: Seq[String],
              approxDistinct: Boolean = false): DataFrame = {
    val aggs = cols.flatMap { c =>
      Seq(
        count(lit(1)).as(s"__n_$c"),
        coalesce(sum(when(col(c).isNull, 1L).otherwise(0L)), lit(0L))
          .as(s"__nulls_$c"),
        (if (approxDistinct) approx_count_distinct(col(c))
         else countDistinct(col(c))).as(s"__nd_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val one = df.agg(aggs.head, aggs.tail: _*)
    // one driver-sized row fans out to ncols result rows scan-side
    one.select(explode(array(cols.map(c => struct(
        lit(c).as("column"),
        col(s"__n_$c").as("n_rows"),
        col(s"__nulls_$c").as("n_nulls"),
        col(s"__nd_$c").as("n_distinct"),
        col(s"__min_$c").as("min_value"),
        col(s"__max_$c").as("max_value"))): _*)).as("p"))
      .select("p.*")
  }

  /** A named constraint over a table: `metric` counts VIOLATIONS (0 =
    * clean), evaluated inside the shared single-pass aggregation. */
  final case class Check(name: String, violations: org.apache.spark.sql.Column)

  /** Uniqueness: rows beyond the first per key value. NULL keys are
    * never violations (SQL UNIQUE semantics: NULLs are all distinct), so
    * the row count restricts to fully-non-null keys — countDistinct
    * drops any row with a NULL key component, and an unrestricted
    * count(*) would charge every such row as a duplicate. */
  def unique(cols: Seq[String]): Check = {
    val allNotNull = cols.map(col(_).isNotNull).reduce(_ && _)
    Check(s"unique(${cols.mkString(",")})",
      count(when(allNotNull, 1)) -
        countDistinct(col(cols.head), cols.tail.map(col): _*))
  }

  /** Completeness: null values in `c`. */
  def complete(c: String): Check =
    Check(s"complete($c)", sum(when(col(c).isNull, 1L).otherwise(0L)))

  /** Range/predicate conformance: rows FAILING `cond`. */
  def satisfies(name: String, cond: org.apache.spark.sql.Column): Check =
    Check(name, sum(when(cond, 0L).otherwise(1L)))

  /** Evaluate checks in one aggregation pass: (check, violations, passed).
    * All conditional aggregates partial-combine; the scan is read once
    * however many checks run. */
  def checks(df: DataFrame, cs: Seq[Check]): DataFrame = {
    val aggs = cs.zipWithIndex.map { case (c, i) =>
      coalesce(c.violations, lit(0L)).cast("long").as(s"__v_$i")
    }
    df.agg(aggs.head, aggs.tail: _*)
      .select(explode(array(cs.zipWithIndex.map { case (c, i) => struct(
        lit(c.name).as("check"),
        col(s"__v_$i").as("violations"),
        (col(s"__v_$i") === 0L).as("passed"))
      }: _*)).as("c"))
      .select("c.*")
  }

  /** Referential integrity as its own pass (the one check that needs a
    * second table): child keys with no parent — anti-join on the key,
    * broadcast the parent side when it is dimension-sized. */
  def referential(child: DataFrame, childKey: String,
                  parent: DataFrame, parentKey: String,
                  broadcastParent: Boolean = true): DataFrame = {
    val p = parent.select(col(parentKey).as(childKey)).distinct()
    val orphans = child.where(col(childKey).isNotNull)
      .join(if (broadcastParent) broadcast(p) else p, Seq(childKey), "left_anti")
      .agg(count(lit(1)).as("violations"))
    orphans.select(
      lit(s"referential($childKey -> $parentKey)").as("check"),
      col("violations"),
      (col("violations") === 0L).as("passed"))
  }
}
