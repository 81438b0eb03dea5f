package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Edit-distance (Levenshtein) similarity self-join — the fuzzy-match
  * candidate generator for short identifier-like strings (names, SKUs,
  * model numbers), complementary to the token/LSH blocking the matcher
  * uses for long descriptions (reference 02_Prepare Data.py builds its
  * candidate pairs from token features; single-token typos there fall
  * through unless the tokens still share a bucket).
  *
  * Formulated as a *deletion-neighborhood* (FastSS / symmetric-delete)
  * equi-join, never an all-pairs comparison: each string emits itself plus
  * every single-character-deletion variant as signatures; two strings
  * within Levenshtein distance 1 provably share at least one signature
  * (equal → the string itself; one substitution → deleting that position
  * from both sides yields the same string; one insert/delete → deleting
  * the inserted character from the longer side yields the shorter string,
  * which is in the shorter side's own signature set). So an equi-join on
  * the signature is a COMPLETE candidate filter for k=1, and the exact
  * `levenshtein` check afterwards makes it precise.
  *
  * Scale shape: |rows| × (len+1) signature rows, hashed to 8 bytes for the
  * shuffle; the join is a plain hash equi-join keyed on the signature —
  * linear in candidates, which for identifier-like data is a small
  * constant per row (neighbors differ in one position). A pathological
  * signature (e.g. every row one deletion away from a shared template) is
  * an ordinary hot join key — AQE skew split applies, and `maxGroup`
  * drops signature groups larger than the cap (an explicit recall trade,
  * OFF by default, mirroring `Dedup.jaccardPairs`' `maxShingleDf`).
  *
  * k is fixed at 1 by construction. For k=2 the same scheme needs the
  * two-deletion neighborhood (O(len²) signatures/row) — the standard
  * FastSS trade; the engine keeps k=1, where the neighborhood is linear,
  * and leaves deeper k to the Jaccard/LSH family, which handles
  * multi-edit fuzz better for long strings anyway.
  */
object EditDistance {

  /** All distinct single-deletion variants of `s`, plus `s` itself.
    * Deletions step by CODEPOINT, not UTF-16 unit: `levenshtein` counts
    * codepoints, so a surrogate-pair character (emoji, astral CJK) must
    * delete as one unit or the k=1 completeness guarantee breaks for
    * names containing them (pinned by EditDistanceSpec). */
  private val deletionSigs = udf { (s: String) =>
    if (s == null) null
    else {
      val out = new java.util.LinkedHashSet[String]()
      out.add(s)
      var i = 0
      while (i < s.length) {
        val step = Character.charCount(s.codePointAt(i))
        out.add(s.substring(0, i) + s.substring(i + step))
        i += step
      }
      import scala.jdk.CollectionConverters._
      out.asScala.toSeq
    }
  }

  /** Pairs of rows whose `nameCol` values are within Levenshtein distance
    * 1, as `(idA, idB, dist)` with `idA < idB`. Exact: the deletion
    * neighborhood is a complete k=1 candidate set and every candidate is
    * re-checked with the real distance.
    *
    * @param maxGroup drop signature groups with more members (hot-key
    *                 guard; explicit recall trade, None = exact) */
  def selfJoin(df: DataFrame, idCol: String, nameCol: String,
               maxGroup: Option[Int] = None): DataFrame = {
    val sigs = df
      .where(col(nameCol).isNotNull)
      .select(col(idCol).as("id"), col(nameCol).as("name"),
        explode(deletionSigs(col(nameCol))).as("sig_s"))
      // 8-byte hashed key: the shuffle carries |rows|×(len+1) rows, and a
      // fixed-width key beats the near-full-length string. A 64-bit
      // collision can only add a CANDIDATE (false positives are removed by
      // the exact distance check below), never lose a true pair.
      .select(col("id"), col("name"), xxhash64(col("sig_s")).as("sig"))
    val filtered = maxGroup match {
      case Some(cap) =>
        val ok = sigs.groupBy("sig").agg(count(lit(1)).as("gn"))
          .where(col("gn") <= cap)
        sigs.join(ok, "sig").drop("gn")
      case None => sigs
    }
    val a = filtered.select(col("sig"), col("id").as("idA"), col("name").as("nameA"))
    val b = filtered.select(col("sig"), col("id").as("idB"), col("name").as("nameB"))
    a.join(b, Seq("sig"))
      .where(col("idA") < col("idB"))
      // a pair can share several signatures — reduce to one row per pair
      // BEFORE the O(len²) distance check so it runs once per pair
      .select("idA", "idB", "nameA", "nameB").distinct()
      .withColumn("dist", levenshtein(col("nameA"), col("nameB")).cast("long"))
      .where(col("dist") <= 1)
      .select("idA", "idB", "dist")
  }
}
