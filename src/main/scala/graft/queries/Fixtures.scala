package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables
import graft.er.Catalogs

/** Shared derived frames used by several registered queries, with their
  * DuckDB-dialect mirrors (WITH-clause snippets) so the Spark side and the
  * oracle are built from one place.
  *
  * Candidate pairs for the pairs-layer operators are arithmetic-derived
  * (identity pairs on a key subset plus deterministic near-miss pairs) so
  * they are exactly SQL-expressible; the *fuzzy* candidate generation (LSH)
  * is exercised by the J4 query and its ScalaTest recall property.
  */
object Fixtures {

  /** Deterministic candidate pairs: golden ∪ extra near-miss pairs, distinct. */
  def candidatePairs(spark: SparkSession, dir: String): DataFrame = {
    val part = Tables.part(spark, dir)
    val ident = part.where("p_partkey % 4 != 0")
      .selectExpr("p_partkey as idA", "p_partkey as idB")
    val nearMiss = part.where("p_partkey % 11 = 0")
      .selectExpr("p_partkey as idA", "p_partkey + 1 as idB")
    graft.pairs.Pairs.candidates(Catalogs.golden(spark, dir), ident, nearMiss)
  }

  /** J2+P6 — candidates labeled against golden. */
  def labeledPairs(spark: SparkSession, dir: String): DataFrame =
    graft.pairs.Pairs.labelJoin(candidatePairs(spark, dir), Catalogs.golden(spark, dir))

  // ---- DuckDB mirrors ----
  val candsCte: String =
    s"""golden AS (${Catalogs.goldenSql}),
       |cands AS (
       |  SELECT DISTINCT idA, idB FROM (
       |    SELECT idA, idB FROM golden
       |    UNION ALL
       |    SELECT p_partkey AS idA, p_partkey AS idB FROM part WHERE p_partkey % 4 != 0
       |    UNION ALL
       |    SELECT p_partkey AS idA, p_partkey + 1 AS idB FROM part WHERE p_partkey % 11 = 0
       |  )
       |)""".stripMargin

  val labeledCte: String =
    s"""$candsCte,
       |labeled AS (
       |  SELECT c.idA, c.idB,
       |         CASE WHEN g.idA IS NOT NULL THEN 1 ELSE 0 END AS label
       |  FROM cands c LEFT JOIN golden g ON c.idA = g.idA AND c.idB = g.idB
       |)""".stripMargin

  /** DuckDB-side tokenization mirror of [[graft.llm.TextAnalysis.tokens]]. */
  def tokSql(colExpr: String): String =
    s"list_filter(regexp_split_to_array(lower($colExpr), '[^a-z0-9]+'), t -> t <> '')"
}
