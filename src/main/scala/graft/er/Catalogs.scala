package graft.er

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.Tables

/** The reference's two-catalog data model (`01_Feature Engineering.py:54-159`:
  * two product tables `abt`/`buy` with `(id, name, description, price)` where
  * price arrives as a `$`-prefixed string), derived deterministically from the
  * driver's `part` fixture so the DuckDB oracle can mirror the derivation.
  *
  * Side A = `part` as-is. Side B = perturbed copy: brand token prefixed onto an
  * upper-cased name (forces fuzzy rather than equality matching), description
  * nulled on a deterministic subset (exercises the COALESCE path,
  * `01:147,155`), price re-rendered through DECIMAL(12,2) so the string form is
  * engine-independent. Golden matches (`abtbuy_matched`, `01:113-116`) are the
  * identity pairing on a deterministic subset of keys.
  *
  * Every expression here is SQL-expressible; [[sideASql]]/[[sideBSql]] are the
  * DuckDB-dialect mirrors used in oracle queries.
  */
object Catalogs {
  // '$'-prefixed price string: double -> DECIMAL(12,2) -> string is exact and
  // renders identically ("123.40") in Spark and DuckDB.
  private val priceStr = "concat('$', cast(cast(p_retailprice as decimal(12,2)) as string))"

  val sideAExprs: Seq[String] = Seq(
    "p_partkey as id",
    "p_name as name",
    "p_type as description",
    s"$priceStr as price")

  val sideBExprs: Seq[String] = Seq(
    "p_partkey as id",
    "upper(concat(p_brand, ' ', p_name)) as name",
    "case when p_partkey % 7 = 0 then null else p_type end as description",
    s"$priceStr as price")

  def sideA(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).selectExpr(sideAExprs: _*)

  def sideB(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir).selectExpr(sideBExprs: _*)

  /** Golden match pairs: identity pairing on keys not divisible by 3. */
  def golden(spark: SparkSession, dir: String): DataFrame =
    Tables.part(spark, dir)
      .where("p_partkey % 3 != 0")
      .selectExpr("p_partkey as idA", "p_partkey as idB")

  // ---- DuckDB mirrors (same expressions; VARCHAR instead of STRING) ----
  val sideASql: String =
    """SELECT p_partkey AS id, p_name AS name, p_type AS description,
      |  concat('$', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR)) AS price
      |FROM part""".stripMargin

  val sideBSql: String =
    """SELECT p_partkey AS id, upper(concat(p_brand, ' ', p_name)) AS name,
      |  CASE WHEN p_partkey % 7 = 0 THEN NULL ELSE p_type END AS description,
      |  concat('$', CAST(CAST(p_retailprice AS DECIMAL(12,2)) AS VARCHAR)) AS price
      |FROM part""".stripMargin

  val goldenSql: String =
    "SELECT p_partkey AS idA, p_partkey AS idB FROM part WHERE p_partkey % 3 != 0"
}
