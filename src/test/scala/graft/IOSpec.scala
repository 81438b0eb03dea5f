package graft

import org.apache.spark.sql.types._
import org.apache.spark.sql.functions._
import graft.io.IO

/** S2/S3/S5 — IO layer; upsert must leave unmatched target rows
  * byte-identical (SURVEY §7.5). */
class IOSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = "/root/repo/target/test_tmp"

  test("csv scan: explicit schema round-trip, no inference") {
    val df = Seq((1L, "a", 10), (2L, "b,with,commas", -3)).toDF("k", "s", "n")
    df.coalesce(1).write.mode("overwrite").option("header", "true").csv(s"$tmp/csv")
    val schema = StructType(Seq(StructField("k", LongType),
      StructField("s", StringType), StructField("n", IntegerType)))
    val back = IO.readCsv(spark, s"$tmp/csv", schema)
    assert(back.schema == schema)
    assert(back.as[(Long, String, Int)].collect().toSet ==
      Set((1L, "a", 10), (2L, "b,with,commas", -3)))
  }

  test("upsert: matched rows update only updateCols; unmatched target " +
       "rows byte-identical; new rows inserted") {
    val target = Seq((1, "one", 10.0), (2, "two", 20.0), (3, "three", 30.0))
      .toDF("id", "name", "price")
    val source = Seq((2, "TWO-RENAMED", 99.0), (4, "four", 40.0))
      .toDF("id", "name", "price")
    val out = IO.upsert(target, source, Seq("id"), Seq("price"))
      .as[(Int, String, Double)].collect().toSet
    assert(out == Set(
      (1, "one", 10.0),          // unmatched target: untouched
      (2, "two", 99.0),          // matched: price updated, name NOT (updateCols only)
      (3, "three", 30.0),        // unmatched target: untouched
      (4, "four", 40.0)))        // not-matched source: inserted
  }

  test("upsert: composite keys") {
    val target = Seq(("abt", 1, 1.0), ("abt", 2, 2.0), ("buy", 1, 3.0))
      .toDF("table", "id", "v")
    val source = Seq(("abt", 1, 9.0)).toDF("table", "id", "v")
    val out = IO.upsert(target, source, Seq("table", "id"), Seq("v"))
      .as[(String, Int, Double)].collect().toSet
    assert(out == Set(("abt", 1, 9.0), ("abt", 2, 2.0), ("buy", 1, 3.0)))
  }

  test("upsertPath: atomic swap updates the table in place") {
    val path = s"$tmp/upsert_target"
    Seq((1, 10.0), (2, 20.0)).toDF("id", "v")
      .write.mode("overwrite").parquet(path)
    IO.upsertPath(spark, path, Seq((2, 99.0), (3, 30.0)).toDF("id", "v"),
      Seq("id"), Seq("v"))
    val out = spark.read.parquet(path).as[(Int, Double)].collect().toSet
    assert(out == Set((1, 10.0), (2, 99.0), (3, 30.0)))
    assert(!java.nio.file.Files.exists(
      java.nio.file.Paths.get(path + ".__graft_tmp")))
  }
}
