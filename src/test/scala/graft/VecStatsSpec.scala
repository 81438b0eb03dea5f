package graft

import org.apache.spark.ml.linalg.{Vector, Vectors}
import org.apache.spark.sql.Row
import graft.functions.VecStats

/** vec_stats native expression: cross-checked against a naive dense
  * computation on random dense/sparse vectors, under both codegen and
  * interpreted evaluation. */
class VecStatsSpec extends SparkSpec {
  import spark.implicits._

  private val rnd = new scala.util.Random(11)

  private def randDense(n: Int): Vector =
    Vectors.dense(Array.fill(n)(rnd.nextDouble() * 4 - 2))

  private def randSparse(n: Int): Vector = {
    val idx = (0 until n).filter(_ => rnd.nextDouble() < 0.3)
    Vectors.sparse(n, idx.toArray, idx.map(_ => rnd.nextDouble() * 4 - 2).toArray)
  }

  private def naive(v: Vector): (Int, Int, Double, Double, Double, Boolean) = {
    val a = v.toArray // densify: implicit zeros become coordinates
    (a.length,
      a.count(_ != 0.0),
      a.sum,
      a.map(x => x * x).sum,
      if (a.isEmpty) 0.0 else a.min,
      a.forall(x => x == 0.0 || x == 1.0))
  }

  private def check(vs: Seq[Vector]): Unit = {
    val got = vs.map(Tuple1(_)).toDF("v")
      .select(VecStats.vec_stats($"v").as("s"))
      .select("s.dim", "s.nnz", "s.sum", "s.sum_sq", "s.min", "s.binary")
      .collect()
    got.zip(vs.map(naive)).foreach {
      case (Row(d: Int, n: Int, s: Double, sq: Double, m: Double, b: Boolean),
            (wd, wn, ws, wsq, wm, wb)) =>
        assert(d == wd && n == wn && b == wb, s"dim/nnz/binary vs $wd/$wn/$wb")
        assert(math.abs(s - ws) < 1e-12 && math.abs(sq - wsq) < 1e-12
          && math.abs(m - wm) < 1e-12, s"$s/$sq/$m vs $ws/$wsq/$wm")
    }
  }

  test("dense and sparse agree with the naive dense computation") {
    check(Seq.fill(25)(randDense(13)))
    check(Seq.fill(25)(randSparse(13)))
  }

  test("edge cases: all-zero sparse, binary vectors, empty vector") {
    check(Seq(
      Vectors.sparse(6, Array.empty[Int], Array.empty[Double]),
      Vectors.sparse(6, Array(1, 4), Array(1.0, 1.0)), // binary sparse
      Vectors.dense(0.0, 1.0, 1.0, 0.0),               // binary dense
      Vectors.dense(Array.empty[Double]),
      Vectors.sparse(3, Array(0), Array(0.0))))        // explicitly stored zero
  }

  test("min sees the implicit zeros of a sparse vector") {
    // stored values all positive, but dim > nnz ⇒ true min is 0.0
    check(Seq(Vectors.sparse(5, Array(1, 2), Array(2.0, 3.0))))
    // a stored negative beats the implicit zero
    check(Seq(Vectors.sparse(5, Array(1), Array(-2.0))))
  }

  test("interpreted path (codegen off) agrees") {
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    try check(Seq.fill(10)(randSparse(9)))
    finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
  }

  test("null propagates (nullIntolerant)") {
    val df = Seq(None: Option[Vector]).toDF("v")
    assert(df.select(VecStats.vec_stats($"v").as("s"))
      .where($"s".isNull).count() == 1)
  }

  test("SQL registration: vec_stats usable from spark.sql") {
    VecStats.register(spark)
    Seq(Tuple1(Vectors.sparse(4, Array(1, 3), Array(1.0, 1.0))))
      .toDF("v").createOrReplaceTempView("vecstats_t")
    val r = spark.sql(
      "SELECT vec_stats(v).nnz, vec_stats(v).binary FROM vecstats_t").head()
    assert(r.getInt(0) == 2 && r.getBoolean(1))
  }
}
