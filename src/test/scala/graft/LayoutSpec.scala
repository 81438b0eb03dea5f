package graft

import org.apache.spark.sql.functions._
import graft.ops.Layout

/** Z-order layout: Morton interleave correctness and the file-skipping
  * property it exists for — per-file min/max spans stay narrow on EVERY
  * Z column, where a single-column sort leaves the other column's spans
  * at ~full range. */
class LayoutSpec extends SparkSpec {
  import spark.implicits._

  private val tmp = "/root/repo/target/test_tmp"

  test("interleaveBits: documented bit placement") {
    // x=0b11, y=0b01, 2 bits: out = x0 | y0<<1 | x1<<2 | y1<<3 = 0b0111
    val out = spark.range(1)
      .select(Layout.interleaveBits(Seq(lit(3L), lit(1L)), 2).as("z"))
      .as[Long].head()
    assert(out == 7L)
  }

  test("widthCode: 0-based, top edge clamped, nulls to 0") {
    val codes = Seq[(java.lang.Double, Long)]((0.0, 0L), (0.5, 8L), (1.0, 15L), (null, 0L))
    val df = codes.map(_._1).toDF("x")
    val got = df.select(Layout.widthCode(col("x"), lit(0.0), lit(1.0), 4).as("c"))
      .as[Long].collect().toSeq
    assert(got == codes.map(_._2))
  }

  test("zorderWrite clusters every Z column; a linear sort only its own") {
    // 64x64 grid: both layouts see identical data
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), (col("id") / 64).cast("long").as("y"))
    val zPath = s"$tmp/layout_z"
    val linPath = s"$tmp/layout_lin"
    Layout.zorderWrite(grid, zPath, Seq("x", "y"), nFiles = 16, bits = 6)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(linPath)
    def meanSpans(path: String): (Double, Double) = {
      val sp = Layout.fileSpans(spark.read.parquet(path), Seq("x", "y"))
        .agg(avg("span_x"), avg("span_y")).head()
      (sp.getDouble(0), sp.getDouble(1))
    }
    val (zx, zy) = meanSpans(zPath)
    val (lx, ly) = meanSpans(linPath)
    // z-order: narrow on BOTH dimensions (16 files over a 2-d grid →
    // ~1/4 span each; sampled range boundaries add slop)
    assert(zx < 0.5 && zy < 0.5, s"z-order spans too wide: x=$zx y=$zy")
    // linear: its own column narrow, the other ~full range
    assert(lx < 0.2, s"linear sort should cluster x tightly: $lx")
    assert(ly > 0.9, s"linear sort leaves y unclustered: $ly")
    assert(zy < ly / 2, "z-order must beat the linear layout on the second column")
    // same rows either way — re-layout never changes content
    assert(spark.read.parquet(zPath).as[(Long, Long)].collect().toSet ==
      grid.as[(Long, Long)].collect().toSet)
  }

  test("constant Z column degrades gracefully: other columns keep their " +
       "clustering; spans report 0.0, never NaN/NULL Z-values") {
    // width_bucket with lo == hi yields NULL — unguarded, EVERY row's
    // Z-value would be NULL (one range partition, clustering lost on ALL
    // columns). The constant column must contribute a constant code and
    // leave x's clustering intact.
    val grid = spark.range(4096)
      .select((col("id") % 64).as("x"), lit(7L).as("k"))
    val path = s"$tmp/layout_const"
    Layout.zorderWrite(grid, path, Seq("x", "k"), nFiles = 16, bits = 6)
    val zvals = grid.select(Layout.zvalue(grid.toDF(), Seq("x", "k"), 6).as("z"))
    assert(zvals.where(col("z").isNull).count() == 0, "constant column NULLed Z-values")
    val sp = Layout.fileSpans(spark.read.parquet(path), Seq("x", "k"))
      .agg(avg("span_x").as("sx"), avg("span_k").as("sk")).head()
    assert(sp.getDouble(0) < 0.5, s"x clustering lost under a constant column: ${sp.getDouble(0)}")
    assert(sp.getDouble(1) == 0.0, s"zero-span column must report 0.0: ${sp.get(1)}")
    // all-null column: codes to 0 the same way (lo/hi are NULL)
    val withNull = spark.range(64).select(col("id").as("x"),
      lit(null).cast("long").as("k"))
    val zn = withNull.select(Layout.zvalue(withNull, Seq("x", "k"), 6).as("z"))
    assert(zn.where(col("z").isNull).count() == 0, "all-null column NULLed Z-values")
  }
}
