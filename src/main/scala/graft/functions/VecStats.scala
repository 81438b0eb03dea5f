package graft.functions

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types._

/** Native Catalyst expression computing the scalar invariants of an MLlib
  * vector in ONE O(nnz) pass over the UDT's internal layout:
  * `struct(dim int, nnz int, sum double, sum_sq double, min double,
  * binary boolean)`.
  *
  * Why: the only built-in route from a VectorUDT to these numbers is
  * `vector_to_array` + higher-order `aggregate`, which DENSIFIES the
  * vector first — for the reference's 2^18-dim HashingTF space
  * (`01_Feature Engineering.py:366-372`) that is 262,144 materialized
  * doubles per row to sum ~10² non-zeros. This expression reads the
  * sparse (indices, values) arrays directly off the InternalRow, so cost
  * follows the data's nnz, not its nominal dimension — the difference
  * between O(tokens) and O(vocabulary) per document at 100 TB.
  *
  * Field semantics (implicit zeros of a sparse vector count as
  * coordinates): `min` is the minimum over all `dim` coordinates;
  * `binary` is true iff every coordinate is 0.0 or 1.0; `nnz` counts
  * non-zero coordinates (explicitly stored zeros are not counted).
  */
case class VecStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == SQLDataTypes.VectorType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"vec_stats expects a vector column, got ${child.dataType}")

  override def dataType: DataType = VecStats.schema
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "vec_stats"

  override protected def nullSafeEval(v: Any): Any =
    VecStats.compute(v.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.functions.VecStats.compute($v)")

  override protected def withNewChildInternal(newChild: Expression): VecStats =
    copy(child = newChild)
}

object VecStats {
  val schema: StructType = StructType(Seq(
    StructField("dim", IntegerType, nullable = false),
    StructField("nnz", IntegerType, nullable = false),
    StructField("sum", DoubleType, nullable = false),
    StructField("sum_sq", DoubleType, nullable = false),
    StructField("min", DoubleType, nullable = false),
    StructField("binary", BooleanType, nullable = false)))

  private final val SparseType: Byte = 0

  /** Static kernel over the VectorUDT internal layout
    * struct(type: tinyint, size: int, indices: array<int>, values: array<double>).
    * Called from generated code — must stay Java-callable and allocation-light
    * (one 6-field row per input row; the values pass is a primitive loop). */
  def compute(v: InternalRow): InternalRow = {
    val sparse = v.getByte(0) == SparseType
    val values: ArrayData = v.getArray(3)
    val nStored = values.numElements()
    val dim = if (sparse) v.getInt(1) else nStored
    var nnz = 0
    var sum = 0.0
    var sumSq = 0.0
    // implicit zeros of a sparse vector participate in min/binary
    var min = if (sparse && nStored < dim) 0.0 else Double.PositiveInfinity
    var binary = true
    var i = 0
    while (i < nStored) {
      val x = values.getDouble(i)
      if (x != 0.0) nnz += 1
      sum += x
      sumSq += x * x
      if (x < min) min = x
      if (x != 0.0 && x != 1.0) binary = false
      i += 1
    }
    if (min == Double.PositiveInfinity) min = 0.0 // dim == 0 vector
    new GenericInternalRow(Array[Any](dim, nnz, sum, sumSq, min, binary))
  }

  /** Column-API form. */
  def vec_stats(v: Column): Column =
    Shim.toColumn(VecStats(Shim.toExpression(v)))

  /** Register for SQL as `vec_stats`. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "vec_stats", exprs => VecStats(exprs.head), "built-in")
}
