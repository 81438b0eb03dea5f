package graft.functions

import org.apache.spark.ml.linalg.SQLDataTypes
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.graftshim.Shim
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for squared Euclidean distance between two
  * MLlib vectors — the codegen upgrade of the reference's `squared_dist`
  * Scala UDF (`03_Train & Deploy Model.py:87-96`, itself Vectors.sqdist).
  *
  * Why an Expression and not the UDF: the UDF path deserializes each
  * VectorUDT struct into an external `ml.linalg.Vector` object per row
  * (catalyst→Scala encoder round-trip) and calls a closure, breaking
  * whole-stage codegen in the hottest loop of the engine (every candidate
  * pair × 3 attributes). This expression reads the UDT's *internal* struct
  * layout (type, size, indices, values) directly off the InternalRow — one
  * primitive-array copy, no object graph, and `doGenCode` emits a static
  * call that keeps the surrounding operator inside codegen.
  *
  * Semantics are identical to `Vectors.sqdist` (dense/sparse × dense/sparse
  * all supported); `SqDistSpec` cross-checks against it on random vectors.
  */
case class SqDist(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (left.dataType == SQLDataTypes.VectorType &&
        right.dataType == SQLDataTypes.VectorType)
      TypeCheckResult.TypeCheckSuccess
    else
      TypeCheckResult.TypeCheckFailure(
        s"sq_dist expects two vector columns, got ${left.dataType} / ${right.dataType}")
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sq_dist"

  override protected def nullSafeEval(l: Any, r: Any): Any =
    SqDist.compute(l.asInstanceOf[InternalRow], r.asInstanceOf[InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.functions.SqDist.compute($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SqDist =
    copy(left = newLeft, right = newRight)
}

object SqDist {
  private final val SparseType: Byte = 0
  private final val DenseType: Byte = 1

  /** Static kernel over the VectorUDT internal layout:
    * struct(type: tinyint, size: int, indices: array<int>, values: array<double>).
    * Called from generated code — must stay Java-callable and allocation-light. */
  def compute(v1: InternalRow, v2: InternalRow): Double = {
    val t1 = v1.getByte(0)
    val t2 = v2.getByte(0)
    if (t1 == DenseType && t2 == DenseType) {
      val a = v1.getArray(3)
      val b = v2.getArray(3)
      val n = a.numElements()
      require(n == b.numElements(), s"vector sizes differ: $n vs ${b.numElements()}")
      var s = 0.0
      var i = 0
      while (i < n) {
        val d = a.getDouble(i) - b.getDouble(i)
        s += d * d
        i += 1
      }
      s
    } else if (t1 == SparseType && t2 == SparseType) {
      sparseSparse(v1.getArray(2), v1.getArray(3), v2.getArray(2), v2.getArray(3))
    } else if (t1 == SparseType) {
      sparseDense(v1.getArray(2), v1.getArray(3), v2.getArray(3))
    } else {
      sparseDense(v2.getArray(2), v2.getArray(3), v1.getArray(3))
    }
  }

  private def sparseSparse(ia: ArrayData, va: ArrayData,
                           ib: ArrayData, vb: ArrayData): Double = {
    val na = ia.numElements()
    val nb = ib.numElements()
    var s = 0.0
    var i = 0
    var j = 0
    while (i < na && j < nb) {
      val ka = ia.getInt(i)
      val kb = ib.getInt(j)
      if (ka == kb) {
        val d = va.getDouble(i) - vb.getDouble(j); s += d * d; i += 1; j += 1
      } else if (ka < kb) {
        val d = va.getDouble(i); s += d * d; i += 1
      } else {
        val d = vb.getDouble(j); s += d * d; j += 1
      }
    }
    while (i < na) { val d = va.getDouble(i); s += d * d; i += 1 }
    while (j < nb) { val d = vb.getDouble(j); s += d * d; j += 1 }
    s
  }

  private def sparseDense(ia: ArrayData, va: ArrayData, vb: ArrayData): Double = {
    val n = vb.numElements()
    val na = ia.numElements()
    var s = 0.0
    var i = 0   // sparse cursor
    var k = 0   // dense cursor
    while (k < n) {
      val d =
        if (i < na && ia.getInt(i) == k) { val x = va.getDouble(i) - vb.getDouble(k); i += 1; x }
        else -vb.getDouble(k)
      s += d * d
      k += 1
    }
    s
  }

  /** Column-API form. */
  def sq_dist(a: Column, b: Column): Column =
    Shim.toColumn(SqDist(Shim.toExpression(a), Shim.toExpression(b)))

  /** Register for SQL as `sq_dist`, mirroring the reference's
    * `spark.udf.register('squared_dist', …)` but as a native function. */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    spark.sessionState.functionRegistry.createOrReplaceTempFunction(
      "sq_dist", exprs => SqDist(exprs(0), exprs(1)), "built-in")
}
