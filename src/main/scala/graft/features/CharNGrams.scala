package graft.features

import org.apache.spark.ml.Transformer
import org.apache.spark.ml.param.{IntParam, Param, ParamMap, ParamValidators}
import org.apache.spark.ml.util.{DefaultParamsReadable, DefaultParamsWritable, Identifiable}
import org.apache.spark.sql.{Column, DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Character-level n-gram transformer over a token array: for each token,
  * every sliding window of `n` characters; flattened into one bag per row.
  *
  * Re-expresses the reference's melter → NGram → collapser sandwich
  * (`01_Feature Engineering.py:204-249`: LATERAL VIEW explode to one row per
  * word, char-split, NGram(3), second explode, then a `collect_list GROUP BY`
  * to re-nest). That formulation costs a full shuffle on the group key and
  * ~#chars× row expansion. Here the same bag is produced by nested
  * higher-order functions (`transform`/`flatten`) — a narrow, whole-stage-
  * codegen'd map with zero shuffle, which is the difference between a
  * per-pipeline exchange and none at 100 TB.
  *
  * (The reference's NGram output renders a trigram as "a b c" — space-joined
  * single chars, an artifact of `split(word,'')` + NGram. The contiguous
  * "abc" form here carries identical information into the downstream
  * HashingTF bucketing.)
  */
class CharNGrams(override val uid: String)
    extends Transformer with DefaultParamsWritable {

  def this() = this(Identifiable.randomUID("charNGrams"))

  final val inputCol = new Param[String](this, "inputCol", "input token array column")
  final val outputCol = new Param[String](this, "outputCol", "output n-gram array column")
  final val n = new IntParam(this, "n", "n-gram length (>=1)", ParamValidators.gtEq(1))
  setDefault(n -> 3)

  def setInputCol(v: String): this.type = set(inputCol, v)
  def setOutputCol(v: String): this.type = set(outputCol, v)
  def setN(v: Int): this.type = set(n, v)
  def getN: Int = $(n)

  override def transform(ds: Dataset[_]): DataFrame =
    ds.withColumn($(outputCol), CharNGrams.charNGrams(col($(inputCol)), $(n)))

  override def transformSchema(schema: StructType): StructType = {
    val in = schema($(inputCol))
    require(in.dataType == ArrayType(StringType, true) ||
            in.dataType == ArrayType(StringType, false),
      s"inputCol must be array<string>, got ${in.dataType}")
    schema.add(StructField($(outputCol), ArrayType(StringType, false)))
  }

  override def copy(extra: ParamMap): CharNGrams = defaultCopy(extra)
}

object CharNGrams extends DefaultParamsReadable[CharNGrams] {
  /** Pure-Column form, reusable outside the ML pipeline. */
  def charNGrams(tokens: Column, n: Int): Column =
    flatten(transform(tokens, w =>
      when(length(w) >= n,
        transform(sequence(lit(1), length(w) - (n - 1)), i => w.substr(i, lit(n))))
        .otherwise(array().cast(ArrayType(StringType)))))
}
