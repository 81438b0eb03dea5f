package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for the 100 TB path.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin.enabled`, on by
  * default) handles moderate cases at runtime; explicit salting is the tool
  * when one build-side key is hot enough that even split partitions can't
  * balance — the classic power-law join key (a viral document id, a default
  * value, an empty-string key).
  */
object Skew {

  /** Salted inner equi-join: the skewed (large, hot-keyed) left side gets a
    * random salt in [0, salts); the small right side is replicated `salts`
    * times; the join key becomes (key, salt). Results are identical to the
    * plain join — every left row meets every matching right row exactly
    * once — but a hot key's rows now spread over `salts` reducers.
    *
    * Right-side replication costs |right| × salts rows, so this suits the
    * dimension-joins-fact shape; for two large sides, salt only the hot
    * keys (split-and-union) instead. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int = 8, seed: Long = 42L): DataFrame = {
    require(salts > 0)
    val saltedLeft = left.withColumn("__salt",
      (rand(seed) * salts).cast("int"))
    val explodedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(explodedRight, Seq(key, "__salt")).drop("__salt")
  }

  /** Hot-key diagnosis: top-n keys by frequency with their share of the
    * table — the number to look at before reaching for salting. */
  def keySkew(df: DataFrame, key: String, topN: Int = 10): DataFrame = {
    val counts = df.groupBy(key).agg(count(lit(1)).as("n"))
    val total = counts.agg(sum("n").as("total"))
    counts.crossJoin(broadcast(total))
      .withColumn("share", col("n") / col("total"))
      .orderBy(col("n").desc).limit(topN)
  }
}
