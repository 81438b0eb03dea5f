package graft

import org.apache.spark.sql.SparkSession

/** Profiling harness for the BPE trainer (same role as ProfileEr /
  * ProfileSem): prints type-table size, merges produced before
  * exhaustion, and wall time at a few depths over a fixture dir. */
object ProfileBpe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, dir)
    val nTypes = graft.llm.Bpe.wordTypes(docs).count()
    println(s"[bpe] $dir word types: $nTypes")
    for (n <- Seq(32, 256, 1024, 4096)) {
      val t0 = System.nanoTime()
      val ms = graft.llm.Bpe.fit(docs, nMerges = n)
      val secs = (System.nanoTime() - t0) / 1e9
      println(f"[bpe] nMerges=$n%5d -> got ${ms.length}%5d merges in $secs%.2f s " +
        f"(last count ${if (ms.nonEmpty) ms.last.pairCount else -1L})")
    }
    spark.stop()
  }
}
