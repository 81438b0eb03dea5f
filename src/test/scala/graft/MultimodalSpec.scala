package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** Multimodal plumbing: schema contract, stub decode batch loop, framing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets =
    Multimodal.fromDocuments(Tables.documents(spark, sf).where("doc_id < 20"))

  test("schema contract: binary payload + typed metadata struct") {
    assert(assets.schema("content").dataType ==
      org.apache.spark.sql.types.BinaryType)
    assert(assets.schema("meta").dataType.isInstanceOf[
      org.apache.spark.sql.types.StructType])
  }

  test("describe: metadata-only pass never decodes; n_bytes correct") {
    val row = Multimodal.describe(assets).where($"asset_id" === 0)
      .select("n_bytes", "magic").as[(Long, String)].head()
    val text = Tables.documents(spark, sf).where("doc_id = 0")
      .select("text").as[String].head()
    assert(row._1 == text.getBytes("UTF-8").length)
    assert(row._2 == text.take(4).getBytes("UTF-8").map("%02X".format(_)).mkString)
  }

  test("binaryFile ingest: staged files round-trip bytes; metadata scan prunes content") {
    val docs = Tables.documents(spark, sf).where("doc_id < 5")
    val staged = Multimodal.stageAssetFiles(docs,
      "/root/repo/target/qtmp/mmspec_assets")
    val got = Multimodal.readBinaryAssets(spark, staged)
      .select(regexp_extract($"path", "(\\d+)\\.bin$", 1).cast("long").as("id"),
        $"content")
      .as[(Long, Array[Byte])].collect().toMap
    val want = docs.select($"doc_id", $"text").as[(Long, String)].collect().toMap
    assert(got.keySet == want.keySet)
    want.foreach { case (id, text) =>
      assert(java.util.Arrays.equals(got(id), text.getBytes("UTF-8")),
        s"content mismatch for $id")
    }
    // metadata-only projection must not read file contents into the scan
    val plan = Multimodal.readBinaryAssets(spark, staged)
      .select("path", "length").queryExecution.executedPlan.toString
    assert(!plan.contains("content"), s"content not pruned from:\n$plan")
    graft.io.IO.deletePath(staged)
  }

  test("decode stub: deterministic in payload bytes, batch loop runs") {
    val out1 = Multimodal.decodeImageMeta(spark, assets).collect().sortBy(_.asset_id)
    val out2 = Multimodal.decodeImageMeta(spark, assets).collect().sortBy(_.asset_id)
    assert(out1.length == 20)
    assert(out1.toSeq == out2.toSeq)
    out1.foreach { m =>
      assert(m.width >= 64 && m.width < 128 && m.height >= 64 && m.height < 128)
    }
  }

  test("codec seam: a second codec swaps in as config; init runs once per partition") {
    val inits = spark.sparkContext.longAccumulator("codec_inits")
    val fixedDims = new Multimodal.ImageCodec {
      def partitionDecoder(): (Long, Array[Byte]) => Multimodal.DecodedMeta = {
        inits.add(1) // per-partition init — a real codec opens its native context here
        (id, _) => Multimodal.DecodedMeta(id, 1, 2, 3)
      }
    }
    val out = Multimodal
      .decodeImageMeta(spark, assets.repartition(3), fixedDims).collect()
    assert(out.length == 20)
    assert(out.forall(m => m.width == 1 && m.height == 2 && m.channels == 3))
    assert(inits.value == 3L,
      s"decoder init ran ${inits.value} times for 3 partitions — must be once per partition, not per row")
    // and the default path still decodes with the stub (different output)
    val stubbed = Multimodal.decodeImageMeta(spark, assets).collect()
    assert(stubbed.exists(m => m.width != 1 || m.height != 2))
  }

  test("frame sampling: n frames per asset, spans cover prefix of payload") {
    val frames = Multimodal.sampleFrames(assets, 4)
    val counts = frames.groupBy("asset_id").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 == 4))
    val lens = frames.where($"asset_id" === 1)
      .select("frame_len").as[Int].collect()
    assert(lens.distinct.length == 1) // equal spans
  }
}
