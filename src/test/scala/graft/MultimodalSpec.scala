package graft

import org.apache.spark.sql.functions._
import graft.llm.Multimodal

/** Multimodal plumbing: schema contract, real javax.imageio decode, framing. */
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

  test("stageAssetFiles: NULL/empty-text docs are skipped, matching the " +
       "mm_binary_ingest oracle's octet_length > 0 filter") {
    // Spark's file index drops zero-length files from every file-based
    // scan, so a null-text doc staged as a 0-byte file would be read back
    // by DuckDB's oracle but silently lost by the binaryFile source —
    // discovered by staging one: the only engine-symmetric contract is
    // "empty assets don't exist", applied on both sides
    val docs = Seq((1L, "abc"), (2L, null.asInstanceOf[String]), (3L, ""))
      .toDF("doc_id", "text")
    val staged = Multimodal.stageAssetFiles(docs,
      "/root/repo/target/qtmp/mmspec_nulltext")
    val got = Multimodal.readBinaryAssets(spark, staged)
      .select(regexp_extract($"path", "(\\d+)\\.bin$", 1).cast("long").as("id"),
        $"length".cast("long").as("n"))
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 3L), s"unexpected staged assets: $got")
    // no orphaned zero-byte files on disk either
    import scala.jdk.CollectionConverters._
    val files = java.nio.file.Files.list(java.nio.file.Paths.get(staged))
      .iterator().asScala.filter(_.toString.endsWith(".bin")).toSeq
    assert(files.size == 1, s"empty payloads must not stage: $files")
    graft.io.IO.deletePath(staged)
  }

  test("decode stub: deterministic in payload bytes, batch loop runs") {
    def run() = Multimodal
      .decodeImageMeta(spark, assets, Multimodal.StubCodec)
      .collect().sortBy(_.asset_id)
    val out1 = run()
    val out2 = run()
    assert(out1.length == 20)
    assert(out1.toSeq == out2.toSeq)
    out1.foreach { m =>
      assert(m.width >= 64 && m.width < 128 && m.height >= 64 && m.height < 128)
    }
  }

  test("ImageIoCodec: a known PNG decodes to its real dimensions and bands") {
    // hand-built 5x3 RGB PNG and 4x7 grayscale PNG, written with the same
    // public ImageIO registry the codec reads with
    def pngBytes(w: Int, h: Int, gray: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(w, h,
        if (gray) java.awt.image.BufferedImage.TYPE_BYTE_GRAY
        else java.awt.image.BufferedImage.TYPE_3BYTE_BGR)
      img.setRGB(0, 0, 0x336699)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val df = Seq((1L, pngBytes(5, 3, gray = false)),
                 (2L, pngBytes(4, 7, gray = true)),
                 (3L, "not an image".getBytes("UTF-8")))
      .toDF("asset_id", "content")
    val out = Multimodal.decodeImageMeta(spark, df).collect()
      .map(m => m.asset_id -> ((m.width, m.height, m.channels))).toMap
    assert(out(1L) == ((5, 3, 3)))
    assert(out(2L) == ((4, 7, 1)))
    assert(out(3L) == ((0, 0, 0))) // poison asset degrades, never throws
  }

  test("stageImageFiles: staged real images decode to the id-derived contract") {
    val staged = Multimodal.stageImageFiles(
      Tables.documents(spark, sf).where("doc_id < 12"),
      "/root/repo/target/qtmp/mmspec_images")
    val assetsDf = Multimodal.readBinaryAssets(spark, staged)
      .select(regexp_extract($"path", "(\\d+)\\.(png|bmp)$", 1)
        .cast("long").as("asset_id"), $"content")
    val out = Multimodal.decodeImageMeta(spark, assetsDf).collect()
      .map(m => m.asset_id -> m).toMap
    assert(out.size == 12)
    (0L until 12L).foreach { id =>
      val m = out(id)
      assert(m.width == 8 + (id % 24).toInt, s"width for $id")
      assert(m.height == 8 + (id % 17).toInt, s"height for $id")
      val wantCh = if (id % 5 != 0 && id % 2 == 1) 1 else 3
      assert(m.channels == wantCh, s"channels for $id: got ${m.channels}")
    }
    graft.io.IO.deletePath(staged)
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
    // and the default (real) path yields different output — text payloads
    // are not images, so ImageIoCodec degrades them to (0, 0, 0)
    val real = Multimodal.decodeImageMeta(spark, assets).collect()
    assert(real.forall(m => m.width == 0 && m.height == 0 && m.channels == 0))
  }

  test("frame sampling: n frames per asset, spans cover prefix of payload") {
    val frames = Multimodal.sampleFrames(assets, 4)
    val counts = frames.groupBy("asset_id").count().as[(Long, Long)].collect()
    assert(counts.forall(_._2 == 4))
    val lens = frames.where($"asset_id" === 1)
      .select("frame_len").as[Int].collect()
    assert(lens.distinct.length == 1) // equal spans
  }

  test("JavaSoundCodec: a known WAV header parses to its real format") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // hand-built 44.1 kHz stereo 16-bit little-endian PCM, 200 frames
    val fmt = new AudioFormat(44100f, 16, 2, true, false)
    val pcm = Array.fill[Byte](200 * 4)(42)
    val bos = new java.io.ByteArrayOutputStream()
    AudioSystem.write(
      new AudioInputStream(new java.io.ByteArrayInputStream(pcm), fmt, 200L),
      AudioFileFormat.Type.WAVE, bos)
    val df = Seq((7L, bos.toByteArray)).toDF("asset_id", "content")
    val got = Multimodal.decodeAudioMeta(spark, df).collect().head
    assert(got == Multimodal.AudioMeta(7L, 44100, 2, 16, 200L))
  }

  test("JavaSoundCodec: poison and null payloads degrade to zeros, not failures") {
    val df = Seq(
      (1L, "definitely not audio".getBytes("UTF-8")),
      (2L, null.asInstanceOf[Array[Byte]]),
      (3L, Array.empty[Byte])).toDF("asset_id", "content")
    val got = Multimodal.decodeAudioMeta(spark, df).collect()
      .map(m => m.asset_id -> m).toMap
    assert(got.values.forall(m =>
      m.sample_rate == 0 && m.channels == 0 && m.bits_per_sample == 0 && m.n_frames == 0L))
    assert(got.size == 3)
  }

  test("Mp4Codec: staged MP4 parses to its id-derived container fields") {
    val dir = Multimodal.stageMp4Files(Seq(5L, 6L).toDF("doc_id"),
      "target/qtmp/spec_mp4")
    val assets = Multimodal.readBinaryAssets(spark, dir)
      .select(regexp_extract($"path", "(\\d+)\\.mp4$", 1).cast("long").as("asset_id"),
        $"content")
    val got = Multimodal.decodeVideoMeta(spark, assets).collect()
      .map(m => m.asset_id -> m).toMap
    assert(got(5L) == Multimodal.VideoMeta(5L, 1000 + 5 * 500, 16 + 10, 16 + 10, 1))
    assert(got(6L) == Multimodal.VideoMeta(6L, 1000 + 6 * 500, 16 + 12, 16 + 12, 1))
  }

  test("Mp4Codec: version-1 boxes and 64-bit largesize parse; poison degrades") {
    import java.nio.ByteBuffer
    def box(typ: String, body: Array[Byte]): Array[Byte] = {
      val b = ByteBuffer.allocate(8 + body.length)
      b.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
      b.array()
    }
    // mvhd VERSION 1: 8-byte times/duration, timescale 90000 (broadcast
    // convention), duration 90000*7 → 7000 ms
    val mvhd1 = {
      val b = ByteBuffer.allocate(112)
      b.putInt(0x01000000)           // version 1
      b.putLong(0).putLong(0)        // 64-bit creation/modification
      b.putInt(90000)                // timescale
      b.putLong(90000L * 7)          // 64-bit duration
      b.putInt(0x00010000).putShort(0x0100.toShort).putShort(0)
      b.putLong(0)
      b.put(new Array[Byte](36))     // matrix (content unused by parser)
      b.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0)
      b.putInt(2)
      box("mvhd", b.array())
    }
    // tkhd VERSION 1 (88-byte offset to the 16.16 dims)
    val tkhd1 = {
      val b = ByteBuffer.allocate(96)
      b.putInt(0x01000007)
      b.putLong(0).putLong(0)        // 64-bit times
      b.putInt(1).putInt(0)
      b.putLong(90000L * 7)          // 64-bit duration
      b.putLong(0)
      b.putShort(0).putShort(0).putShort(0).putShort(0)
      b.put(new Array[Byte](36))
      b.putInt(320 << 16).putInt(240 << 16)
      box("tkhd", b.array())
    }
    val moovBody = mvhd1 ++ box("trak", tkhd1)
    // moov wrapped with a 64-bit largesize header (size32 == 1)
    val moovLarge = {
      val b = ByteBuffer.allocate(16 + moovBody.length)
      b.putInt(1).put("moov".getBytes("ISO-8859-1"))
        .putLong(16L + moovBody.length).put(moovBody)
      b.array()
    }
    val mp4 = box("ftyp",
      ByteBuffer.allocate(8).put("isom".getBytes("ISO-8859-1")).putInt(0).array()) ++
      moovLarge
    val df = Seq((1L, mp4), (2L, "not a container".getBytes("UTF-8")),
      (3L, null.asInstanceOf[Array[Byte]])).toDF("asset_id", "content")
    val got = Multimodal.decodeVideoMeta(spark, df).collect()
      .map(m => m.asset_id -> m).toMap
    assert(got(1L) == Multimodal.VideoMeta(1L, 7000L, 320, 240, 1))
    assert(got(2L) == Multimodal.VideoMeta(2L, 0L, 0, 0, 0))
    assert(got(3L) == Multimodal.VideoMeta(3L, 0L, 0, 0, 0))
  }

  test("stageWavFiles: staged real WAVs decode to the id-derived contract") {
    val docs = Seq(10L, 11L, 12L, 13L).toDF("doc_id")
    val dir = Multimodal.stageWavFiles(docs, "target/qtmp/spec_wavs")
    val assets = Multimodal.readBinaryAssets(spark, dir)
      .select(regexp_extract($"path", "(\\d+)\\.wav$", 1).cast("long").as("asset_id"),
        $"content")
    val got = Multimodal.decodeAudioMeta(spark, assets).collect()
      .map(m => m.asset_id -> m).toMap
    assert(got.size == 4)
    for (id <- 10L to 13L) {
      val m = got(id)
      assert(m.sample_rate == 8000 + (id % 8) * 1000)
      assert(m.channels == 1 + (id % 2).toInt)
      assert(m.bits_per_sample == (if (id % 2 == 1) 8 else 16))
      assert(m.n_frames == 100 + id % 50)
    }
  }
}
