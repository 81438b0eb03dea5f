package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: images/audio/video as opaque `binary` columns
  * with typed metadata, processed in batch-friendly partition-level loops.
  *
  * Image decode is REAL: [[ImageIoCodec]] reads PNG/JPEG/BMP/GIF headers
  * through the JDK's `javax.imageio` plugin registry (no external native
  * deps), extracting width/height/bands WITHOUT decoding pixel data — the
  * right cost model for metadata extraction over a 100 TB asset store.
  * The codec seam ([[ImageCodec]]) stays pluggable for formats the JDK
  * lacks (ffmpeg-class video/audio), and [[StubCodec]] remains as the
  * dependency-free fake for plumbing tests. The batch shape is the Scala
  * analogue of `mapInPandas`: one decoder instantiation per partition,
  * rows streamed through it, codec state reused across the batch.
  *
  * Scale notes: binary payloads dominate row size, so ops that only need
  * metadata must never deserialize `content` — [[describe]] is a narrow
  * projection that prunes the binary column out of the scan entirely when
  * the source is columnar.
  */
object Multimodal {

  /** Canonical multimodal schema: id, modality tag, opaque payload, typed
    * metadata struct. */
  val schema: StructType = StructType(Seq(
    StructField("asset_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("source", StringType, nullable = true),
      StructField("n_bytes", LongType, nullable = true))), nullable = true)))

  /** Build a multimodal frame from the `documents` fixture: the UTF-8 bytes
    * stand in for an opaque media payload (deterministic, fixture-derived —
    * the Spark-side plumbing is identical for real image bytes). */
  def fromDocuments(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("asset_id"),
      lit("image").as("modality"),
      encode(col("text"), "UTF-8").as("content"),
      struct(col("source").as("source"),
             octet_length(encode(col("text"), "UTF-8")).cast("long").as("n_bytes")).as("meta"))

  /** Metadata-only description — narrow projection; binary column pruned at
    * the scan when reading parquet. */
  def describe(assets: DataFrame): DataFrame =
    assets.select(col("asset_id"), col("modality"),
      col("meta.n_bytes").as("n_bytes"),
      hex(substring(col("content"), 1, 4)).as("magic"))

  case class DecodedMeta(asset_id: Long, width: Int, height: Int, channels: Int)

  /** The codec seam: swapping the stub for a real JPEG/PNG/ffmpeg decoder
    * is a CONFIG choice (pass a different codec), not a code edit. An
    * implementation ships to executors (must be Serializable) and gets one
    * [[ImageCodec.partitionDecoder]] call per partition — native contexts,
    * sessions, scratch buffers belong in that call's closure, created once
    * and reused across the partition's rows (the mapInPandas batch shape),
    * never in the constructor (which serializes) and never per row. */
  trait ImageCodec extends Serializable {
    /** Called once per partition; the returned function decodes each row
      * reusing whatever state this call created. */
    def partitionDecoder(): (Long, Array[Byte]) => DecodedMeta
  }

  /** STUB codec: deterministic fake dimensions derived from the payload
    * bytes — a dependency-free stand-in for plumbing tests and for
    * payloads that are not images at all. */
  object StubCodec extends ImageCodec {
    def partitionDecoder(): (Long, Array[Byte]) => DecodedMeta = decodeOne
  }

  /** REAL image codec via the JDK's `javax.imageio` registry: resolves a
    * format reader from the payload's magic bytes (PNG/JPEG/BMP/GIF/TIFF
    * in a stock JDK), then reads width/height/band-count from the HEADER
    * only — `ImageReader.getWidth/getHeight/getImageTypes` never decode
    * pixel data, so per-asset cost is a few hundred header bytes however
    * large the image is. Undecodable or null payloads degrade to
    * (0, 0, 0) rather than failing the batch — at corpus scale a poison
    * asset must never kill the job (filter `width = 0` downstream).
    * Per-partition setup disables ImageIO's on-disk scratch cache once so
    * header reads stay purely in-memory. */
  object ImageIoCodec extends ImageCodec {
    def partitionDecoder(): (Long, Array[Byte]) => DecodedMeta = {
      javax.imageio.ImageIO.setUseCache(false)
      (id, bytes) => {
        if (bytes == null || bytes.length == 0) DecodedMeta(id, 0, 0, 0)
        else {
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          try {
            val readers = javax.imageio.ImageIO.getImageReaders(iis)
            if (!readers.hasNext) DecodedMeta(id, 0, 0, 0)
            else {
              val r = readers.next()
              try {
                r.setInput(iis, true, true)
                val types = r.getImageTypes(0)
                val bands = if (types.hasNext) types.next().getNumBands else 0
                DecodedMeta(id, r.getWidth(0), r.getHeight(0), bands)
              } catch {
                case _: java.io.IOException => DecodedMeta(id, 0, 0, 0)
              } finally r.dispose()
            }
          } finally if (iis != null) iis.close()
        }
      }
    }
  }

  /** Decode image metadata with `codec` (default: the real `javax.imageio`
    * header reader). The batch shape is the tested contract: one decoder
    * instantiation per partition, rows streamed through it. */
  def decodeImageMeta(spark: SparkSession, assets: DataFrame,
                      codec: ImageCodec = ImageIoCodec): Dataset[DecodedMeta] = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup happens inside partitionDecoder(): a real
        // codec creates its native context exactly once per partition here
        val decode = codec.partitionDecoder()
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** STUB decode body: stands in for a real image decode; deterministic in
    * the bytes. */
  private[llm] def decodeOne(id: Long, bytes: Array[Byte]): DecodedMeta = {
    val n = if (bytes == null) 0 else bytes.length
    val b0 = if (n > 0) bytes(0) & 0xff else 0
    val b1 = if (n > 1) bytes(1) & 0xff else 0
    DecodedMeta(id, width = 64 + (b0 % 64), height = 64 + (b1 % 64),
      channels = if (n % 2 == 0) 3 else 1)
  }

  /** Stage a SMALL document sample as one payload file per row
    * (`<id>.bin`) — the fixture-staging harness for [[readBinaryAssets]],
    * mirroring how media actually arrives: as files already sitting on
    * storage. The driver-side collect is deliberate and bounded (this
    * creates a test fixture; a production ingest never writes these files,
    * it READS the ones the crawler/uploader produced). */
  def stageAssetFiles(docs: DataFrame, outDir: String, idCol: String = "doc_id",
                      textCol: String = "text"): String = {
    import java.nio.file.{Files, Paths}
    import org.apache.spark.sql.functions.{coalesce, col, lit, length}
    graft.io.IO.deletePath(outDir)
    Files.createDirectories(Paths.get(outDir))
    // NULL/empty text is SKIPPED, not staged as a zero-byte file: Spark's
    // file index drops zero-length files from every file-based scan, so an
    // empty payload can never come back through the binaryFile source —
    // "no empty assets exist" is the source's own contract, and the
    // mm_binary_ingest oracle applies the same octet_length > 0 filter
    docs.select(col(idCol).cast("long"),
        coalesce(col(textCol), lit("")).as("__t"))
      .where(length(col("__t")) > 0)
      .collect().foreach { r =>
        Files.write(Paths.get(outDir, s"${r.getLong(0)}.bin"),
          r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
      }
    outDir
  }

  /** Stage a SMALL sample of REAL image files (`<id>.png` / `<id>.bmp`) —
    * the fixture harness for [[decodeImageMeta]] with the real codec,
    * standing in for the media a crawler/uploader lands on storage. Every
    * image property derives deterministically from the id so an oracle
    * can predict the decode output without touching the bytes:
    * width = 8 + id % 24, height = 8 + id % 17, BMP for id % 5 == 0
    * (3-channel), otherwise PNG (grayscale 1-channel when id is odd,
    * RGB 3-channel when even). Written with the same `javax.imageio`
    * plugin registry the decoder reads with. Driver-side and bounded by
    * design, like [[stageAssetFiles]]: this creates a test fixture. */
  def stageImageFiles(docs: DataFrame, outDir: String,
                      idCol: String = "doc_id"): String = {
    import java.awt.image.BufferedImage
    import java.nio.file.{Files, Paths}
    graft.io.IO.deletePath(outDir)
    Files.createDirectories(Paths.get(outDir))
    docs.select(col(idCol).cast("long")).collect().foreach { r =>
      val id = r.getLong(0)
      val w = 8 + (id % 24).toInt
      val h = 8 + (id % 17).toInt
      val fmt = if (id % 5 == 0) "bmp" else "png"
      val gray = fmt == "png" && id % 2 == 1
      val img = new BufferedImage(w, h,
        if (gray) BufferedImage.TYPE_BYTE_GRAY else BufferedImage.TYPE_3BYTE_BGR)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          img.setRGB(x, y, ((id * 2654435761L + x * 7 + y * 131) & 0xffffff).toInt)
          x += 1
        }
        y += 1
      }
      val f = Paths.get(outDir, s"$id.$fmt").toFile
      require(javax.imageio.ImageIO.write(img, fmt, f), s"no $fmt writer")
    }
    outDir
  }

  case class AudioMeta(asset_id: Long, sample_rate: Int, channels: Int,
                       bits_per_sample: Int, n_frames: Long)

  /** Audio analogue of [[ImageCodec]]: same pluggable seam, same
    * one-decoder-per-partition batch shape. */
  trait AudioCodec extends Serializable {
    def partitionDecoder(): (Long, Array[Byte]) => AudioMeta
  }

  /** REAL audio codec via the JDK's `javax.sound.sampled` registry:
    * `AudioSystem.getAudioFileFormat` parses the WAV/AIFF/AU HEADER only
    * (the RIFF/fmt chunk — sample rate, channel count, sample width,
    * frame length) without touching sample data, so per-asset cost is a
    * few dozen bytes however long the recording is — the same cost model
    * as [[ImageIoCodec]]. Unparseable or null payloads degrade to zeros
    * rather than failing the batch (poison-asset rule). */
  object JavaSoundCodec extends AudioCodec {
    def partitionDecoder(): (Long, Array[Byte]) => AudioMeta =
      (id, bytes) => {
        if (bytes == null || bytes.length == 0) AudioMeta(id, 0, 0, 0, 0L)
        else try {
          val aff = javax.sound.sampled.AudioSystem.getAudioFileFormat(
            new java.io.ByteArrayInputStream(bytes))
          val f = aff.getFormat
          AudioMeta(id, f.getSampleRate.toInt, f.getChannels,
            f.getSampleSizeInBits, aff.getFrameLength.toLong)
        } catch {
          case _: javax.sound.sampled.UnsupportedAudioFileException |
               _: java.io.IOException => AudioMeta(id, 0, 0, 0, 0L)
        }
      }
  }

  /** Decode audio metadata with `codec` (default: the real JDK header
    * parser); mapPartitions for the per-partition codec-instantiation
    * contract shared with [[decodeImageMeta]]. */
  def decodeAudioMeta(spark: SparkSession, assets: DataFrame,
                      codec: AudioCodec = JavaSoundCodec): Dataset[AudioMeta] = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = codec.partitionDecoder()
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** Stage a SMALL sample of REAL PCM WAV files (`<id>.wav`) — the fixture
    * harness for [[decodeAudioMeta]], mirroring [[stageImageFiles]]. Every
    * audio property derives deterministically from the id so an oracle can
    * predict the decode output without touching the bytes:
    * sampleRate = 8000 + (id % 8) · 1000, channels = 1 + id % 2,
    * bits = 8 for odd ids / 16 for even, frames = 100 + id % 50. Written
    * with the same `javax.sound.sampled` registry the decoder reads with.
    * Driver-side and bounded by design: this creates a test fixture. */
  def stageWavFiles(docs: DataFrame, outDir: String,
                    idCol: String = "doc_id"): String = {
    import java.nio.file.{Files, Paths}
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    graft.io.IO.deletePath(outDir)
    Files.createDirectories(Paths.get(outDir))
    docs.select(col(idCol).cast("long")).collect().foreach { r =>
      val id = r.getLong(0)
      val rate = 8000f + (id % 8).toInt * 1000f
      val channels = 1 + (id % 2).toInt
      val bits = if (id % 2 == 1) 8 else 16
      val frames = 100 + (id % 50).toInt
      val fmt = new AudioFormat(rate, bits, channels, bits == 16, false)
      val bytesPerFrame = channels * bits / 8
      val pcm = Array.tabulate(frames * bytesPerFrame)(i =>
        ((id * 2654435761L + i * 31) & 0xff).toByte)
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcm), fmt, frames.toLong)
      AudioSystem.write(ais, AudioFileFormat.Type.WAVE,
        Paths.get(outDir, s"$id.wav").toFile)
    }
    outDir
  }

  case class VideoMeta(asset_id: Long, duration_ms: Long, width: Int,
                       height: Int, n_tracks: Int)

  /** Video analogue of [[ImageCodec]]/[[AudioCodec]]: same pluggable seam,
    * same per-partition batch shape. */
  trait VideoCodec extends Serializable {
    def partitionDecoder(): (Long, Array[Byte]) => VideoMeta
  }

  /** REAL MP4 (ISO BMFF, ISO/IEC 14496-12) container parser: walks the
    * box tree (size+fourcc headers, 64-bit `largesize` supported) to
    * `moov`, reads duration/timescale from `mvhd` (version 0 and 1
    * layouts) and the presentation width/height from the first `trak`'s
    * `tkhd` (16.16 fixed point), counting tracks on the way. HEADER-ONLY
    * by construction — `mdat` (the sample data, ~all of a real file's
    * bytes) is skipped via its size field without being read, the same
    * cost model as the image/audio codecs. The JDK ships no MP4 reader,
    * so the box walk is implemented here from the public spec layout;
    * malformed or non-MP4 payloads degrade to zeros (poison-asset rule). */
  object Mp4Codec extends VideoCodec {
    def partitionDecoder(): (Long, Array[Byte]) => VideoMeta = parse

    private def parse(id: Long, bytes: Array[Byte]): VideoMeta = {
      if (bytes == null || bytes.length < 8) return VideoMeta(id, 0L, 0, 0, 0)
      try {
        val bb = java.nio.ByteBuffer.wrap(bytes) // ISO BMFF is big-endian
        var durMs = 0L; var w = 0; var h = 0; var tracks = 0
        // children of [start, end): invoke f(fourcc, bodyStart, boxEnd)
        def boxes(start: Int, end: Int, f: (String, Int, Int) => Unit): Unit = {
          var p = start
          var ok = true
          while (ok && p + 8 <= end) {
            val size32 = bb.getInt(p)
            val typ = new String(bytes, p + 4, 4, "ISO-8859-1")
            val (hdr, boxSize) =
              if (size32 == 1 && p + 16 <= end) (16, bb.getLong(p + 8))
              else (8, size32.toLong & 0xffffffffL)
            if (boxSize < hdr || p + boxSize > end) ok = false
            else {
              f(typ, p + hdr, p + boxSize.toInt)
              p += boxSize.toInt
            }
          }
        }
        boxes(0, bytes.length, {
          case ("moov", ms, me) => boxes(ms, me, {
            case ("mvhd", s, _) =>
              val v = bytes(s) & 0xff
              if (v == 1) {
                val ts = bb.getInt(s + 20)
                if (ts > 0) durMs = bb.getLong(s + 24) * 1000L / ts
              } else {
                val ts = bb.getInt(s + 12)
                if (ts > 0)
                  durMs = (bb.getInt(s + 16).toLong & 0xffffffffL) * 1000L / ts
              }
            case ("trak", s, e) =>
              tracks += 1
              boxes(s, e, {
                case ("tkhd", ks, _) =>
                  val v = bytes(ks) & 0xff
                  // v0: ver/flags 4 + times 4+4 + id 4 + res 4 + dur 4
                  //   + res 8 + layer/alt/volume/res 8 + matrix 36 = 76
                  // v1: 8-byte times and duration = 88
                  val at = ks + (if (v == 1) 88 else 76)
                  if (w == 0) { // first track with real presentation size
                    w = bb.getInt(at) >>> 16      // 16.16 fixed point
                    h = bb.getInt(at + 4) >>> 16
                  }
                case _ => ()
              })
            case _ => ()
          })
          case _ => ()
        })
        VideoMeta(id, durMs, w, h, tracks)
      } catch {
        case _: IndexOutOfBoundsException | _: NegativeArraySizeException =>
          VideoMeta(id, 0L, 0, 0, 0)
      }
    }
  }

  /** Decode video container metadata with `codec` (default: the BMFF box
    * parser); same per-partition contract as the other modalities. */
  def decodeVideoMeta(spark: SparkSession, assets: DataFrame,
                      codec: VideoCodec = Mp4Codec): Dataset[VideoMeta] = {
    import spark.implicits._
    assets.select("asset_id", "content").as[(Long, Array[Byte])]
      .mapPartitions { it =>
        val decode = codec.partitionDecoder()
        it.map { case (id, bytes) => decode(id, bytes) }
      }
  }

  /** Stage a SMALL sample of minimal-but-valid MP4 files (`<id>.mp4`) —
    * ftyp + moov(mvhd + trak(tkhd)) + an mdat payload, laid out per the
    * public ISO/IEC 14496-12 box structure (the JDK ships no MP4 writer,
    * so the boxes are assembled field by field). Properties derive from
    * the id: duration_ms = 1000 + (id % 60) · 500, width = 16 + (id % 32)
    * · 2, height = 16 + (id % 18) · 2, one track. Driver-side and bounded
    * by design: this creates a test fixture. */
  def stageMp4Files(docs: DataFrame, outDir: String,
                    idCol: String = "doc_id"): String = {
    import java.nio.ByteBuffer
    import java.nio.file.{Files, Paths}
    graft.io.IO.deletePath(outDir)
    Files.createDirectories(Paths.get(outDir))
    docs.select(col(idCol).cast("long")).collect().foreach { r =>
      val id = r.getLong(0)
      val durMs = 1000L + (id % 60) * 500L
      val w = 16 + (id % 32).toInt * 2
      val h = 16 + (id % 18).toInt * 2
      def box(typ: String, body: Array[Byte]): Array[Byte] = {
        val out = ByteBuffer.allocate(8 + body.length)
        out.putInt(8 + body.length).put(typ.getBytes("ISO-8859-1")).put(body)
        out.array()
      }
      val unityMatrix = {
        val m = ByteBuffer.allocate(36)
        m.putInt(0x00010000).putInt(0).putInt(0)
        m.putInt(0).putInt(0x00010000).putInt(0)
        m.putInt(0).putInt(0).putInt(0x40000000)
        m.array()
      }
      val mvhd = { // version 0 body: timescale 1000 → duration == durMs
        val b = ByteBuffer.allocate(100)
        b.putInt(0)                  // version + flags
        b.putInt(0).putInt(0)        // creation / modification
        b.putInt(1000)               // timescale
        b.putInt(durMs.toInt)        // duration (in timescale units)
        b.putInt(0x00010000)         // rate 1.0
        b.putShort(0x0100.toShort)   // volume 1.0
        b.putShort(0)                // reserved
        b.putLong(0)                 // reserved
        b.put(unityMatrix)
        b.putInt(0).putInt(0).putInt(0).putInt(0).putInt(0).putInt(0) // pre_defined
        b.putInt(2)                  // next_track_ID
        box("mvhd", b.array())
      }
      val tkhd = { // version 0 body
        val b = ByteBuffer.allocate(84)
        b.putInt(0x00000007)         // version + flags (enabled|in-movie|in-preview)
        b.putInt(0).putInt(0)        // creation / modification
        b.putInt(1)                  // track_ID
        b.putInt(0)                  // reserved
        b.putInt(durMs.toInt)        // duration
        b.putLong(0)                 // reserved
        b.putShort(0).putShort(0)    // layer, alternate_group
        b.putShort(0).putShort(0)    // volume (video track: 0), reserved
        b.put(unityMatrix)
        b.putInt(w << 16)            // width, 16.16
        b.putInt(h << 16)            // height, 16.16
        box("tkhd", b.array())
      }
      val ftyp = box("ftyp",
        ByteBuffer.allocate(8).put("isom".getBytes("ISO-8859-1")).putInt(0).array())
      val moov = box("moov", mvhd ++ box("trak", tkhd))
      val mdat = box("mdat",
        Array.tabulate(64)(i => ((id * 2654435761L + i * 131) & 0xff).toByte))
      Files.write(Paths.get(outDir, s"$id.mp4"), ftyp ++ moov ++ mdat)
    }
    outDir
  }

  /** The real multimodal ingestion path: Spark's built-in `binaryFile`
    * source reads whole files as rows of (path, modificationTime, length,
    * content) — images/audio/video land in the engine as binary columns
    * without any decode step, and everything downstream ([[describe]],
    * [[decodeImageMeta]], [[sampleFrames]]) applies unchanged. At scale the
    * source parallelizes over files (bin-packed by
    * `spark.sql.files.maxPartitionBytes`), prunes `content` when only
    * metadata is projected, and never lists more than the load path. */
  def readBinaryAssets(spark: SparkSession, dir: String): DataFrame =
    spark.read.format("binaryFile").load(dir)

  /** Frame-sampling plumbing: slice the payload into `frames` equal spans
    * (stands in for video frame extraction); pure SQL, no UDF. */
  def sampleFrames(assets: DataFrame, frames: Int): DataFrame =
    assets.select(col("asset_id"),
        posexplode(transform(sequence(lit(0), lit(frames - 1)), i =>
          substring_binary(col("content"),
            (i * octet_length(col("content")) / frames) + 1,
            octet_length(col("content")) / frames))))
      .withColumnRenamed("pos", "frame_no").withColumnRenamed("col", "frame_bytes")
      .withColumn("frame_len", octet_length(col("frame_bytes")))

  private def substring_binary(c: org.apache.spark.sql.Column,
                               pos: org.apache.spark.sql.Column,
                               len: org.apache.spark.sql.Column) =
    c.substr(pos, len)
}
