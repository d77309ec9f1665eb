package graft.operators

import java.security.MessageDigest

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal columns: image/audio/video as opaque `binary` payloads with
  * typed metadata, processed by batch iterator kernels (`mapPartitions` —
  * the JVM analog of `mapInPandas` batch plumbing).
  *
  * Three arms are REAL, using codecs the JDK itself ships: q84 decodes PNG
  * images (javax.imageio) with feature-extract + K18 resize; q86
  * frame-samples multi-frame animated-GIF "video" payloads (only sampled
  * frames are decoded); q87 decodes PCM WAV audio (javax.sound) into
  * RMS/zero-crossing features. Compressed AV codecs (JPEG2000, H.264, MP3)
  * aren't on the JVM classpath, so q54/q55 keep the documented md5 STUB for
  * that tier: the Spark-side plumbing — binary column handling, batch
  * iterator shape, schema, partitioning — stays real and oracle-checkable,
  * and a production build swaps the stub for a codec behind the same
  * signature.
  */
object Multimodal {

  final case class Decoded(width: Int, height: Int, channels: Int,
      nFrames: Int, feat0: Double, feat1: Double)

  /** STUB decode: in production this would be an actual image decoder; here
    * dimensions/features are md5-derived so results are deterministic. */
  def decodeImageStub(payload: Array[Byte]): Decoded = {
    val md = MessageDigest.getInstance("MD5")
    val hex = md.digest(payload).map("%02x".format(_)).mkString
    def hexAt(i: Int, n: Int): Int = Integer.parseInt(hex.substring(i, i + n), 16)
    val width = 16 + hexAt(0, 2) % 48
    val height = 16 + hexAt(2, 2) % 32
    val nFrames = 1 + payload.length / 256 // frame-sample stub: 256-byte GOPs
    val feat0 = hexAt(4, 4).toDouble / 65535.0
    val feat1 = hexAt(8, 4).toDouble / 65535.0
    Decoded(width, height, 3, nFrames, feat0, feat1)
  }

  /** Binary payload table: documents.text bytes as the opaque media column. */
  private def payloads(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "documents")
      .select(col("doc_id"), col("source"), col("n_chars"),
        col("text").cast("binary").as("payload"))

  /** Batch decode through mapPartitions (iterator-to-iterator, no collect). */
  def decoded(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    payloads(s, dir)
      .select(col("doc_id"), col("source"), col("payload"))
      .as[(Long, String, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, src, bytes) =>
          val d = decodeImageStub(bytes)
          (id, src, bytes.length, d.width, d.height, d.channels, d.nFrames,
            d.feat0, d.feat1)
        }
      }
      .toDF("doc_id", "source", "n_bytes", "width", "height", "channels",
        "n_frames", "feat0", "feat1")
  }

  /** Per-doc decoded metadata (oracle: same md5 arithmetic in DuckDB). */
  private def q54(s: SparkSession, dir: String): DataFrame =
    decoded(s, dir)
      .select(col("doc_id"), col("n_bytes").cast("long").as("n_bytes"),
        col("width").cast("long").as("width"), col("height").cast("long").as("height"),
        col("n_frames").cast("long").as("n_frames"),
        round(col("feat0"), 6).as("feat0"))
      .orderBy("doc_id")

  /** Media pipeline aggregate: per-source frame budget + size stats. */
  private def q55(s: SparkSession, dir: String): DataFrame =
    decoded(s, dir)
      .groupBy("source")
      .agg(count(lit(1)).as("n_media"),
        sum(col("n_frames").cast("long")).as("total_frames"),
        round(avg(col("width").cast("double")), 4).as("avg_width"),
        max(col("n_bytes").cast("long")).as("max_bytes"))
      .orderBy("source")

  /** Multi-frame GIF encode (JDK ImageIO write sequence) — the test-side
    * "video container": N gray frames in one animated-GIF payload. */
  def encodeGifFrames(frames: Seq[Array[Int]], h: Int, w: Int): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(bos)
    val writer = javax.imageio.ImageIO.getImageWritersByFormatName("gif").next()
    writer.setOutput(ios)
    writer.prepareWriteSequence(null)
    frames.foreach { px =>
      val img = new java.awt.image.BufferedImage(w, h,
        java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
      val raster = img.getRaster
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) { raster.setSample(x, y, 0, px(y * w + x)); x += 1 }
        y += 1
      }
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence()
    ios.close()
    bos.toByteArray
  }

  /** PCM-16 mono WAV encode (JDK javax.sound) — the test-side audio clip. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val fmt = new javax.sound.sampled.AudioFormat(sampleRate.toFloat, 16, 1, true, false)
    val bb = java.nio.ByteBuffer.allocate(samples.length * 2)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    samples.foreach(bb.putShort)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(bb.array()), fmt, samples.length.toLong)
    val bos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
    bos.toByteArray
  }

  /** REAL image decode (no stub): javax.imageio ships PNG/JPEG/BMP/GIF
    * codecs in the JDK itself, so the image arm of the multimodal tier can
    * be genuinely exercised end-to-end — encode synthetic gray PNGs
    * (sinks.Png), carry them as an opaque binary column, then decode /
    * feature-extract / resize inside mapPartitions (iterator-to-iterator,
    * one ImageIO read per payload, no collect). Rows-only: DuckDB cannot
    * decode PNG. Audio/video decode remains stubbed (q54/q55) — those
    * codecs genuinely aren't on the JVM classpath. */
  private def q84(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val payloads = Tables(s, dir, "part").select(col("p_partkey")).as[Long]
      .filter(_ % 8 == 0)
      .map { pk =>
        val h = 16 + (pk % 5).toInt; val w = 12 + (pk % 7).toInt
        val px = Array.tabulate(h * w)(i => ((pk * 31 + i * 7) % 256).toInt)
        (pk, graft.sinks.Png.encodeGray8(px, h, w))
      }.toDF("media_id", "payload")
    payloads.as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          val h = img.getHeight; val w = img.getWidth
          // raw raster samples: getRGB would run the gray→sRGB colorspace
          // conversion and corrupt the pixel values
          val raster = img.getRaster
          val gray = new Array[Float](h * w)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              gray(y * w + x) = raster.getSample(x, y, 0).toFloat
              x += 1
            }
            y += 1
          }
          var mean = 0.0
          gray.foreach(mean += _)
          mean /= gray.length
          // resize through the engine's K18 kernel → 8×8 thumbnail feature
          val thumb = graft.functions.Image.resizeArea(gray, h, w, 8, 8)
          var tmean = 0.0
          thumb.foreach(tmean += _)
          tmean /= thumb.length
          (id, bytes.length.toLong, h.toLong, w.toLong,
            math.rint(mean * 1000) / 1000, math.rint(tmean * 1000) / 1000)
        }
      }
      .toDF("media_id", "n_bytes", "height", "width", "mean_lum", "thumb_mean")
      .orderBy("media_id")
  }

  /** REAL video-frame sampling: multi-frame animated-GIF payloads opened
    * with an ImageIO reader, every 3rd frame decoded (the reference
    * frame-sample pattern — skip decode of unsampled frames entirely),
    * per-sample luminance features aggregated per clip. Rows-only. */
  private def q86(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clips = Tables(s, dir, "supplier").select(col("s_suppkey"))
      .repartition(s.sparkContext.defaultParallelism)
      .as[Long]
      .map { sk =>
        val h = 12; val w = 10
        val nFrames = 4 + (sk % 5).toInt
        val frames = (0 until nFrames).map(f =>
          Array.tabulate(h * w)(i => ((sk * 13 + f * 41 + i * 7) % 256).toInt))
        (sk, encodeGifFrames(frames, h, w))
      }.toDF("clip_id", "payload")
    clips.as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        val reader = javax.imageio.ImageIO.getImageReadersByFormatName("gif").next()
        batch.map { case (id, bytes) =>
          val iis = javax.imageio.ImageIO.createImageInputStream(
            new java.io.ByteArrayInputStream(bytes))
          reader.setInput(iis)
          val n = reader.getNumImages(true)
          val sampled = (0 until n by 3).map { f =>
            val img = reader.read(f) // only sampled frames are decoded
            val raster = img.getRaster
            var sum = 0.0
            var y = 0
            while (y < img.getHeight) {
              var x = 0
              while (x < img.getWidth) { sum += raster.getSample(x, y, 0); x += 1 }
              y += 1
            }
            sum / (img.getWidth * img.getHeight)
          }
          iis.close()
          (id, n.toLong, sampled.length.toLong,
            math.rint(sampled.sum / sampled.length * 1000) / 1000)
        }
      }
      .toDF("clip_id", "n_frames", "n_sampled", "avg_sampled_lum")
      .orderBy("clip_id")
  }

  /** REAL audio decode: PCM-16 WAV payloads through javax.sound's codec,
    * RMS energy + zero-crossing rate per clip (the standard cheap audio
    * quality features). Rows-only. */
  private def q87(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val clips = Tables(s, dir, "nation").select(col("n_nationkey"))
      .as[Long]
      .map { nk =>
        val sr = 8000
        val n = 800 + (nk % 5).toInt * 80
        val samples = Array.tabulate(n) { i =>
          val t = i.toDouble / sr
          val f = 200.0 + 40.0 * nk
          (math.sin(2 * math.Pi * f * t) * 12000 +
            math.sin(2 * math.Pi * 3 * f * t) * 3000).toShort
        }
        (nk, encodeWavPcm16(samples, sr))
      }.toDF("clip_id", "payload")
    clips.as[(Long, Array[Byte])]
      .mapPartitions { batch =>
        batch.map { case (id, bytes) =>
          val ais = javax.sound.sampled.AudioSystem.getAudioInputStream(
            new java.io.ByteArrayInputStream(bytes))
          val fmt = ais.getFormat
          val raw = ais.readAllBytes()
          ais.close()
          val bb = java.nio.ByteBuffer.wrap(raw).order(
            if (fmt.isBigEndian) java.nio.ByteOrder.BIG_ENDIAN
            else java.nio.ByteOrder.LITTLE_ENDIAN)
          val n = raw.length / 2
          var sumSq = 0.0
          var zc = 0L
          var prev = 0
          var i = 0
          while (i < n) {
            val v = bb.getShort(i * 2).toInt
            sumSq += v.toDouble * v
            if (i > 0 && ((v >= 0) != (prev >= 0))) zc += 1
            prev = v
            i += 1
          }
          (id, n.toLong, fmt.getSampleRate.toLong,
            math.rint(math.sqrt(sumSq / n) * 100) / 100,
            math.rint(zc.toDouble / n * 10000) / 10000)
        }
      }
      .toDF("clip_id", "n_samples", "sample_rate", "rms", "zcr")
      .orderBy("clip_id")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q54_multimodal_decode" -> (q54 _),
    "q55_multimodal_agg" -> (q55 _),
    "q84_multimodal_imageio" -> (q84 _),
    "q86_multimodal_frames" -> (q86 _),
    "q87_multimodal_audio" -> (q87 _)
  )

  val oracles: Map[String, String] = Map(
    "q54_multimodal_decode" ->
      """WITH d AS (SELECT doc_id, md5(text) AS hx, length(text) AS n_bytes FROM documents)
        |SELECT doc_id, CAST(n_bytes AS BIGINT) AS n_bytes,
        | CAST(16 + CAST(('0x'||substr(hx,1,2)) AS BIGINT) % 48 AS BIGINT) AS width,
        | CAST(16 + CAST(('0x'||substr(hx,3,2)) AS BIGINT) % 32 AS BIGINT) AS height,
        | CAST(1 + n_bytes // 256 AS BIGINT) AS n_frames,
        | round(CAST(('0x'||substr(hx,5,4)) AS BIGINT) / 65535.0, 6) AS feat0
        |FROM d ORDER BY doc_id""".stripMargin,
    "q55_multimodal_agg" ->
      """WITH d AS (SELECT doc_id, source, md5(text) AS hx, length(text) AS n_bytes FROM documents),
        |m AS (SELECT source, n_bytes,
        |  16 + CAST(('0x'||substr(hx,1,2)) AS BIGINT) % 48 AS width,
        |  1 + n_bytes // 256 AS n_frames
        | FROM d)
        |SELECT source, count(*) AS n_media,
        | CAST(sum(n_frames) AS BIGINT) AS total_frames,
        | round(avg(CAST(width AS DOUBLE)), 4) AS avg_width,
        | CAST(max(n_bytes) AS BIGINT) AS max_bytes
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
