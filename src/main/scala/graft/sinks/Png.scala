package graft.sinks

import java.awt.image.BufferedImage
import java.io.{ByteArrayInputStream, ByteArrayOutputStream, File}

import javax.imageio.ImageIO

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** K29/S6/S7: PNG codec (pure-JDK ImageIO) and the partitioned PNG
  * directory sink of the v1 pipeline (reference save_image,
  * slice_generator.py:29-31 — `HR/` and `LRx{s}/` layout, mkdir-p,
  * skip-if-exists idempotency P4).
  */
object Png {

  /** Encode an 8-bit grayscale image (values clamped to 0..255). */
  def encodeGray8(pixels: Array[Int], h: Int, w: Int): Array[Byte] = {
    require(pixels.length == h * w, s"${pixels.length} != ${h}x$w")
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = pixels(y * w + x)
        raster.setSample(x, y, 0, if (v < 0) 0 else if (v > 255) 255 else v)
        x += 1
      }
      y += 1
    }
    val bos = new ByteArrayOutputStream()
    ImageIO.write(img, "png", bos)
    bos.toByteArray
  }

  /** Decode a PNG to (gray samples, h, w) — first band, like the
    * reference's first-channel projection (P6). */
  def decodeGray(bytes: Array[Byte]): (Array[Int], Int, Int) = {
    val img = ImageIO.read(new ByteArrayInputStream(bytes))
    val h = img.getHeight; val w = img.getWidth
    val out = new Array[Int](h * w)
    val raster = img.getRaster
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) { out(y * w + x) = raster.getSample(x, y, 0); x += 1 }
      y += 1
    }
    (out, h, w)
  }

  /** S7 directory sink: `df(tier, split, key, pixels: Array[Int], h, w)` →
    * `root/tier/split/key.png`, one writer task per partition, mkdir-p,
    * existence check unless force (P4 idempotency). Each file lands via
    * tmp + atomic rename: a task killed mid-write must never leave a
    * truncated `key.png` under its final name — the P4 skip-if-exists
    * check on the retry would otherwise preserve the corrupt file
    * forever. */
  def writeDir(df: DataFrame, root: String, force: Boolean = false): Unit =
    df.foreachPartition { rows: Iterator[Row] =>
      rows.foreach { r =>
        val dir = new File(s"$root/${r.getAs[String]("tier")}/${r.getAs[String]("split")}")
        dir.mkdirs()
        val f = new File(dir, r.getAs[String]("key") + ".png")
        if (force || !f.exists()) {
          val px = r.getAs[scala.collection.Seq[Int]]("pixels").toArray
          val bytes = encodeGray8(px, r.getAs[Int]("h"), r.getAs[Int]("w"))
          val tmp = new File(dir, f.getName + ".tmp-" +
            java.util.UUID.randomUUID().toString.take(8))
          java.nio.file.Files.write(tmp.toPath, bytes)
          java.nio.file.Files.move(tmp.toPath, f.toPath,
            java.nio.file.StandardCopyOption.ATOMIC_MOVE,
            java.nio.file.StandardCopyOption.REPLACE_EXISTING)
        }
      }
      ()
    }

  /** S6: scan a PNG directory back as (path, gray pixels, h, w). */
  def readDir(spark: SparkSession, root: String): DataFrame = {
    val decode = udf { (bytes: Array[Byte]) =>
      val (px, h, w) = decodeGray(bytes)
      (px, h, w)
    }
    spark.read.format("binaryFile")
      .option("recursiveFileLookup", "true")
      .option("pathGlobFilter", "*.png")
      .load(root)
      .withColumn("d", decode(col("content")))
      .select(col("path"), col("d._1").as("pixels"), col("d._2").as("h"), col("d._3").as("w"))
  }
}
