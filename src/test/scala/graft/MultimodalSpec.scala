package graft

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream

import javax.imageio.ImageIO

import graft.operators.Multimodal
import graft.operators.Multimodal.MediaRow

/** The REAL image-decode seam: genuine PNG/BMP payloads encoded with
  * the JDK's own codecs flow through the same per-partition decoder
  * lifecycle as the stub, and the extracted dimensions/luminance match
  * values computed independently from the source pixels.
  */
class MultimodalSpec extends SparkSpec {

  /** A deterministic gradient test image. */
  private def testImage(w: Int, h: Int): BufferedImage = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = x * 255 / math.max(1, w - 1)
      val g = y * 255 / math.max(1, h - 1)
      img.setRGB(x, y, (r << 16) | (g << 8) | 64)
    }
    img
  }

  private def encode(img: BufferedImage, fmt: String): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, out), s"JDK cannot encode $fmt")
    out.toByteArray
  }

  test("ImageIoDecoder decodes real PNG and BMP payloads distributed, pixels verified") {
    import spark.implicits._
    val imgs = Seq(
      (1L, testImage(40, 24), "png"),
      (2L, testImage(17, 31), "png"),
      (3L, testImage(64, 64), "bmp"))
    val media = spark.createDataset(
      imgs.map { case (id, img, fmt) =>
        MediaRow(id, encode(img, fmt), s"image/$fmt")
      }).repartition(3) // decoder constructed per partition
    val decoded = Multimodal
      .decode(media, () => new Multimodal.ImageIoDecoder)
      .collect()
      .map(d => d.id -> d).toMap
    imgs.foreach { case (id, img, _) =>
      val d = decoded(id)
      assert(d.width === img.getWidth && d.height === img.getHeight)
      // independent luminance mean over the source pixels
      val lums = for (y <- 0 until img.getHeight; x <- 0 until img.getWidth)
        yield {
          val rgb = img.getRGB(x, y)
          (((rgb >> 16) & 0xff) * 299L + ((rgb >> 8) & 0xff) * 587L +
            (rgb & 0xff) * 114L) / 1000.0
        }
      assert(math.abs(d.f0 - lums.sum / lums.size / 255.0) < 1e-9)
      assert(d.features.length === 64)
      // the gradient brightens left-to-right: the top-left grid cell is
      // darker than the top-right one
      assert(d.features(0) < d.features(7))
      assert(d.features.forall(f => f >= 0f && f <= 1f))
    }
  }

  test("real resize resamples pixels: fitted dims, luminance preserved within tolerance") {
    val dec = new Multimodal.ImageIoDecoder
    val row = MediaRow(5L, encode(testImage(80, 48), "png"), "image/png")
    val orig = dec.decode(row)
    val small = dec.resize(row, maxW = 20, maxH = 20)
    // aspect-preserving fit: 80x48 -> 20x12
    assert(small.width === 20 && small.height === 12)
    // bilinear downsample of a smooth gradient keeps mean luminance close
    assert(math.abs(small.f0 - orig.f0) < 0.05, s"${small.f0} vs ${orig.f0}")
    // and the gradient's left-right ordering survives resampling
    assert(small.features(0) < small.features(7))
    // no-op when already within bounds
    val same = dec.resize(row, maxW = 100, maxH = 100)
    assert(same.width === 80 && same.height === 48)
  }

  test("corrupt payloads fail loudly with the offending row id") {
    import spark.implicits._
    val junk = spark.createDataset(Seq(
      MediaRow(99L, Array[Byte](1, 2, 3, 4, 5), "image/png")))
    val e = intercept[org.apache.spark.SparkException] {
      Multimodal.decode(junk, () => new Multimodal.ImageIoDecoder).collect()
    }
    val msgs = Iterator.iterate(e: Throwable)(_.getCause).takeWhile(_ != null)
      .map(t => Option(t.getMessage).getOrElse("")).mkString(" | ")
    assert(msgs.contains("id=99"), msgs)
  }

  test("q_media_decode bench row: per-row drift check + corpus coverage pin hold") {
    // the bench-only row end-to-end on the sf0.001 corpus: every PNG
    // decodes to its independently-synthesized expectation AND the one
    // output row's n_decoded is pinned to the documents count (a scan
    // silently dropping rows would otherwise pass the per-row checks
    // with shrunken coverage — round-13 verdict #7)
    val row = SparkEntry.benchOnlyQueries("q_media_decode")(spark, sfDir).collect()
    assert(row.length === 1)
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(row.head.getAs[Long]("n_decoded") === nDocs)
    val f0 = row.head.getAs[Double]("avg_f0")
    assert(f0 > 0.0 && f0 < 1.0, s"avg_f0 out of range: $f0")
    assert(row.head.getAs[Long]("total_bytes") > 0L)
  }

  test("stub and real decoder share the identical pipeline surface") {
    import spark.implicits._
    val media = spark.createDataset(Seq(
      MediaRow(7L, encode(testImage(8, 8), "png"), "image/png")))
    val viaReal = Multimodal.mediaStats(
      Multimodal.decode(media, () => new Multimodal.ImageIoDecoder)).collect()
    assert(viaReal.head.getAs[Long]("n_media") === 1L)
  }
}
