package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions.{col, md5}

/** Real pixel decode ([[Multimodal.imageStats]]/[[featurizeImage]]):
  * closed-form checks on constructed rasters, PNG/JPEG behavior, the
  * never-throws contract, and bit-determinism of the Spark path. */
class ImageSpec extends SparkSpec {
  import spark.implicits._

  private def png(w: Int, h: Int)(pix: (Int, Int) => Int): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(w, h,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) img.setRGB(x, y, pix(x, y))
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", out)
    out.toByteArray
  }

  test("solid color: channel means exact, zero variance, zero edges, one hist bin") {
    val st = Multimodal.imageStats(png(16, 12)((_, _) => (200 << 16) | (100 << 8) | 50)).get
    assert(st.width == 16 && st.height == 12)
    assert(st.meanR == 200.0 && st.meanG == 100.0 && st.meanB == 50.0)
    assert(st.lumaStd == 0.0 && st.edgeEnergy == 0.0)
    assert(st.histogram.count(_ > 0) == 1)
    assert(st.histogram.sum == 16L * 12L)
  }

  test("black-to-white step: luma mean halfway, edge energy = one step per row") {
    // left half black, right half white, width 8: one 255-luma jump
    // per row across 7 horizontal deltas
    val st = Multimodal.imageStats(
      png(8, 10)((x, _) => if (x < 4) 0x000000 else 0xffffff)).get
    assert(math.abs(st.lumaMean - 127.5) < 0.01)
    // edge sum per row = 255 * 10000 scaled luma / 10^4 = 255; mean
    // over (w-1)*h horizontal pairs = 255/7
    assert(math.abs(st.edgeEnergy - 255.0 / 7.0) < 0.01)
    assert(st.histogram(0) == 40L && st.histogram(7) == 40L)
  }

  test("JPEG decodes too (lossy: means within tolerance of the PNG truth)") {
    val img = new java.awt.image.BufferedImage(32, 32,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 32; x <- 0 until 32) {
      val g = (x * 255) / 31; img.setRGB(x, y, (g << 16) | (g << 8) | g)
    }
    val jout = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "jpg", jout)
    val jp = Multimodal.imageStats(jout.toByteArray).get
    assert(jp.width == 32 && jp.height == 32)
    assert(math.abs(jp.lumaMean - 127.5) < 8.0) // DCT ringing tolerance
  }

  test("non-image payloads follow the never-throws contract") {
    assert(Multimodal.imageStats("just text".getBytes).isEmpty)
    assert(Multimodal.imageStats(null).isEmpty)
    assert(Multimodal.imageStats(Array.empty[Byte]).isEmpty)
  }

  test("featurizeImage: decoded rows carry exact micro stats; garbage flagged") {
    val rows = Seq(
      (1L, Multimodal.synthPng(1L)),
      (2L, png(4, 4)((_, _) => 0x808080)),
      (3L, "nope".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.featurizeImage(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("decoded"))
    assert(out(1L).getAs[Int]("width") == 32 && out(1L).getAs[Int]("height") == 24)
    assert(out(2L).getAs[Long]("mean_r_micro") == 128000000L)
    assert(out(2L).getAs[Long]("edge_micro") == 0L)
    assert(!out(3L).getAs[Boolean]("decoded"))
  }

  test("perceptual near-dup recovers PNG/JPEG re-encode pairs, no false positives") {
    // each raster seed appears as a PNG (id 2s) and a JPEG (id 2s+1):
    // byte-level dedup finds nothing, the decoded-feature cosine must
    // find exactly the planted re-encode pairs
    val media = (0L until 20L).flatMap { s =>
      Seq((2 * s, Multimodal.encodePng(Multimodal.synthRaster(s))),
          (2 * s + 1, Multimodal.encodeJpeg(Multimodal.synthRaster(s))))
    }.toDF("media_id", "payload")
    val pairs = Multimodal.imageNearDupPairs(media)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0L until 20L).map(s => (2 * s, 2 * s + 1)).toSet
    assert((pairs -- planted).isEmpty,
      s"false positives: ${pairs -- planted}")
    val recall = planted.count(pairs.contains).toDouble / planted.size
    assert(recall >= 0.9, s"recall $recall: missing ${planted -- pairs}")
    // and the byte-level dedup indeed finds nothing
    val byteDupes = media
      .groupBy(md5(col("payload"))).count().filter(col("count") > 1).count()
    assert(byteDupes == 0L)
  }

  test("autoPlanes: floor at small n, log2 growth past the target occupancy") {
    // the X38Probe scales: sf0.1 (2k media) keeps the tuned floor,
    // sf1 (20k) gets 9 planes — expected occupancy back under 64
    assert(Similarity.autoPlanes(200L, 6) == 6)
    assert(Similarity.autoPlanes(2000L, 6) == 6)
    assert(Similarity.autoPlanes(20000L, 6) == 9)
    assert(Similarity.autoPlanes(200000L, 6) == 12)
    // never below the caller's floor, never past Int bucket ids
    assert(Similarity.autoPlanes(0L, 6) == 6)
    assert(Similarity.autoPlanes(Long.MaxValue / 4, 6) == 30)
  }

  test("bit-determinism under repartitioning") {
    val media = (1L to 40L).map(i => (i, Multimodal.synthPng(i)))
      .toDF("media_id", "payload")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(_.toString).sorted.toSeq
    assert(norm(Multimodal.featurizeImage(media)) ==
      norm(Multimodal.featurizeImage(media.repartition(7))))
  }
}
