package graft.operators

import graft.SparkSpec

/** MP4/ISO-BMFF header parse ([[Multimodal.videoHeader]]): field
  * round-trip through the synth builder, 64-bit box sizes, malformed
  * inputs, and the never-throws contract. */
class VideoSpec extends SparkSpec {

  test("synth round-trip: brand, duration, dims, track count") {
    for (seed <- Seq(0L, 7L, 123L, 9999L)) {
      val hd = Multimodal.videoHeader(Multimodal.synthMp4(seed)).get
      assert(hd.format == "mp4/isom")
      assert(hd.durationMs == 1000L + (seed % 600) * 100L)
      assert(hd.width == 320 + (seed % 8).toInt * 80)
      assert(hd.height == 240 + ((seed / 3) % 6).toInt * 60)
      assert(hd.nTracks == 1)
    }
  }

  test("non-video payloads never throw") {
    assert(Multimodal.videoHeader("plain text".getBytes).isEmpty)
    assert(Multimodal.videoHeader(null).isEmpty)
    assert(Multimodal.videoHeader(Array.empty[Byte]).isEmpty)
    // a PNG is not an MP4
    assert(Multimodal.videoHeader(Multimodal.synthPng(1L)).isEmpty)
    // truncated mid-box: the walk stops, returns what it has or None
    val whole = Multimodal.synthMp4(5L)
    val cut = java.util.Arrays.copyOf(whole, 20)
    assert(Multimodal.videoHeader(cut).isEmpty)
  }

  test("malformed box sizes stop the walk instead of looping or throwing") {
    val bytes = Multimodal.synthMp4(3L)
    // corrupt the moov size field to a huge value
    val corrupt = bytes.clone()
    val moovOff = 24 // after the 24-byte ftyp
    corrupt(moovOff) = 0x7f.toByte
    assert(Multimodal.videoHeader(corrupt).isEmpty ||
      Multimodal.videoHeader(corrupt).get.nTracks == 0)
    // zero-size box (would loop forever without the size < hdr guard)
    val zero = bytes.clone()
    zero(moovOff) = 0; zero(moovOff + 1) = 0
    zero(moovOff + 2) = 0; zero(moovOff + 3) = 0
    Multimodal.videoHeader(zero) // must terminate
  }
}
