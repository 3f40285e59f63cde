package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Real PCM decode ([[Multimodal.pcmStats]]/[[Multimodal.featurizeAudio]]):
  * closed-form checks on synthesized sines, 8-bit and stereo layouts,
  * the not-audio contract, and bit-determinism of the Spark path. */
class AudioSpec extends SparkSpec {
  import spark.implicits._

  /** Hand-rolled WAV builder with full layout control (channels/bits). */
  private def wav(samples: Seq[Seq[Double]], rateHz: Int, bits: Int): Array[Byte] = {
    val channels = samples.head.size
    val bps = bits / 8
    val dataLen = samples.size * channels * bps
    val out = new java.io.ByteArrayOutputStream()
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Long): Unit = (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
    out.write("RIFF".getBytes); w32(36L + dataLen)
    out.write("WAVE".getBytes); out.write("fmt ".getBytes)
    w32(16L); w16(1); w16(channels); w32(rateHz.toLong)
    w32(rateHz.toLong * channels * bps); w16(channels * bps); w16(bits)
    out.write("data".getBytes); w32(dataLen.toLong)
    samples.foreach(_.foreach { s =>
      if (bits == 16) w16(math.max(-32768, math.min(32767, math.round(s * 32767).toInt)))
      else out.write(math.max(0, math.min(255, math.round(s * 127 + 128).toInt)))
    })
    out.toByteArray
  }

  private def sine(n: Int, freq: Double, rate: Int, amp: Double): Seq[Double] =
    (0 until n).map(i => amp * math.sin(2 * math.Pi * freq * i / rate))

  test("sine: RMS = amp/sqrt(2), peak = amp, exact duration and ZCR") {
    val rate = 8000; val n = 8000; val freq = 200.0; val amp = 0.5
    val st = Multimodal.pcmStats(wav(sine(n, freq, rate, amp).map(Seq(_)), rate, 16)).get
    assert(st.header.sampleRateHz == rate && st.header.channels == 1)
    assert(st.nFrames == n && st.header.durationMs == 1000L)
    assert(math.abs(st.rms - amp / math.sqrt(2)) < 0.01 * amp)
    assert(math.abs(st.peak - amp) < 0.01)
    assert(math.abs(st.dcOffset) < 1e-3)
    // a full second of a 200 Hz sine crosses zero ~400 times
    assert(math.abs(st.zeroCrossings - 2 * freq) < 4)
    // flat envelope for a steady tone
    val e = st.envelope
    assert(e.forall(v => math.abs(v - e.head) < 0.05))
  }

  test("8-bit PCM decodes to the same stats as 16-bit (within quantization)") {
    val rate = 4000; val s = sine(4000, 100.0, rate, 0.4).map(Seq(_))
    val a = Multimodal.pcmStats(wav(s, rate, 16)).get
    val b = Multimodal.pcmStats(wav(s, rate, 8)).get
    assert(b.header.bitsPerSample == 8)
    assert(math.abs(a.rms - b.rms) < 0.01)
    assert(math.abs(a.peak - b.peak) < 0.02)
  }

  test("stereo mixdown: in-phase preserves, anti-phase cancels") {
    val rate = 4000; val mono = sine(2000, 150.0, rate, 0.3)
    val inPhase = Multimodal.pcmStats(wav(mono.map(s => Seq(s, s)), rate, 16)).get
    val anti = Multimodal.pcmStats(wav(mono.map(s => Seq(s, -s)), rate, 16)).get
    assert(inPhase.header.channels == 2)
    assert(math.abs(inPhase.rms - 0.3 / math.sqrt(2)) < 0.01)
    assert(anti.rms < 0.001, "opposite-phase channels must cancel in the mixdown")
  }

  test("silence and non-audio payloads follow the never-throws contract") {
    assert(Multimodal.pcmStats("not a wav at all".getBytes).isEmpty)
    assert(Multimodal.pcmStats(null).isEmpty)
    assert(Multimodal.pcmStats(Array.empty[Byte]).isEmpty)
    val silent = Multimodal.pcmStats(
      wav(Seq.fill(100)(Seq(0.0)), 8000, 16)).get
    assert(silent.rms == 0.0 && silent.zeroCrossings == 0L)
  }

  test("a chunk length near Int.MaxValue cannot wrap the walk negative") {
    // crafted RIFF: a JUNK chunk DECLARING ~2^31 bytes it doesn't have
    // — the old Int cursor overflowed negative, passed the bounds
    // check, and threw ArrayIndexOutOfBounds; the walk must just stop
    def hostile(declared: Long): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      def w32(v: Long): Unit =
        (0 until 4).foreach(i => out.write(((v >> (8 * i)) & 0xff).toInt))
      out.write("RIFF".getBytes); w32(100L)
      out.write("WAVE".getBytes)
      out.write("fmt ".getBytes); w32(16L)
      out.write(Array.fill[Byte](16)(1))
      out.write("JUNK".getBytes); w32(declared)
      out.write(Array.fill[Byte](64)(0)) // far fewer than declared
      out.toByteArray
    }
    for (len <- Seq(Int.MaxValue - 16L, Int.MaxValue - 1L, 0xfffffff0L)) {
      assert(Multimodal.pcmStats(hostile(len)).isEmpty)
      assert(Multimodal.audioHeader(hostile(len)).isEmpty)
    }
  }

  test("featurizeAudio: decoded rows carry micro-rounded stats; garbage rows are flagged") {
    val rows = Seq(
      (1L, Multimodal.synthWav(1L)),
      (2L, Multimodal.synthWav(2L)),
      (3L, "definitely text".getBytes)).toDF("media_id", "payload")
    val out = Multimodal.featurizeAudio(rows).collect()
      .map(r => r.getAs[Long]("media_id") -> r).toMap
    assert(out(1L).getAs[Boolean]("decoded"))
    assert(out(1L).getAs[Int]("sample_rate_hz") == 8000)
    assert(out(1L).getAs[Long]("n_frames") == 800L)
    assert(out(1L).getAs[Long]("rms_micro") > 0L)
    assert(!out(3L).getAs[Boolean]("decoded"))
    assert(out(3L).getAs[Long]("rms_micro") == 0L)
  }

  test("bit-determinism under repartitioning (sequential per-row decode)") {
    val media = (1L to 60L).map(i => (i, Multimodal.synthWav(i)))
      .toDF("media_id", "payload")
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.drop("envelope").collect().map(_.toString).sorted.toSeq
    assert(norm(Multimodal.featurizeAudio(media)) ==
      norm(Multimodal.featurizeAudio(media.repartition(7))))
  }
}
