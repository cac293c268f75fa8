package graft.operators

import graft.SparkSpec
import graft.operators.Multimodal.{Media, WavCodec}
import java.nio.{ByteBuffer, ByteOrder}

class WavCodecSpec extends SparkSpec {
  import spark.implicits._

  private def le(n: Int): Array[Byte] =
    ByteBuffer.allocate(4).order(ByteOrder.LITTLE_ENDIAN).putInt(n).array()
  private def le16(n: Int): Array[Byte] =
    ByteBuffer.allocate(2).order(ByteOrder.LITTLE_ENDIAN)
      .putShort(n.toShort).array()

  test("encode/decode round trip preserves samples and format") {
    val samples = Array[Short](0, 100, -100, 32767, -32768, 7)
    val wav = WavCodec.encode(samples, sampleRate = 44100)
    assert(wav.length === 44 + samples.length * 2)
    val got = WavCodec.decode(wav)
    assert(got.sampleRate === 44100)
    assert(got.nChannels === 1)
    assert(got.bitsPerSample === 16)
    assert(got.samples.toSeq === samples.toSeq)
  }

  test("parser skips unknown chunks, honoring the odd-size pad rule") {
    val samples = Array[Short](5, -5, 9)
    val canonical = WavCodec.encode(samples)
    // splice a 3-byte LIST chunk (odd size → 1 pad byte) between
    // fmt and data
    val head = canonical.slice(0, 36) // RIFF..WAVE + fmt chunk
    val tail = canonical.slice(36, canonical.length) // data chunk
    val junk = "LIST".getBytes("US-ASCII") ++ le(3) ++
      Array[Byte](1, 2, 3, 0) // payload + pad
    val spliced = head ++ junk ++ tail
    // fix the RIFF size field (bytes 4..8)
    System.arraycopy(le(spliced.length - 8), 0, spliced, 4, 4)
    val got = WavCodec.decode(spliced)
    assert(got.samples.toSeq === samples.toSeq)
  }

  test("parser fails loudly on corrupt containers") {
    val ok = WavCodec.encode(Array[Short](1, 2, 3))
    def mutate(f: Array[Byte] => Array[Byte]): Array[Byte] = f(ok.clone())
    // wrong magic
    intercept[IllegalArgumentException] {
      WavCodec.decode(mutate { b => b(0) = 'X'; b })
    }
    // stereo
    intercept[IllegalArgumentException] {
      WavCodec.decode(mutate { b =>
        System.arraycopy(le16(2), 0, b, 22, 2); b
      })
    }
    // non-PCM format code
    intercept[IllegalArgumentException] {
      WavCodec.decode(mutate { b =>
        System.arraycopy(le16(3), 0, b, 20, 2); b
      })
    }
    // 8-bit
    intercept[IllegalArgumentException] {
      WavCodec.decode(mutate { b =>
        System.arraycopy(le16(8), 0, b, 34, 2); b
      })
    }
    // truncated data chunk (declared size exceeds remaining bytes)
    intercept[IllegalArgumentException] {
      WavCodec.decode(ok.slice(0, ok.length - 2))
    }
    // no data chunk at all
    intercept[IllegalArgumentException] {
      WavCodec.decode(ok.slice(0, 36))
    }
    // data before fmt
    val noFmt = ok.slice(0, 12) ++ ok.slice(36, ok.length)
    intercept[IllegalArgumentException] { WavCodec.decode(noFmt) }
    // zero sample rate: must fail with the documented diagnostic at
    // decode, not as a later divide-by-zero in the ms arithmetic
    val e = intercept[IllegalArgumentException] {
      WavCodec.decode(mutate { b =>
        java.util.Arrays.fill(b, 24, 28, 0.toByte); b
      })
    }
    assert(e.getMessage.contains("bad sample rate"))
  }

  test("features: peak, RMS, zero crossings, floor duration") {
    val audio = Multimodal.WavAudio(8000, 1, 16,
      Array[Short](100, -200, 300, 0, -1))
    val f = WavCodec.features(7L, audio)
    assert(f.media_id === 7L)
    assert(f.n_samples === 5)
    assert(f.duration_ms === 0L) // 5*1000/8000 floors to 0
    assert(f.peak === 300)
    // crossings: 100→-200, -200→300, 0→-1 (0 is non-negative)
    assert(f.zero_crossings === 3)
    val expectedRms = math.floor(math.sqrt(
      (100L * 100 + 200L * 200 + 300L * 300 + 0 + 1).toDouble / 5) * 1e6
      + 0.5) / 1e6
    assert(f.rms === expectedRms)
    assert(WavCodec.features(1L,
      Multimodal.WavAudio(8000, 1, 16, Array.emptyShortArray)) ===
      Multimodal.WavFeatures(1L, 8000, 0, 0L, 0, 0.0, 0))
  }

  test("byte-delta synth: n-1 oscillating samples, empty below 2 bytes") {
    assert(WavCodec.pcm16FromByteDeltas(Array[Byte](10, 20, 5))
      .toSeq === Seq[Short]((10 << 8).toShort, (-15 << 8).toShort))
    assert(WavCodec.pcm16FromByteDeltas(Array[Byte](1)).isEmpty)
    assert(WavCodec.pcm16FromByteDeltas(Array.emptyByteArray).isEmpty)
  }

  test("batched decode seam: e2e over a typed Dataset") {
    val media = Seq(
      Media(1L, "audio",
        WavCodec.encode(WavCodec.pcm16FromByteDeltas(
          "abcba".getBytes("US-ASCII"))), 0, 0, 0),
      Media(2L, "audio", WavCodec.encode(Array[Short](1000, -1000)), 0, 0, 0))
      .toDS()
    val got = Multimodal.mapDecodeWavBatches(media, batchSize = 1)
      .collect().sortBy(_.media_id)
    assert(got(0).n_samples === 4)
    assert(got(0).peak === 256)
    assert(got(0).zero_crossings === 1) // +,+,-,- one sign flip
    assert(got(1).zero_crossings === 1)
    assert(got(1).peak === 1000)
  }

  test("vadSegments: loud runs merge, quiet gaps split, tail frame drops") {
    // frameLen=2 @ rate 1000: frames of |s|=4000 (rms 4000) are
    // active at threshold 3000; |s|=100 frames are not. Layout:
    // [loud loud] [quiet] [loud] + one dangling sample (dropped).
    val s = Array[Short](4000, -4000, 4000, 4000, 100, -100, 4000, 4000, 9)
    val audio = Multimodal.WavAudio(1000, 1, 16, s)
    val segs = WavCodec.vadSegments(7L, audio, frameLen = 2,
      threshold = 3000.0)
    assert(segs.length === 2)
    val a = segs(0)
    assert((a.seg, a.start_frame, a.n_frames) === ((1, 0, 2)))
    assert((a.start_ms, a.end_ms) === ((0L, 4L)))
    assert(a.max_rms === 4000.0)
    val b = segs(1)
    assert((b.seg, b.start_frame, b.n_frames) === ((2, 3, 1)))
    assert((b.start_ms, b.end_ms) === ((6L, 8L)))
    // all-quiet clip yields nothing
    assert(WavCodec.vadSegments(8L,
      Multimodal.WavAudio(1000, 1, 16, Array[Short](1, -1, 2, -2)),
      frameLen = 2, threshold = 3000.0).isEmpty)
    // boundary: rms EXACTLY at threshold is active
    assert(WavCodec.vadSegments(9L,
      Multimodal.WavAudio(1000, 1, 16, Array[Short](3000, -3000)),
      frameLen = 2, threshold = 3000.0).length === 1)
  }

  test("mapVadBatches: per-clip segments through the batched seam") {
    val clip = WavCodec.encode(
      Array[Short](4000, -4000, 10, -10, 4000, 4000), sampleRate = 8000)
    val media = Seq(Media(1L, "audio", clip, 0, 0, 0),
      Media(2L, "audio", WavCodec.encode(Array[Short](1, -1)), 0, 0, 0))
      .toDS()
    val got = Multimodal.mapVadBatches(media, frameLen = 2,
        threshold = 3000.0, batchSize = 1)
      .collect().sortBy(r => (r.media_id, r.seg))
    assert(got.map(_.media_id).toSeq === Seq(1L, 1L)) // clip 2 silent
    assert(got.map(_.start_frame).toSeq === Seq(0, 2))
    assert(got.map(_.n_frames).toSeq === Seq(1, 1))
    assert(got.map(_.seg).toSeq === Seq(1, 2))
  }
}
