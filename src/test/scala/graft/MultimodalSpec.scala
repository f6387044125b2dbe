package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.img.Multimodal

class MultimodalSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark

  test("audio features: deterministic, caption survives, rms/zc sane") {
    val feats = Multimodal.audioFeatures(spark, Multimodal.synthAudio(spark, 50)).collect()
    assert(feats.length == 50)
    feats.foreach { f =>
      val i = f.audio_id.stripPrefix("aud_").toLong
      assert(f.caption == s"audio caption_$i")
      assert(f.rms > 0 && f.zero_crossings > 0 && f.duration_s > 0)
    }
    val again = Multimodal.audioFeatures(spark, Multimodal.synthAudio(spark, 50)).collect()
    assert(feats.map(_.rms).toSeq == again.map(_.rms).toSeq)
  }

  test("frame sampling: every stride-th frame, each a real decodable PNG") {
    val frames = Multimodal.sampleFrames(spark, Multimodal.synthVideo(spark, 10, frames = 8), 2)
      .collect()
    assert(frames.length == 10 * 4)
    frames.foreach { f =>
      assert(f.frame_idx % 2 == 0)
      val (px, w, h) = graft.img.Codecs.decodePng(f.frame_png)
      assert(w == 16 && h == 16)
      // frame pixels are the deterministic render for (video*1000 + frame)
      // — surviving the real AVI DIB round trip bit-exactly
      val vid = f.video_id.stripPrefix("vid_").toLong
      assert(px.sameElements(graft.img.ImageTable.renderPixels(vid * 1000 + f.frame_idx, 16, 16)))
    }
  }

  test("WAV codec: PCM16 round-trips exactly; unknown chunks skipped; corrupt rejected") {
    val samples = Array.tabulate(777)(i => ((i * 2654435761L) & 0xFFFF).toInt.toShort)
    val wav = Multimodal.Wav.encode(samples, 16000)
    // standard header bytes: RIFF/WAVE magic, 44 + 2n total
    assert(wav.length == 44 + samples.length * 2)
    assert(new String(wav.take(4), "US-ASCII") == "RIFF")
    assert(new String(wav.slice(8, 12), "US-ASCII") == "WAVE")
    val (back, rate) = Multimodal.Wav.decode(wav)
    assert(rate == 16000 && back.sameElements(samples))

    // a LIST chunk between fmt and data must be skipped, not crash
    val withList = {
      val list = "LIST".getBytes("US-ASCII") ++ Array[Byte](4, 0, 0, 0) ++ "INFO".getBytes("US-ASCII")
      val out = new java.io.ByteArrayOutputStream()
      out.write(wav, 0, 36)           // through end of fmt chunk
      out.write(list)
      out.write(wav, 36, wav.length - 36) // data chunk
      val b = out.toByteArray
      // fix RIFF size
      val bb = java.nio.ByteBuffer.wrap(b).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.putInt(4, b.length - 8)
      b
    }
    val (back2, _) = Multimodal.Wav.decode(withList)
    assert(back2.sameElements(samples))

    intercept[IllegalArgumentException](Multimodal.Wav.decode("nonsense".getBytes))
    // stereo/8-bit rejected loudly, not mis-decoded
    val stereo = wav.clone()
    java.nio.ByteBuffer.wrap(stereo).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      .putShort(22, 2.toShort)
    intercept[IllegalArgumentException](Multimodal.Wav.decode(stereo))
  }

  test("AVI codec: DIB frames round-trip exactly with header metadata intact") {
    val frames = (0 until 5).map(f => graft.img.ImageTable.renderPixels(f * 7 + 1, 20, 12))
    val avi = Multimodal.Avi.encode(frames, 20, 12, 10)
    assert(new String(avi.take(4), "US-ASCII") == "RIFF")
    assert(new String(avi.slice(8, 12), "US-ASCII") == "AVI ")
    // idx1 present (players need the index)
    assert(new String(avi, "ISO-8859-1").contains("idx1"))
    val (back, w, h, fps) = Multimodal.Avi.decode(avi)
    assert(w == 20 && h == 12 && fps == 10 && back.length == 5)
    back.zip(frames).foreach { case (b, f) => assert(b.sameElements(f)) }
    intercept[IllegalArgumentException](Multimodal.Avi.decode("RIFFxxxxJUNK".getBytes))
  }

  test("compressed-format stub path still dispatches by fmt (pngseq)") {
    val frames = Multimodal.sampleFrames(spark,
      Multimodal.synthVideoPngSeq(spark, 4, frames = 6), 3).collect()
    assert(frames.length == 4 * 2)
    frames.foreach(f => assert(graft.img.Codecs.decodePng(f.frame_png)._2 == 16))
  }

  test("IMA-ADPCM kernel matches CPython audioop byte-for-byte (golden vector)") {
    // golden produced by: audioop.lin2adpcm / adpcm2lin, state (0,0) —
    // audioop packs HIGH nibble first, so its bytes [7,119,119,119,191,
    // 203,35,66] unpack to this nibble sequence
    val samples = Array[Int](0, 500, 1500, 3000, 5000, 7000, 6000, 4000,
      1000, -2000, -5000, -8000, -6000, -3000, 0, 2000)
    val goldenNibbles = Array(0x0, 0x7, 0x7, 0x7, 0x7, 0x7, 0x7, 0x7,
      0xB, 0xF, 0xC, 0xB, 0x2, 0x3, 0x4, 0x2)
    val goldenDecoded = Array[Int](0, 11, 41, 104, 240, 533, 1164, 2521,
      1163, -1481, -4883, -8085, -6007, -3361, -269, 1809)
    val enc = new Multimodal.Adpcm.State()
    val nibbles = samples.map(s => Multimodal.Adpcm.encodeSample(enc, s))
    assert(nibbles.sameElements(goldenNibbles), nibbles.mkString(","))
    val dec = new Multimodal.Adpcm.State()
    val decoded = goldenNibbles.map(n => Multimodal.Adpcm.decodeSample(dec, n))
    assert(decoded.sameElements(goldenDecoded), decoded.mkString(","))
  }

  test("IMA-ADPCM WAV round-trips smooth audio at a meaningful SNR with 4:1 compression") {
    val n = 2000
    val samples = Array.tabulate(n) { k =>
      val t = k / 16000.0
      ((math.sin(2 * math.Pi * 440 * t) * 12000 +
        math.sin(2 * math.Pi * 997 * t) * 8000)).toInt.toShort
    }
    val wav = Multimodal.Adpcm.encodeWav(samples, 16000)
    // 4-bit samples + block headers: well under half the PCM-16 size
    assert(wav.length < samples.length, s"no compression: ${wav.length} bytes")
    val (back, rate) = Multimodal.Adpcm.decodeWav(wav)
    assert(rate == 16000 && back.length == n) // fact chunk trims padding exactly
    var sig = 0.0; var err = 0.0
    for (i <- 0 until n) {
      sig += samples(i).toDouble * samples(i)
      val d = samples(i) - back(i)
      err += d.toDouble * d
    }
    val snr = 10 * math.log10(sig / err)
    assert(snr >= 20.0, s"SNR $snr dB") // ADPCM on smooth audio: typically ~25-35 dB
    // the audioFeatures pipeline dispatches fmt="wav_adpcm" to this decoder
    val feats = Multimodal.audioFeatures(spark, Multimodal.synthAudioAdpcm(spark, 20)).collect()
    assert(feats.length == 20)
    feats.foreach(f => assert(f.rms > 0 && f.zero_crossings > 0))
  }

  test("Motion-JPEG AVI: compressed frames round-trip above the 40dB lossy invariant") {
    val w = 24; val h = 16
    val frames = (0 until 5).map(f => graft.img.ImageTable.renderPixels(900 + f, w, h))
    val avi = Multimodal.Avi.encode(frames, w, h, 10, codec = "mjpg")
    // genuinely compressed: a DIB AVI of the same frames is larger
    assert(avi.length < Multimodal.Avi.encode(frames, w, h, 10).length)
    val (back, bw, bh, fps) = Multimodal.Avi.decode(avi)
    assert(bw == w && bh == h && fps == 10 && back.length == 5)
    back.zip(frames).zipWithIndex.foreach { case ((got, want), i) =>
      val p = graft.img.ImageTable.psnrDb(got.toArray, want)
      assert(p >= 40.0, s"frame $i psnr $p")
    }
    // end-to-end through the Spark frame-sampling pipeline
    val sampled = Multimodal.sampleFrames(spark,
      Multimodal.synthVideo(spark, 6, frames = 8, codec = "mjpg"), 2).collect()
    assert(sampled.length == 6 * 4)
    sampled.foreach { f =>
      val (px, fw, fh) = graft.img.Codecs.decodePng(f.frame_png)
      val vid = f.video_id.stripPrefix("vid_").toLong
      val want = graft.img.ImageTable.renderPixels(vid * 1000 + f.frame_idx, 16, 16)
      assert(fw == 16 && fh == 16)
      assert(graft.img.ImageTable.psnrDb(px, want) >= 40.0, s"${f.video_id}#${f.frame_idx}")
    }
  }

  test("shotCuts through the real AVI codec equals the bit-planted cut list") {
    import graft.img.{ImageTable, Multimodal}
    val got = Multimodal.shotCuts(spark, Multimodal.synthVideoShots(spark, 25), 0L)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val want = (for {
      i <- 0L until 25L
      f <- 1 until 12
      if ((ImageTable.splitmix64(i * 7 + 5) >>> (f - 1)) & 1L) == 1L
    } yield (f"vid_$i%09d", f.toLong)).toSet
    assert(got === want)
  }

  test("framePeaks through the real WAV codec: planted gap silent, full wave frames loud") {
    import graft.img.{ImageTable, Multimodal}
    val peaks = Multimodal.framePeaks(spark, Multimodal.synthAudioGapped(spark, 30), 64)
      .collect()
      .groupBy(_.getString(0))
      .map { case (id, rs) => id -> rs.map(r => r.getLong(1) -> r.getLong(2)).toMap }
    for (i <- 0L until 30L) {
      val g = 1 + (ImageTable.splitmix64(i * 5 + 3) & 3L)
      val glen = 1 + (ImageTable.splitmix64(i * 5 + 4) & 1L)
      val len = 512 + (ImageTable.splitmix64(i) & 0xFF)
      val p = peaks(f"aud_$i%09d")
      assert(p.keySet === (0L until (len + 63) / 64).toSet, s"i=$i frame coverage")
      for (f <- g until g + glen) assert(p(f) === 0L, s"i=$i gap frame $f not silent")
      // every FULL non-gap frame carries real signal (the partial tail may
      // straddle a zero crossing and dip arbitrarily low — that is audio,
      // not a bug, and the oracle replays it)
      for (f <- 0L until len / 64 if f < g || f >= g + glen)
        assert(p(f) >= 100L, s"i=$i frame $f peak ${p(f)}")
    }
  }

  test("pitchFeatures: argmax equals brute force over the decoded FLAC stream") {
    import graft.img.{Flac, Multimodal}
    val clips = Multimodal.synthAudioFlac(spark, 8)
    val raw = clips.collect().map(a => a.audio_id -> Flac.decode(a.bytes)._1).toMap
    val got = Multimodal.pitchFeatures(spark, clips, 220, 320)
      .collect().map(r => r.getString(0) ->
        ((r.getInt(1), r.getLong(2), r.getInt(3)))).toMap
    assert(got.size == 8)
    raw.foreach { case (id, pcm) =>
      var bestLag = 220; var bestR = Long.MinValue
      for (lag <- 220 to 320) {
        var r = 0L
        for (k <- 0 until pcm.length - lag) r += pcm(k).toLong * pcm(k + lag)
        if (r > bestR) { bestR = r; bestLag = lag }
      }
      assert(got(id) == ((bestLag, bestR, pcm.length)), id)
    }
  }

  test("pitchFeatures: a pure square wave with period in range detects exactly it") {
    import graft.img.Multimodal
    // period 250, len 1000: R(L) is maximized at L = 250 (full alignment)
    val period = 250
    val pcm = Array.tabulate[Short](1000)(k =>
      if (k % period < period / 2) 8000.toShort else (-8000).toShort)
    val row = Multimodal.AudioRow("sq_0", Multimodal.Wav.encode(pcm, 16000), 16000,
      pcm.length, "wav", "square")
    import spark.implicits._
    val got = Multimodal.pitchFeatures(spark, Seq(row).toDS(), 220, 320)
      .collect().head
    assert(got.getInt(1) == period && got.getLong(2) > 0)
  }
}
