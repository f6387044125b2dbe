package graft.img

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns beyond images (driver prompt): audio/video ride as
  * opaque `binary` columns with typed metadata.
  *
  * Codec reality: the audio path decodes REAL RIFF/WAVE PCM-16 containers
  * (hand-rolled, no libraries needed — see [[Wav]]) and the video path
  * splits a length-prefixed PNG sequence through the real PNG codec in
  * graft.img.Codecs. Only COMPRESSED formats (mp3/aac, h264 — which
  * genuinely need external libraries this container doesn't ship) remain
  * behind the documented deterministic stub, selected by the row's `fmt`.
  *
  * Batch shape mirrors `mapInPandas`: one partition-level iterator of rows
  * in, one iterator of feature rows out (`mapPartitions` is the Scala
  * equivalent; a vectorized Arrow batch would slot in the same place).
  */
object Multimodal {

  /** Minimal RIFF/WAVE PCM signed-16-bit-LE mono codec. The container is a
    * chunk walk — `RIFF<size>WAVE` then `fmt ` (PCM=1, mono, 16-bit
    * asserted loudly) and `data`; unknown chunks (LIST, fact, …) are
    * skipped by their declared size, padded to 16-bit alignment per spec.
    */
  object Wav {
    def encode(samples: Array[Short], sampleRate: Int): Array[Byte] = {
      val dataLen = samples.length * 2
      val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
        .put("WAVE".getBytes("US-ASCII"))
      buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1) // PCM
        .putShort(1) // mono
        .putInt(sampleRate)
        .putInt(sampleRate * 2) // byte rate
        .putShort(2)            // block align
        .putShort(16)           // bits/sample
      buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
      samples.foreach(buf.putShort)
      buf.array()
    }

    /** @return (samples, sampleRate); fails loudly on non-PCM16-mono. */
    def decode(bytes: Array[Byte]): (Array[Short], Int) = {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(bytes.length >= 44, s"WAV too short (${bytes.length} bytes)")
      require(fourcc() == "RIFF", "not a RIFF container")
      buf.getInt // riff size (trusted only for the data chunk below)
      require(fourcc() == "WAVE", "RIFF is not WAVE")
      var sampleRate = -1
      var samples: Array[Short] = null
      while (buf.remaining() >= 8 && samples == null) {
        val id = fourcc()
        val size = buf.getInt
        require(size >= 0 && size <= buf.remaining(),
          s"corrupt WAV chunk '$id' size $size with ${buf.remaining()} bytes left")
        id match {
          case "fmt " =>
            val fmtEnd = buf.position() + size
            val audioFormat = buf.getShort
            val channels = buf.getShort
            sampleRate = buf.getInt
            buf.getInt; buf.getShort // byte rate, block align
            val bits = buf.getShort
            require(audioFormat == 1 && channels == 1 && bits == 16,
              s"only PCM16 mono is implemented (got fmt=$audioFormat ch=$channels bits=$bits)")
            buf.position(fmtEnd + (size & 1))
          case "data" =>
            require(sampleRate > 0, "WAV data chunk before fmt chunk")
            samples = new Array[Short](size / 2)
            var i = 0
            while (i < samples.length) { samples(i) = buf.getShort; i += 1 }
          case _ => // LIST/fact/cue…: skip by declared size (+pad byte)
            buf.position(buf.position() + size + (size & 1))
        }
      }
      require(samples != null, "WAV has no data chunk")
      (samples, sampleRate)
    }
  }

  final case class AudioRow(audio_id: String, bytes: Array[Byte], sample_rate: Int,
      n_samples: Int, fmt: String, caption: String)

  final case class AudioFeatures(audio_id: String, rms: Double, zero_crossings: Int,
      duration_s: Double, caption: String)

  final case class VideoRow(video_id: String, bytes: Array[Byte], w: Int, h: Int,
      fps: Int, n_frames: Int, fmt: String)

  final case class FrameRow(video_id: String, frame_idx: Int, w: Int, h: Int,
      frame_png: Array[Byte])

  /** STUB decode for COMPRESSED audio (fmt != "wav"): deterministic synth —
    * byte i of the payload is the sample stream. A real mp3/aac decoder
    * (libsndfile/ffmpeg, absent from this container) replaces ONLY the body
    * of this function; schema and pipeline stay.
    */
  private[img] def decodeAudioStub(bytes: Array[Byte]): Array[Short] = {
    val out = new Array[Short](bytes.length)
    var i = 0
    while (i < bytes.length) {
      out(i) = ((bytes(i) & 0xFF) * 257 - 32768).toShort // spread to 16-bit range
      i += 1
    }
    out
  }

  /** Deterministic synthetic corpus of REAL .wav files (playable anywhere):
    * splitmix-derived 16-bit samples in a RIFF/WAVE container.
    */
  def synthAudio(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val len = 256 + (ImageTable.splitmix64(i) & 0xFF).toInt
      val samples = Array.tabulate(len)(k =>
        ((ImageTable.splitmix64(i * 100000 + k) & 0xFFFF) - 32768).toShort)
      AudioRow(f"aud_$i%09d", Wav.encode(samples, 16000), 16000, len, "wav",
        s"audio caption_$i")
    }
  }

  /** Feature extraction over the opaque audio column — partition-batched.
    * fmt="wav" rows go through the real RIFF/WAVE decoder; other formats
    * hit the documented stub.
    */
  def audioFeatures(spark: SparkSession, audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions { it =>
      it.map { a =>
        val pcm = if (a.fmt == "wav") Wav.decode(a.bytes)._1 else decodeAudioStub(a.bytes)
        var sumSq = 0.0
        var zc = 0
        var i = 0
        while (i < pcm.length) {
          sumSq += pcm(i).toDouble * pcm(i)
          if (i > 0 && ((pcm(i) >= 0) != (pcm(i - 1) >= 0))) zc += 1
          i += 1
        }
        AudioFeatures(a.audio_id, math.sqrt(sumSq / math.max(1, pcm.length)), zc,
          a.n_samples.toDouble / a.sample_rate, a.caption)
      }
    }
  }

  /** Minimal RIFF AVI container with uncompressed 'DIB ' frames — a REAL,
    * player-openable video format needing zero external libraries. A DIB
    * frame is exactly a BMP without its 14-byte file header, so both
    * directions reuse the tested BMP row codec in graft.img.Codecs. The
    * writer emits hdrl (avih + strl/strh/strf), movi, and a keyframe idx1
    * (players want the index; our demux scans movi directly).
    */
  object Avi {
    def encode(frames: Seq[Array[Int]], w: Int, h: Int, fps: Int): Array[Byte] = {
      val dibs = frames.map { px =>
        val bmp = Codecs.encodeBmp(px, w, h)
        java.util.Arrays.copyOfRange(bmp, 14, bmp.length)
      }
      val frameSize = dibs.headOption.map(_.length).getOrElse(0)
      val bb = new java.io.ByteArrayOutputStream()
      val le = java.nio.ByteOrder.LITTLE_ENDIAN
      def u32(v: Int): Unit = {
        val b = java.nio.ByteBuffer.allocate(4).order(le).putInt(v); bb.write(b.array())
      }
      def u16(v: Int): Unit = {
        val b = java.nio.ByteBuffer.allocate(2).order(le).putShort(v.toShort); bb.write(b.array())
      }
      def cc(s: String): Unit = bb.write(s.getBytes("US-ASCII"))

      // strl LIST: strh(56) + strf(40) + chunk headers = 4 + 8+56 + 8+40
      val strlSize = 4 + 8 + 56 + 8 + 40
      // hdrl LIST: avih(56) + strl list = 4 + 8+56 + 8+strlSize
      val hdrlSize = 4 + 8 + 56 + 8 + strlSize
      val moviSize = 4 + dibs.map(d => 8 + d.length + (d.length & 1)).sum
      val idx1Size = 16 * dibs.length
      val riffSize = 4 + (8 + hdrlSize) + (8 + moviSize) + (8 + idx1Size)

      cc("RIFF"); u32(riffSize); cc("AVI ")
      cc("LIST"); u32(hdrlSize); cc("hdrl")
      cc("avih"); u32(56)
      u32(1000000 / math.max(fps, 1)); u32(0); u32(0); u32(0x10 /*AVIF_HASINDEX*/)
      u32(dibs.length); u32(0); u32(1); u32(frameSize)
      u32(w); u32(h); u32(0); u32(0); u32(0); u32(0)
      cc("LIST"); u32(strlSize); cc("strl")
      cc("strh"); u32(56)
      cc("vids"); cc("DIB "); u32(0); u16(0); u16(0); u32(0)
      u32(1); u32(fps); u32(0); u32(dibs.length); u32(frameSize); u32(-1); u32(0)
      u16(0); u16(0); u16(w); u16(h)
      cc("strf"); u32(40)
      u32(40); u32(w); u32(h); u16(1); u16(24); u32(0); u32(((3 * w + 3) & ~3) * h)
      u32(0); u32(0); u32(0); u32(0)
      cc("LIST"); u32(moviSize); cc("movi")
      val offsets = scala.collection.mutable.ArrayBuffer.empty[Int]
      var off = 4 // offsets measured from the 'movi' fourcc
      dibs.foreach { d =>
        offsets += off
        cc("00db"); u32(d.length); bb.write(d)
        if ((d.length & 1) == 1) bb.write(0)
        off += 8 + d.length + (d.length & 1)
      }
      cc("idx1"); u32(idx1Size)
      dibs.indices.foreach { i =>
        cc("00db"); u32(0x10 /*AVIIF_KEYFRAME*/); u32(offsets(i)); u32(dibs(i).length)
      }
      bb.toByteArray
    }

    /** @return (frames as pixel arrays, w, h, fps); fails loudly on
      *         anything but the 24-bit uncompressed-DIB layout above.
      */
    def decode(bytes: Array[Byte]): (Seq[Array[Int]], Int, Int, Int) = {
      val buf = java.nio.ByteBuffer.wrap(bytes).order(java.nio.ByteOrder.LITTLE_ENDIAN)
      def fourcc(): String = {
        val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
      }
      require(fourcc() == "RIFF", "not a RIFF container")
      buf.getInt
      require(fourcc() == "AVI ", "RIFF is not AVI")
      var w = -1; var h = -1; var fps = -1
      val frames = scala.collection.mutable.ArrayBuffer.empty[Array[Int]]
      def dibToPixels(dib: Array[Byte]): Array[Int] = {
        // re-wrap as a BMP: 14-byte file header pointing past both headers
        val bmp = new Array[Byte](14 + dib.length)
        bmp(0) = 'B'; bmp(1) = 'M'
        val bl = java.nio.ByteBuffer.wrap(bmp).order(java.nio.ByteOrder.LITTLE_ENDIAN)
        bl.putInt(2, bmp.length); bl.putInt(10, 54)
        System.arraycopy(dib, 0, bmp, 14, dib.length)
        Codecs.decodeBmp(bmp)._1
      }
      def walkList(end: Int): Unit = {
        while (buf.position() + 8 <= end) {
          val id = fourcc()
          val size = buf.getInt
          require(size >= 0 && buf.position() + size <= end,
            s"corrupt AVI chunk '$id' size $size")
          val next = buf.position() + size + (size & 1)
          id match {
            case "LIST" =>
              val kind = fourcc()
              if (kind == "hdrl" || kind == "strl" || kind == "movi") walkList(next)
              else buf.position(next)
            case "avih" =>
              val usPerFrame = buf.getInt
              fps = if (usPerFrame > 0) 1000000 / usPerFrame else 0
              buf.position(next)
            case "strf" =>
              buf.getInt // biSize
              w = buf.getInt; h = buf.getInt
              buf.getShort
              val bpp = buf.getShort
              require(bpp == 24, s"only 24-bit DIB frames implemented (got $bpp)")
              buf.position(next)
            case "00db" | "00dc" =>
              val d = new Array[Byte](size)
              buf.get(d)
              frames += dibToPixels(d)
              buf.position(next)
            case _ => buf.position(next)
          }
        }
      }
      walkList(bytes.length)
      require(w > 0 && h > 0, "AVI has no strf header")
      (frames.toSeq, w, h, fps)
    }
  }

  /** Deterministic synthetic corpus of REAL .avi files (uncompressed DIB
    * frames — openable by any player): one row per video.
    */
  def synthVideo(spark: SparkSession, n: Long, frames: Int = 8,
      partitions: Int = 4): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val w = 16; val h = 16
      val px = (0 until frames).map(f => ImageTable.renderPixels(i * 1000 + f, w, h))
      VideoRow(f"vid_$i%09d", Avi.encode(px, w, h, 10), w, h, 10, frames, "avi")
    }
  }

  /** STUB container for COMPRESSED video: length-prefixed PNG frames. A
    * real h264 demux (absent from this container) replaces only the
    * splitter; kept to exercise the fmt-dispatch path.
    */
  def synthVideoPngSeq(spark: SparkSession, n: Long, frames: Int = 8,
      partitions: Int = 4): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val w = 16; val h = 16
      val frameBytes = (0 until frames).map(f =>
        Codecs.encodePng(ImageTable.renderPixels(i * 1000 + f, w, h), w, h))
      val lens = frameBytes.map(_.length)
      val buf = java.nio.ByteBuffer.allocate(4 * frames + lens.sum)
      frameBytes.foreach { fb => buf.putInt(fb.length); buf.put(fb) }
      VideoRow(f"vid_$i%09d", buf.array(), w, h, 10, frames, "pngseq_stub")
    }
  }

  /** Generator-shaped frame sampling: one video row → ceil(n/stride)
    * frames, each re-encoded as PNG. fmt="avi" rows demux the real AVI
    * container; "pngseq_stub" splits the stub container.
    */
  def sampleFrames(spark: SparkSession, videos: Dataset[VideoRow], stride: Int = 2): Dataset[FrameRow] = {
    import spark.implicits._
    videos.flatMap { v =>
      if (v.fmt == "avi") {
        val (frames, w, h, _) = Avi.decode(v.bytes)
        frames.zipWithIndex.collect { case (px, f) if f % stride == 0 =>
          FrameRow(v.video_id, f, w, h, Codecs.encodePng(px, w, h))
        }
      } else {
        val buf = java.nio.ByteBuffer.wrap(v.bytes)
        (0 until v.n_frames).flatMap { f =>
          val len = buf.getInt()
          val fb = new Array[Byte](len)
          buf.get(fb)
          if (f % stride == 0) Some(FrameRow(v.video_id, f, v.w, v.h, fb)) else None
        }
      }
    }
  }
}
