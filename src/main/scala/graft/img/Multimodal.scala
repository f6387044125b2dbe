package graft.img

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal columns beyond images (driver prompt): audio/video ride as
  * opaque `binary` columns with typed metadata; the Spark-side plumbing —
  * schema, batch-shaped partition processing, deterministic synthesis — is
  * real and tested, while the actual media CODECS are STUBBED with
  * deterministic fakes (this container ships no audio/video libraries; the
  * image path in graft.img.Codecs is fully real).
  *
  * Batch shape mirrors `mapInPandas`: one partition-level iterator of rows
  * in, one iterator of feature rows out (`mapPartitions` is the Scala
  * equivalent; a vectorized Arrow batch would slot in the same place).
  */
object Multimodal {

  final case class AudioRow(audio_id: String, bytes: Array[Byte], sample_rate: Int,
      n_samples: Int, fmt: String, caption: String)

  final case class AudioFeatures(audio_id: String, rms: Double, zero_crossings: Int,
      duration_s: Double, caption: String)

  final case class VideoRow(video_id: String, bytes: Array[Byte], w: Int, h: Int,
      fps: Int, n_frames: Int, fmt: String)

  final case class FrameRow(video_id: String, frame_idx: Int, w: Int, h: Int,
      frame_png: Array[Byte])

  /** STUB "PCM decode": deterministic synth — byte i of the payload is the
    * sample stream. A real decoder (libsndfile/ffmpeg) replaces ONLY the
    * body of this function; schema and pipeline stay.
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

  def synthAudio(spark: SparkSession, n: Long, partitions: Int = 8): Dataset[AudioRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val len = 256 + (ImageTable.splitmix64(i) & 0xFF).toInt
      val bytes = Array.tabulate(len)(k => (ImageTable.splitmix64(i * 100000 + k) & 0xFF).toByte)
      AudioRow(f"aud_$i%09d", bytes, 16000, len, "pcm_stub", s"audio caption_$i")
    }
  }

  /** Feature extraction over the opaque audio column — partition-batched. */
  def audioFeatures(spark: SparkSession, audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import spark.implicits._
    audio.mapPartitions { it =>
      it.map { a =>
        val pcm = decodeAudioStub(a.bytes)
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

  /** STUB "video": payload = concatenated PNG frames (real PNG containers so
    * the frame-sampling path exercises a genuine decoder); frame sampling
    * picks every `stride`-th frame. Real ffmpeg demux replaces only the
    * splitter.
    */
  def synthVideo(spark: SparkSession, n: Long, frames: Int = 8,
      partitions: Int = 4): Dataset[VideoRow] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map { i =>
      val w = 16; val h = 16
      val frameBytes = (0 until frames).map(f =>
        Codecs.encodePng(ImageTable.renderPixels(i * 1000 + f, w, h), w, h))
      val lens = frameBytes.map(_.length)
      // length-prefixed concatenation — the stub "container"
      val buf = java.nio.ByteBuffer.allocate(4 * frames + lens.sum)
      frameBytes.foreach { fb => buf.putInt(fb.length); buf.put(fb) }
      VideoRow(f"vid_$i%09d", buf.array(), w, h, 10, frames, "pngseq_stub")
    }
  }

  /** Generator-shaped frame sampling: one video row → ceil(n/stride) frames. */
  def sampleFrames(spark: SparkSession, videos: Dataset[VideoRow], stride: Int = 2): Dataset[FrameRow] = {
    import spark.implicits._
    videos.flatMap { v =>
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
