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
      val vid = f.video_id.stripPrefix("vid_").toLong
      assert(px.sameElements(graft.img.ImageTable.renderPixels(vid * 1000 + f.frame_idx, 16, 16)))
    }
  }
}
