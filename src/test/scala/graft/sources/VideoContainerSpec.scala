package graft.sources

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** The GMJV container's parse/encode contract and the frame-sampling
  * semantics (q308) — asserted on hand-built payloads so a container
  * regression is caught without the corpus gate.
  */
class VideoContainerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def frame(id: Long, f: Int, w: Int = 16, h: Int = 8): Array[Byte] =
    JpegCodec.encodeJpegGray(w, h,
      (tx, ty) => ((id * 5 + 13L * f + 7L * tx + 11L * ty) % 256).toInt)

  test("encode → parse round-trips every frame byte-exactly") {
    val frames = (0 until 4).map(frame(7L, _))
    val parsed = VideoContainer.parseFrames(VideoContainer.encode(frames))
    assert(parsed.length === 4)
    frames.zip(parsed).foreach { case (a, b) => assert(a.sameElements(b)) }
  }

  test("truncation, foreign magic, and trailing bytes all refuse") {
    val bytes = VideoContainer.encode((0 until 2).map(frame(3L, _)))
    // cut inside a frame body
    intercept[IllegalArgumentException] {
      VideoContainer.parseFrames(java.util.Arrays.copyOf(bytes, bytes.length - 5))
    }
    // cut inside the first length prefix
    intercept[IllegalArgumentException] {
      VideoContainer.parseFrames(java.util.Arrays.copyOf(bytes, 10))
    }
    // foreign magic
    val bad = bytes.clone(); bad(0) = 'X'.toByte
    intercept[IllegalArgumentException] { VideoContainer.parseFrames(bad) }
    // trailing garbage after the last frame
    intercept[IllegalArgumentException] {
      VideoContainer.parseFrames(bytes :+ 0.toByte)
    }
  }

  test("stride-2 sampling decodes frames 0 and 2 only; a bad sampled frame quarantines the video") {
    import spark.implicits._
    val good = VideoContainer.encode((0 until 3).map(frame(9L, _)))
    // frame 2 (SAMPLED under stride 2) is garbage — whole video must
    // quarantine even though frames 0/1 decode
    val badF2 = VideoContainer.encode(
      Seq(frame(9L, 0), frame(9L, 1), Array[Byte](1, 2, 3)))
    val media = Seq(
      Multimodal.MediaRecord(1L, good, "video/x-gmjv", good.length.toLong),
      Multimodal.MediaRecord(2L, badF2, "video/x-gmjv", badF2.length.toLong)
    ).toDS()
    val rows = VideoContainer.sampledFrameHashes(media, stride = 2).collect()
    val ok = rows.filter(_.doc_id == 1L)
    assert(ok.map(_.frame_idx.get).sorted.toSeq === Seq(0, 2))
    assert(ok.forall(r => r.status == "ok" && r.n_frames.contains(3)))
    // aHash is mean-relative, so the constant 13·f luma shift leaves
    // the hash unchanged unless the mod-256 wrap splits a tile — both
    // frames must still carry SOME hash and the right dimensions
    assert(ok.forall(r => r.phash.isDefined &&
      r.width.contains(16L) && r.height.contains(8L)))
    val quarantined = rows.filter(_.doc_id == 2L)
    assert(quarantined.map(_.status).toSeq === Seq("quarantined"))
  }
}
