package graft.sources

import graft.Tables
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions.col

/** An MJPEG-style VIDEO container + frame sampler — the video member of
  * the multimodal family (images q145/q195/q261/q268, audio q81/q146):
  * a video is an opaque binary column holding framed JPEG payloads, and
  * the pipeline-side operator is FRAME SAMPLING — decode every k-th
  * frame, fingerprint it, and dedup at video grain — the shape a real
  * corpus pipeline runs over video shards (sample frames → embed/hash →
  * near-dup), with the decode confined to the mapPartitions codec
  * boundary like every other codec here.
  *
  * Container layout (length-prefixed, the MJPEG/AVI-stream idea without
  * the RIFF bookkeeping): magic "GMJV" | u32 frame count | per frame
  * (u32 byte length | baseline-JPEG bytes). Big-endian, no padding.
  * Truncated or foreign payloads throw at parse and the caller
  * quarantines — corrupt bytes are data, not exceptions (the q195/q261
  * contract).
  */
object VideoContainer {

  private val Magic: Array[Byte] = "GMJV".getBytes("US-ASCII")

  private[sources] def encode(frames: Seq[Array[Byte]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(Magic)
    def u32(v: Int): Unit = {
      out.write((v >> 24) & 0xFF); out.write((v >> 16) & 0xFF)
      out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
    }
    u32(frames.length)
    frames.foreach { f => u32(f.length); out.write(f, 0, f.length) }
    out.toByteArray
  }

  /** Frame payloads, or throw on bad magic / truncation / trailing
    * garbage (a container that parses must account for every byte).
    */
  private[sources] def parseFrames(b: Array[Byte]): Array[Array[Byte]] = {
    require(b.length >= 8 && (0 until 4).forall(i => b(i) == Magic(i)),
      "not a GMJV container")
    def u32(p: Int): Int =
      ((b(p) & 0xFF) << 24) | ((b(p + 1) & 0xFF) << 16) |
        ((b(p + 2) & 0xFF) << 8) | (b(p + 3) & 0xFF)
    val n = u32(4)
    require(n >= 0, "negative frame count")
    var p = 8
    val frames = Array.ofDim[Array[Byte]](n)
    var i = 0
    while (i < n) {
      require(p + 4 <= b.length, s"truncated at frame $i length")
      val len = u32(p)
      p += 4
      require(len >= 0 && p + len <= b.length, s"truncated inside frame $i")
      frames(i) = java.util.Arrays.copyOfRange(b, p, p + len)
      p += len
      i += 1
    }
    require(p == b.length, "trailing bytes after the last frame")
    frames
  }

  /** One synthetic video per document: F = 2 + id%3 frames at the q261
    * dimensions (w = 8·(2 + id%3), h = 8·(1 + id%2)); frame f's luma
    * tile is the q261 formula plus a 13·f term, so frames differ
    * deterministically within a video and every block stays DC-only
    * (bit-exact decode — the closed-form-oracle property). Documents
    * with doc_id % 41 == 0 ship CORRUPT containers — alternately
    * truncated mid-frame and magic-corrupted — and must quarantine.
    */
  def videoTable(spark: SparkSession, dir: String): Dataset[Multimodal.MediaRecord] = {
    import spark.implicits._
    Tables.documents(spark, dir).select(col("doc_id")).as[Long].map { id =>
      val w = 8 * (2 + id % 3).toInt
      val h = 8 * (1 + id % 2).toInt
      val nf = 2 + (id % 3).toInt
      val frames = (0 until nf).map { f =>
        JpegCodec.encodeJpegGray(w, h,
          (tx, ty) => ((id * 5 + 13L * f + 7L * tx + 11L * ty) % 256).toInt)
      }
      val bytes = encode(frames)
      val payload =
        if (id % 41 != 0) bytes
        else if ((id / 41) % 2 == 0)
          java.util.Arrays.copyOf(bytes, 10) // cut inside frame 0's length-prefixed body
        else {
          val c = bytes.clone()
          c(0) = 'X'.toByte // foreign magic — a container this parser must refuse
          c
        }
      Multimodal.MediaRecord(id, payload, "video/x-gmjv", payload.length.toLong)
    }
  }

  final case class VideoFrameHash(
      doc_id: Long, status: String,
      width: Option[Long], height: Option[Long], n_frames: Option[Int],
      frame_idx: Option[Int], phash: Option[Int])

  /** Parse + SAMPLE every `stride`-th frame + decode + aHash, one codec
    * init per partition: (doc, sampled frame) grain for ok videos, one
    * null-frame row per quarantined video. Any frame-level decode
    * failure quarantines the WHOLE video (a container whose sampled
    * frames don't all decode is not trustworthy at any frame).
    */
  def sampledFrameHashes(
      media: Dataset[Multimodal.MediaRecord], stride: Int): Dataset[VideoFrameHash] = {
    require(stride > 0, "stride must be positive")
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      it.flatMap { m =>
        try {
          val frames = parseFrames(m.content)
          val sampled = frames.indices.filter(_ % stride == 0)
          val rows = sampled.map { f =>
            val (w, h, gray) = JpegCodec.parseJpegGray(frames(f))
            val px = new Array[Int](gray.length)
            var i = 0
            while (i < px.length) {
              val g = gray(i)
              px(i) = (g << 16) | (g << 8) | g
              i += 1
            }
            VideoFrameHash(m.doc_id, "ok", Some(w.toLong), Some(h.toLong),
              Some(frames.length), Some(f),
              Some(Multimodal.aHashFromPixels(w, h, px)))
          }
          rows
        } catch {
          case scala.util.control.NonFatal(_) =>
            Seq(VideoFrameHash(m.doc_id, "quarantined", None, None, None, None, None))
        }
      }
    }
  }
}
