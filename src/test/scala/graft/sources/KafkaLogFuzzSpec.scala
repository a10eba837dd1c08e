package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Property-level contract of the Kafka v2 codec, beyond KafkaLogSpec's
  * fixed fixtures: arbitrary payloads round-trip exactly (seeded fuzz —
  * deterministic, so a failure always reproduces), and a flip of ANY
  * byte in a batch's CRC-covered region is DETECTED — the parser never
  * silently returns corrupted records. (Bytes before the crc field —
  * baseOffset/length/epoch/magic — are outside Kafka's CRC by design;
  * the torn-tail framing rule covers length damage, which KafkaLogSpec
  * exercises.)
  */
class KafkaLogFuzzSpec extends AnyFunSuite {

  private def randBytes(rnd: scala.util.Random): Array[Byte] = {
    val a = new Array[Byte](rnd.nextInt(65))
    rnd.nextBytes(a)
    a
  }

  test("100 seeded-random record sets round-trip exactly") {
    val rnd = new scala.util.Random(0xC0FFEE)
    for (_ <- 0 until 100) {
      val n        = 1 + rnd.nextInt(40)
      val perBatch = 1 + rnd.nextInt(7)
      val baseOff  = rnd.nextInt(1000).toLong
      val recs = (0 until n).map { _ =>
        val ts    = rnd.nextLong() % 1000000L // negative deltas: zigzag varlong
        val key   = if (rnd.nextBoolean()) randBytes(rnd) else null
        val value = if (rnd.nextBoolean()) randBytes(rnd) else null
        val headers = (0 until rnd.nextInt(4)).map { h =>
          (s"h$h", if (rnd.nextBoolean()) randBytes(rnd) else null)
        }
        (ts, key, value, headers)
      }
      val bytes  = KafkaLog.writeSegment(recs, baseOffset = baseOff, maxPerBatch = perBatch)
      val parsed = KafkaLog.parseSegment(bytes)
      assert(parsed.corruptSkipped == 0 && parsed.tornTailBytes == 0)
      assert(parsed.records.size == n)
      parsed.records.zipWithIndex.foreach { case (r, i) =>
        val (ts, key, value, headers) = recs(i)
        // offsets are consecutive from each batch's base
        // (batch k bases at baseOff + k·perBatch, the writer's contract)
        assert(r.offset == baseOff + (i / perBatch).toLong * perBatch + i % perBatch)
        assert(r.timestamp == ts)
        assert((r.key == null) == (key == null))
        if (key != null) assert(r.key.sameElements(key))
        assert((r.value == null) == (value == null))
        if (value != null) assert(r.value.sameElements(value))
        assert(r.headers.map(_._1) == headers.map(_._1))
        r.headers.zip(headers).foreach { case ((_, hv), (_, ev)) =>
          assert((hv == null) == (ev == null))
          if (ev != null) assert(hv.sameElements(ev))
        }
      }
    }
  }

  test("flipping any CRC-covered byte is detected: no silent record corruption") {
    val recs = (0 until 20).map(i =>
      (i.toLong * 7, s"key-$i".getBytes(UTF_8), s"value-$i".getBytes(UTF_8),
        Seq("h" -> s"hv$i".getBytes(UTF_8))))
    val bytes = KafkaLog.writeSegment(recs, baseOffset = 0L, maxPerBatch = 10)
    val clean = KafkaLog.parseSegment(bytes)
    assert(clean.records.size == 20 && clean.batches == 2)
    // batch 0's CRC-covered region: after its 61-byte header (crc field
    // ends at offset 21), up to its end
    val b0len = 12 + java.nio.ByteBuffer.wrap(bytes, 8, 4).getInt
    for (pos <- 21 until b0len; bit <- Seq(0x01, 0x80)) {
      val dmg = bytes.clone()
      dmg(pos) = (dmg(pos) ^ bit).toByte
      val parsed = KafkaLog.parseSegment(dmg)
      // the damaged batch is skipped whole; batch 1 always survives intact
      assert(parsed.corruptSkipped == 1,
        s"flip at $pos/$bit not caught: batches=${parsed.batches} corrupt=${parsed.corruptSkipped}")
      assert(parsed.records.size == 10 && parsed.records.forall(_.offset >= 10),
        s"flip at $pos/$bit leaked records from the corrupt batch")
    }
  }

  test("compressed-flagged batch with an INTACT CRC cannot leak records") {
    val recs = (0 until 20).map(i =>
      (i.toLong * 7, s"key-$i".getBytes(UTF_8), s"value-$i".getBytes(UTF_8), Seq.empty))
    val bytes = KafkaLog.writeSegment(recs, baseOffset = 0L, maxPerBatch = 10)
    val b0len = 12 + java.nio.ByteBuffer.wrap(bytes, 8, 4).getInt
    // flag every codec id (1 gzip, 2 snappy, 3 lz4, 4 zstd, and the
    // reserved 5-7) in batch 0's attributes (byte 22 = low byte of the
    // int16 at offset 21), then RECOMPUTE the CRC so the checksum is
    // valid — this is exactly what a real compressing producer writes
    for (codec <- 1 to 7) {
      val dmg = bytes.clone()
      dmg(22) = codec.toByte
      val crc = new java.util.zip.CRC32C
      crc.update(dmg, 21, b0len - 21)
      java.nio.ByteBuffer.wrap(dmg, 17, 4).putInt(crc.getValue.toInt)
      val parsed = KafkaLog.parseSegment(dmg)
      assert(parsed.corruptSkipped == 1 && parsed.batches == 1,
        s"codec $codec: compressed batch not quarantined")
      assert(parsed.records.size == 10 && parsed.records.forall(_.offset >= 10),
        s"codec $codec: leaked garbage records from the compressed batch")
      assert(parsed.tornTailBytes == 0)
    }
  }

  test("flipped magic byte quarantines the batch, never aborts the segment walk") {
    val recs = (0 until 20).map(i =>
      (i.toLong * 7, null, s"value-$i".getBytes(UTF_8), Seq.empty))
    val bytes = KafkaLog.writeSegment(recs, baseOffset = 0L, maxPerBatch = 10)
    // magic sits at offset 16, BEFORE the crc field — outside CRC
    // coverage, so only the quarantine rule can catch it
    for (bit <- Seq(0x01, 0x04, 0x80)) {
      val dmg = bytes.clone()
      dmg(16) = (dmg(16) ^ bit).toByte
      val parsed = KafkaLog.parseSegment(dmg) // must not throw
      assert(parsed.corruptSkipped == 1 && parsed.batches == 1,
        s"magic flip $bit: batch not quarantined")
      assert(parsed.records.size == 10 && parsed.records.forall(_.offset >= 10),
        s"magic flip $bit: leaked records from the bad-magic batch")
    }
  }
}
