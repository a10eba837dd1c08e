package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import org.scalatest.funsuite.AnyFunSuite

/** Wire-level contract of the Kafka record-batch v2 codec: exact
  * round-trip (multi-batch, null keys/values, headers, varint edges),
  * CRC-corruption skip-and-resume, and torn-tail stop — the broker
  * log-recovery semantics q315 relies on.
  */
class KafkaLogSpec extends AnyFunSuite {

  private def rec(ts: Long, key: String, value: String,
      headers: Seq[(String, Array[Byte])] = Nil) =
    (ts,
      if (key == null) null else key.getBytes(UTF_8),
      if (value == null) null else value.getBytes(UTF_8),
      headers)

  private val sample = Seq(
    rec(1000L, "k0", "v0", Seq("h" -> "x".getBytes(UTF_8))),
    rec(999L, null, "tombstone-ish null key"), // negative tsDelta: zigzag varlong
    rec(1500L, "k2", null, Seq("nullval" -> null)), // null value + null header value
    rec(1000L + 300L, "k3", "v" * 200) // value length > 127: multi-byte varint
  )

  test("round-trip: single batch, null keys/values, headers, varint edges") {
    val bytes  = KafkaLog.writeSegment(sample, baseOffset = 7L)
    val parsed = KafkaLog.parseSegment(bytes)
    assert(parsed.batches == 1 && parsed.corruptSkipped == 0 && parsed.tornTailBytes == 0)
    assert(parsed.records.map(_.offset) == Vector(7L, 8L, 9L, 10L))
    assert(parsed.records.map(_.timestamp) == sample.map(_._1).toVector)
    assert(parsed.records(1).key == null)
    assert(parsed.records(2).value == null)
    assert(parsed.records(2).headers.head._1 == "nullval" &&
      parsed.records(2).headers.head._2 == null)
    assert(new String(parsed.records(3).value, UTF_8) == "v" * 200)
    assert(new String(parsed.records.head.headers.head._2, UTF_8) == "x")
  }

  test("round-trip: multiple batches with consecutive offsets") {
    val many   = (0 until 700).map(i => rec(i.toLong * 3, s"k$i", s"value-$i"))
    val bytes  = KafkaLog.writeSegment(many, baseOffset = 0L, maxPerBatch = 256)
    val parsed = KafkaLog.parseSegment(bytes)
    assert(parsed.batches == 3)
    assert(parsed.records.size == 700)
    assert(parsed.records.map(_.offset) == (0L until 700L).toVector)
    assert(parsed.records.zipWithIndex.forall { case (r, i) =>
      new String(r.value, UTF_8) == s"value-$i"
    })
  }

  test("CRC corruption: damaged batch is counted and skipped, parse resumes") {
    val a = (0 until 10).map(i => rec(i.toLong, s"a$i", s"av$i"))
    val b = (0 until 10).map(i => rec(i.toLong, s"b$i", s"bv$i"))
    val bytes = KafkaLog.writeSegment(a, baseOffset = 0L, maxPerBatch = 10) ++
      KafkaLog.writeSegment(b, baseOffset = 10L, maxPerBatch = 10)
    // flip one payload byte inside the FIRST batch (past its 61-byte
    // header), leaving framing intact: CRC must catch it
    val damaged = bytes.clone()
    damaged(70) = (damaged(70) ^ 0x1).toByte
    val parsed = KafkaLog.parseSegment(damaged)
    assert(parsed.corruptSkipped == 1)
    assert(parsed.batches == 1)
    // the second batch's records all survive
    assert(parsed.records.size == 10)
    assert(parsed.records.forall(r => new String(r.key, UTF_8).startsWith("b")))
    assert(parsed.tornTailBytes == 0)
  }

  test("torn tail: truncation mid-batch stops the walk, completes prior batches") {
    val a = (0 until 10).map(i => rec(i.toLong, s"a$i", s"av$i"))
    val b = (0 until 10).map(i => rec(i.toLong, s"b$i", s"bv$i"))
    val first = KafkaLog.writeSegment(a, baseOffset = 0L, maxPerBatch = 10)
    val bytes = first ++ KafkaLog.writeSegment(b, baseOffset = 10L, maxPerBatch = 10)
    // cut 17 bytes into the second batch (a crashed producer's partial write)
    val torn   = bytes.take(first.length + 17)
    val parsed = KafkaLog.parseSegment(torn)
    assert(parsed.batches == 1)
    assert(parsed.records.size == 10)
    assert(parsed.records.forall(r => new String(r.key, UTF_8).startsWith("a")))
    assert(parsed.tornTailBytes == 17)
    assert(parsed.corruptSkipped == 0)
    // tail shorter than even the 12-byte frame header: also torn, not an error
    val stub = KafkaLog.parseSegment(bytes.take(first.length + 5))
    assert(stub.records.size == 10 && stub.tornTailBytes == 5)
  }

  test("empty segment parses to nothing") {
    val parsed = KafkaLog.parseSegment(Array.emptyByteArray)
    assert(parsed == KafkaLog.Parsed(Vector.empty, 0, 0, 0))
  }
}
