package graft.sources

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8
import java.util.zip.CRC32C

/** Kafka record-batch v2 ("magic 2") wire codec — the on-disk /
  * on-the-wire log-segment format every Kafka topic since 0.11 uses
  * (public protocol: kafka.apache.org/documentation/#recordbatch).
  *
  * WHY THIS EXISTS: the reference ingests from Kafka
  * (`stream_to_bronze.py:36-50`); this build runs zero-egress, so S1's
  * runtime was the one untestable row — `format("kafka")` sits behind
  * [[graft.streaming.StreamingIngest.SourceProvider]] but nothing
  * exercised the wire format offline. This codec makes the byte format
  * itself a gated, spec-covered surface: a writer builds real v2
  * segments from row payloads and a parser walks them back — CRC32C
  * integrity, zigzag varints, header walk — in plain JVM arithmetic
  * (the JpegCodec discipline: decode confined to a pure function at a
  * `mapPartitions`/flatMap boundary, where a JNI/librdkafka decoder
  * would slot in unchanged at 100 TB).
  *
  * Batch layout (all big-endian, sizes fixed except records):
  *   baseOffset int64 | batchLength int32 | partitionLeaderEpoch int32 |
  *   magic int8 (=2) | crc uint32 (CRC32C over everything AFTER crc) |
  *   attributes int16 | lastOffsetDelta int32 | baseTimestamp int64 |
  *   maxTimestamp int64 | producerId int64 | producerEpoch int16 |
  *   baseSequence int32 | recordCount int32 | records...
  * `batchLength` counts the bytes after itself (i.e. batch total − 12).
  *
  * Record layout (lengths/deltas are PROTOBUF-ZIGZAG varints):
  *   length varint | attributes int8 | timestampDelta varlong |
  *   offsetDelta varint | keyLen varint (−1 null) | key |
  *   valueLen varint (−1 null) | value | headerCount varint |
  *   (headerKeyLen varint | headerKey | headerValLen varint | headerVal)*
  *
  * Torn/corrupt semantics mirror a broker's log recovery: a batch whose
  * declared length runs past the buffer is a TORN TAIL (counted, not
  * parsed — a crashed producer's partial write); a batch whose CRC32C
  * mismatches is COUNTED AND SKIPPED (its length header still frames
  * it, so parsing resumes at the next batch). The same quarantine rule
  * covers two classes a CRC cannot: an unsupported magic byte (magic
  * sits BEFORE the crc field, outside CRC coverage — a single flipped
  * header bit must not abort the segment walk) and a batch whose
  * attributes declare compression (bits 0-2 ≠ 0 — this decoder has no
  * codecs, and walking a gzip/snappy record block as plaintext varints
  * would yield garbage records under an INTACT CRC, the one corruption
  * class the checksum cannot see).
  */
object KafkaLog {

  final case class Record(
      offset: Long,
      timestamp: Long,
      key: Array[Byte], // null = absent (tombstone-style)
      value: Array[Byte],
      headers: Seq[(String, Array[Byte])])

  final case class Parsed(
      records: Vector[Record],
      batches: Int,
      corruptSkipped: Int,
      tornTailBytes: Int)

  // ---- zigzag varint/varlong (protobuf encoding, per the Kafka spec)

  private def zigzag(v: Long): Long  = (v << 1) ^ (v >> 63)
  private def unzigzag(v: Long): Long = (v >>> 1) ^ -(v & 1)

  private def writeVarlong(buf: java.io.ByteArrayOutputStream, value: Long): Unit = {
    var v = zigzag(value)
    while ((v & ~0x7fL) != 0L) {
      buf.write(((v & 0x7f) | 0x80).toInt)
      v >>>= 7
    }
    buf.write(v.toInt)
  }

  private def readVarlong(b: ByteBuffer): Long = {
    var v     = 0L
    var shift = 0
    var cur   = 0
    do {
      cur = b.get() & 0xff
      v |= (cur & 0x7fL) << shift
      shift += 7
    } while ((cur & 0x80) != 0)
    unzigzag(v)
  }

  private def readVarint(b: ByteBuffer): Int = readVarlong(b).toInt

  // ---- writer

  /** Serialize `records` (timestamp, key, value, headers) into one or
    * more v2 batches of at most `maxPerBatch` records, offsets
    * consecutive from `baseOffset`. Pure function of its inputs — the
    * fixture stager and the spec both lean on that determinism.
    */
  def writeSegment(
      records: Seq[(Long, Array[Byte], Array[Byte], Seq[(String, Array[Byte])])],
      baseOffset: Long = 0L,
      maxPerBatch: Int = 256): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    records.grouped(maxPerBatch).zipWithIndex.foreach { case (group, gi) =>
      val batchBase = baseOffset + gi.toLong * maxPerBatch
      val baseTs    = group.head._1
      val maxTs     = group.map(_._1).max

      val recBytes = new java.io.ByteArrayOutputStream()
      group.zipWithIndex.foreach { case ((ts, key, value, headers), i) =>
        val body = new java.io.ByteArrayOutputStream()
        body.write(0) // record attributes: unused in v2
        writeVarlong(body, ts - baseTs)
        writeVarlong(body, i.toLong)
        if (key == null) writeVarlong(body, -1L)
        else { writeVarlong(body, key.length.toLong); body.write(key) }
        if (value == null) writeVarlong(body, -1L)
        else { writeVarlong(body, value.length.toLong); body.write(value) }
        writeVarlong(body, headers.size.toLong)
        headers.foreach { case (hk, hv) =>
          val kb = hk.getBytes(UTF_8)
          writeVarlong(body, kb.length.toLong); body.write(kb)
          if (hv == null) writeVarlong(body, -1L)
          else { writeVarlong(body, hv.length.toLong); body.write(hv) }
        }
        writeVarlong(recBytes, body.size().toLong)
        body.writeTo(recBytes)
      }
      val recs = recBytes.toByteArray

      // post-crc section: attributes .. records
      val post = ByteBuffer.allocate(2 + 4 + 8 + 8 + 8 + 2 + 4 + 4 + recs.length)
        .order(ByteOrder.BIG_ENDIAN)
      post.putShort(0)                  // attributes: uncompressed, create-time
      post.putInt(group.size - 1)       // lastOffsetDelta
      post.putLong(baseTs)
      post.putLong(maxTs)
      post.putLong(-1L)                 // producerId (none)
      post.putShort(-1)                 // producerEpoch
      post.putInt(-1)                   // baseSequence
      post.putInt(group.size)
      post.put(recs)
      val postArr = post.array()

      val crc = new CRC32C
      crc.update(postArr, 0, postArr.length)

      val head = ByteBuffer.allocate(8 + 4 + 4 + 1 + 4).order(ByteOrder.BIG_ENDIAN)
      head.putLong(batchBase)
      head.putInt(4 + 1 + 4 + postArr.length) // bytes after batchLength
      head.putInt(0)                          // partitionLeaderEpoch
      head.put(2.toByte)                      // magic
      head.putInt(crc.getValue.toInt)         // CRC32C (stored as uint32)
      out.write(head.array())
      out.write(postArr)
    }
    out.toByteArray
  }

  // ---- parser

  /** Walk a segment's batches, verifying each CRC32C. Returns every
    * record of every intact batch plus the corrupt/torn accounting.
    */
  def parseSegment(bytes: Array[Byte]): Parsed = {
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val records = Vector.newBuilder[Record]
    var batches = 0
    var corrupt = 0
    var torn    = 0
    while (b.remaining() >= 12 && torn == 0) {
      val batchBase   = b.getLong
      val batchLength = b.getInt
      if (batchLength < 0 || batchLength > b.remaining()) {
        // declared frame runs past the buffer: torn tail (crashed
        // producer / truncated copy) — stop, do not guess
        torn = b.remaining() + 12
      } else {
        val batchEnd = b.position() + batchLength
        b.getInt // partitionLeaderEpoch
        val magic = b.get()
        if (magic != 2) {
          // magic is outside CRC coverage: quarantine like a CRC
          // mismatch (batchLength still frames the batch) rather than
          // aborting the whole segment walk on one flipped header bit
          corrupt += 1
          b.position(batchEnd)
        } else {
        val storedCrc = b.getInt & 0xffffffffL
        val postPos   = b.position()
        val crc = new CRC32C
        crc.update(bytes, postPos, batchEnd - postPos)
        // attributes bits 0-2 = compression codec; a compressed batch
        // (gzip/snappy/lz4/zstd) carries an INTACT CRC but an opaque
        // record block — skipping whole beats mis-parsing compressed
        // bytes as varint records
        if (crc.getValue != storedCrc || (b.getShort(postPos) & 0x07) != 0) {
          corrupt += 1
          b.position(batchEnd) // length header still frames the batch
        } else {
          b.getShort // attributes (0: uncompressed — guarded above)
          b.getInt   // lastOffsetDelta
          val baseTs = b.getLong
          b.getLong  // maxTimestamp
          b.getLong; b.getShort; b.getInt // producer id/epoch/sequence
          val n = b.getInt
          var i = 0
          while (i < n) {
            val len   = readVarint(b)
            val recEnd = b.position() + len
            b.get() // record attributes
            val tsDelta  = readVarlong(b)
            val offDelta = readVarint(b)
            val keyLen   = readVarint(b)
            val key = if (keyLen < 0) null
            else { val a = new Array[Byte](keyLen); b.get(a); a }
            val valLen = readVarint(b)
            val value = if (valLen < 0) null
            else { val a = new Array[Byte](valLen); b.get(a); a }
            val nh = readVarint(b)
            val headers = (0 until nh).map { _ =>
              val hkl = readVarint(b)
              val hk  = new Array[Byte](hkl); b.get(hk)
              val hvl = readVarint(b)
              val hv = if (hvl < 0) null
              else { val a = new Array[Byte](hvl); b.get(a); a }
              (new String(hk, UTF_8), hv)
            }
            require(b.position() == recEnd,
              s"record length mismatch at offset ${batchBase + offDelta}")
            records += Record(batchBase + offDelta, baseTs + tsDelta, key, value, headers)
            i += 1
          }
          batches += 1
          b.position(batchEnd)
        }
        }
      }
    }
    if (torn == 0 && b.remaining() > 0) torn = b.remaining()
    Parsed(records.result(), batches, corrupt, torn)
  }
}
