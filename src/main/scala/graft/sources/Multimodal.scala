package graft.sources

import graft.{QueryDef, QueryModule, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: media payloads as opaque `binary` columns
  * with typed metadata, batch-decoded per partition.
  *
  * The container has no image/audio codecs, so the decode kernel is a
  * clearly-marked deterministic STUB (byte histogram standing in for
  * "decode then featurize"); everything around it — schema, typed
  * Dataset, per-partition batching, partition-count preservation — is the
  * real Spark plumbing a production decoder drops into. At 100 TB the
  * mapPartitions boundary is where a JNI/FFI decoder amortizes its init
  * cost across a whole partition instead of per row.
  */
object Multimodal extends QueryModule {

  /** A media row: opaque bytes + metadata the pipeline can route on. */
  final case class MediaRecord(
      doc_id: Long,
      content: Array[Byte],
      mime: String,
      n_bytes: Long
  )

  /** Extracted features: fixed-width vector per media item. */
  final case class MediaFeatures(
      doc_id: Long,
      n_bytes: Long,
      energy: Double,
      histogram: Array[Double]
  )

  /** Wrap the documents table as a media table (utf-8 bytes as payload —
    * the same plumbing carries jpeg/wav/mp4 bytes unchanged).
    */
  def asMediaTable(spark: SparkSession, dir: String): Dataset[MediaRecord] = {
    import spark.implicits._
    Tables
      .documents(spark, dir)
      .select(
        col("doc_id"),
        col("text").cast("binary").as("content"),
        lit("text/plain").as("mime"),
        octet_length(col("text").cast("binary")).cast("long").as("n_bytes")
      )
      .as[MediaRecord]
  }

  /** Batch "decode": per-partition iteration so a real decoder initializes
    * once per partition. STUB kernel — a real build would replace
    * `fakeDecode` with an image/audio codec call; the 16-bin byte
    * histogram keeps the output deterministic and testable.
    */
  def decodeFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // decoder init would happen HERE, once per partition
      it.map { m =>
        val (hist, energy) = fakeDecode(m.content)
        MediaFeatures(m.doc_id, m.n_bytes, energy, hist)
      }
    }
  }

  /** STUB for media decode: deterministic 16-bin byte histogram
    * (normalized) + mean byte "energy". Replace with a real codec.
    */
  private def fakeDecode(bytes: Array[Byte]): (Array[Double], Double) = {
    val hist = new Array[Double](16)
    var sum  = 0L
    var i    = 0
    while (i < bytes.length) {
      hist((bytes(i) & 0xff) % 16) += 1.0
      sum += (bytes(i) & 0xff)
      i += 1
    }
    val n = math.max(bytes.length, 1)
    (hist.map(_ / n), sum.toDouble / n)
  }

  /** STUB frame sampler: every `stride`-th byte window as a "frame". */
  def frameSample(media: Dataset[MediaRecord], stride: Int): DataFrame = {
    import media.sparkSession.implicits._
    media
      .flatMap { m =>
        m.content.grouped(stride).zipWithIndex.map { case (frame, idx) =>
          (m.doc_id, idx, frame.length.toLong)
        }
      }
      .toDF("doc_id", "frame_idx", "frame_bytes")
  }

  override def queries: Map[String, QueryDef] = Map(
    // Metadata path: typed binary column + portable fingerprint. Oracle-
    // checkable because md5/octet_length agree across engines on the
    // identical bytes.
    "q38_multimodal_meta" -> QueryDef(
      fn = (s, d) =>
        asMediaTable(s, d).toDF()
          .select(
            col("doc_id"),
            col("mime"),
            col("n_bytes"),
            md5(col("content")).as("content_md5")
          ),
      oracle = Some("""
        SELECT doc_id, 'text/plain' AS mime,
               CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
               md5(text) AS content_md5
        FROM documents""")
    ),

    // Feature-extraction path through mapPartitions (typed Dataset). The
    // histogram/energy kernel is the documented stub. The projection
    // multiplies the kernel's normalized outputs back by n_bytes and
    // rounds to long: energy*n recovers the exact byte sum and hist[0]*n
    // the exact mod-16==0 count (error < 0.5 ulp for sums < 2^53), which
    // makes the mapPartitions path fully oracle-checkable — DuckDB
    // recomputes both from the utf-8 bytes (corpus is ASCII, so
    // ord(char) == byte).
    "q39_multimodal_features" -> QueryDef(
      fn = (s, d) =>
        decodeFeatures(asMediaTable(s, d)).toDF()
          .select(
            col("doc_id"),
            col("n_bytes"),
            round(col("energy") * col("n_bytes")).cast("long").as("byte_sum"),
            round(element_at(col("histogram"), 1) * col("n_bytes"))
              .cast("long").as("hist0_cnt")
          ),
      oracle = Some("""
        WITH codes AS (
          SELECT doc_id,
                 CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                 ord(substr(text,
                   CAST(unnest(range(1, length(text) + 1)) AS INT), 1)) AS c
          FROM documents
        )
        SELECT doc_id, n_bytes,
               CAST(SUM(c) AS BIGINT) AS byte_sum,
               CAST(SUM(CASE WHEN c % 16 = 0 THEN 1 ELSE 0 END) AS BIGINT)
                 AS hist0_cnt
        FROM codes
        GROUP BY doc_id, n_bytes""")
    ),

    // Frame-sampling path: every stride-th byte window of the payload as
    // a "frame" row (the video/audio sampling shape — a real decoder
    // emits decoded frames at the same boundaries). Fully
    // oracle-checkable: frame count and sizes are arithmetic over
    // octet_length.
    "q61_frame_sample" -> QueryDef(
      fn = (s, d) => frameSample(asMediaTable(s, d), stride = 64),
      oracle = Some("""
        WITH d AS (
          SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n
          FROM documents),
        f AS (
          SELECT doc_id, n,
                 unnest(range(0, CAST(CEIL(CAST(n AS DOUBLE) / 64) AS BIGINT)))
                   AS frame_idx
          FROM d)
        SELECT doc_id, CAST(frame_idx AS INTEGER) AS frame_idx,
               CAST(LEAST(64, n - frame_idx * 64) AS BIGINT) AS frame_bytes
        FROM f""")
    )
  )
}
