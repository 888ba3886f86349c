package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One media item: opaque binary payload + typed metadata (SURVEY §2.9
  * multimodal columns). */
case class MediaItem(doc_id: Long, media: Array[Byte], format: String, n_bytes: Long)

/** Extracted features for one media item. */
case class MediaFeatures(doc_id: Long, n_bytes: Long, head_byte: Int, checksum: Long)

/** Multimodal-column plumbing (SURVEY §2.9): image/audio/video travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * run per-partition in batches (the JVM analog of `mapInPandas` — one
  * decoder init per partition, amortized over its rows).
  *
  * The decode step itself is a STUB (this container has no image/audio
  * codecs): `decodeStub` computes deterministic byte-level features where
  * a real pipeline would run JPEG/PNG decode + a vision encoder. The
  * Spark-side plumbing — binary schema, partition-batched execution,
  * feature schema — is real and oracle-tested.
  */
object Media {

  /** Attach a binary payload column: text bytes as the stand-in payload
    * (real pipelines read image bytes via `spark.read.format("binaryFile")`
    * which yields exactly this shape: path, length, content binary).
    */
  def asMedia(docs: DataFrame, idCol: String, textCol: String)
             (implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    docs.select(
      col(idCol).as("doc_id"),
      col(textCol).cast(BinaryType).as("media"),
      lit("text/plain").as("format"),
      octet_length(col(textCol)).cast(LongType).as("n_bytes"))
      .as[MediaItem]
  }

  /** Per-partition batched "decode" — the mapInPandas-shaped hot path.
    * STUB: a real implementation would decode `item.media` with a codec
    * initialized once per partition; here the features are deterministic
    * byte statistics so the oracle can verify the plumbing end-to-end.
    */
  def decodeStub(items: Dataset[MediaItem])
                (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    items.mapPartitions { it =>
      // per-partition init would go here (codec / model handle)
      it.grouped(64).flatMap { batch => // batch shape mirrors Arrow batches
        batch.map { m =>
          val bytes = m.media
          var sum = 0L
          var i = 0
          while (i < bytes.length) { sum += bytes(i) & 0xff; i += 1 }
          MediaFeatures(m.doc_id, bytes.length.toLong,
            if (bytes.nonEmpty) bytes(0) & 0xff else -1, sum % 997L)
        }
      }
    }
  }

  /** End-to-end: documents → binary media → batched feature extraction. */
  def features(docs: DataFrame, idCol: String, textCol: String)
              (implicit spark: SparkSession): DataFrame =
    decodeStub(asMedia(docs, idCol, textCol)).toDF()

  /** Resize STUB: payload → fixed-budget payload. A real pipeline decodes,
    * scales, re-encodes per partition; the stub keeps a deterministic
    * byte-budget prefix so schema/plumbing (binary in, binary out, metadata
    * updated) is testable. Declarative truncation — no UDF.
    */
  def resizeStub(items: Dataset[MediaItem], maxBytes: Int)
                (implicit spark: SparkSession): Dataset[MediaItem] = {
    import spark.implicits._
    items.toDF()
      .withColumn("media",
        when(octet_length(col("media")) > maxBytes,
          expr(s"substring(media, 1, $maxBytes)")).otherwise(col("media")))
      .withColumn("n_bytes", octet_length(col("media")).cast(LongType))
      .as[MediaItem]
  }

  /** Frame-sampling STUB: one "video" payload → every `stride`-th
    * fixed-size frame as its own row (doc_id, frame_no, frame). A real
    * pipeline demuxes containers per partition; the plumbing — binary
    * explode with positional metadata, rows ∝ payload size — is the real
    * shape of the operator at scale.
    */
  def frameSample(items: Dataset[MediaItem], frameBytes: Int, stride: Int)
                 (implicit spark: SparkSession): DataFrame = {
    require(frameBytes > 0 && stride > 0)
    items.toDF()
      .select(col("doc_id"),
        posexplode(expr(
          s"""transform(
                sequence(0, CAST(greatest(ceil(n_bytes / ${frameBytes.toLong}) - 1, 0) AS INT)),
                i -> substring(media, i * $frameBytes + 1, $frameBytes))"""))
          .as(Seq("frame_no", "frame")))
      .where(col("frame_no") % stride === 0)
  }
}
