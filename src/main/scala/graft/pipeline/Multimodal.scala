package graft.pipeline

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads with typed
  * metadata, processed per-partition in batches — the Spark-side shape of
  * an image/audio decode stage in a training-data pipeline.
  *
  * The decode itself is STUBBED (this container has no image/audio codecs):
  * `decodeStub` derives deterministic fake "pixels" from the payload bytes.
  * Everything around it — the schema, the Dataset[T] typed pipeline, the
  * mapPartitions batch shape (one JVM-side batch per partition, mirroring
  * mapInPandas/Arrow batching), the partition sizing — is real and tested.
  */
object Multimodal {

  /** Typed media record: payload + metadata the way a real pipeline carries
    * images (bytes + width/height/format) without decoding at scan time. */
  case class MediaRecord(doc_id: Long, bytes: Array[Byte], format: String, n_bytes: Long)
  case class MediaFeatures(doc_id: Long, width: Int, height: Int, n_frames: Int,
                           feat: Array[Double])

  /** Wrap a text corpus as fake media payloads (the driver testdata has no
    * binary column; utf-8 bytes stand in for an encoded image). Metadata
    * columns are real and SQL-oracle-able. */
  def asMedia(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.select(col(idCol).cast("long").as("doc_id"),
      encode(col(textCol), "utf-8").as("bytes"),
      lit("txt").as("format"),
      length(encode(col(textCol), "utf-8")).cast("long").as("n_bytes"))

  /** Metadata/integrity projection — no decode, pure column ops: the scan
    * only reads the metadata columns (column pruning keeps the payload
    * bytes out of the scan when this is the whole query). */
  def mediaMeta(media: DataFrame): DataFrame =
    media.select(col("doc_id"), col("format"), col("n_bytes"),
      md5(col("bytes")).as("digest"))

  /** STUB decode: deterministic fake decode in place of an image codec.
    * Real pipeline shape: Dataset[MediaRecord] → mapPartitions (per-batch
    * decode, exactly where an Arrow/pandas batch UDF would sit) →
    * Dataset[MediaFeatures]. The "features" are a 16-bin byte histogram —
    * computable without codecs, deterministic, and honest about being a
    * placeholder for a real pixel decoder. */
  def decodeStub(media: DataFrame)(implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.select(col("doc_id"), col("bytes"), col("format"), col("n_bytes"))
      .as[MediaRecord]
      .mapPartitions { batch =>
        batch.map { rec =>
          // ??? — real impl: codec decode of rec.bytes to pixels/frames.
          // Deterministic fake: "image" is n_bytes wide, 1 high, 1 frame;
          // features = normalized 16-bin histogram of payload bytes.
          val hist = new Array[Double](16)
          rec.bytes.foreach(b => hist((b & 0xFF) / 16) += 1.0)
          val n = math.max(rec.bytes.length, 1).toDouble
          MediaFeatures(rec.doc_id, rec.n_bytes.toInt, 1, 1, hist.map(h => h / n))
        }
      }
  }

  /** Frame sampling plumbing: every `stride`-th "frame" (stub: fixed-size
    * byte windows of the payload) as its own row — the explode shape a
    * video pipeline uses, with deterministic frame ids. */
  def frameSample(media: DataFrame, frameBytes: Int = 64, stride: Int = 4): DataFrame =
    media.select(col("doc_id"), col("n_bytes"),
        explode(sequence(lit(0),
          greatest(ceil(col("n_bytes") / (frameBytes * stride)).cast("long") - 1, lit(0L))))
          .as("frame_id"))
      .select(col("doc_id"), col("frame_id"),
        (col("frame_id") * frameBytes * stride).as("offset"),
        least(lit(frameBytes.toLong), col("n_bytes") - col("frame_id") * frameBytes * stride)
          .as("frame_len"))
}
