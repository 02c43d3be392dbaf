package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Opaque media asset: binary payload + typed metadata. Image/audio/
  * video payloads are carried as `binary` columns with metadata the
  * pipeline can partition/filter on without decoding.
  */
case class MediaAsset(
    doc_id: Long,
    format: String,
    width: Int,
    height: Int,
    content: Array[Byte])

/** Decoded per-asset features (see [[MultimodalOps.extractFeatures]]). */
case class MediaFeatures(
    doc_id: Long,
    format: String,
    byte_len: Int,
    checksum: Long,
    histogram: Array[Double],
    fake_embedding: Array[Float])

/** Multimodal-column plumbing: treat image/audio/video as opaque
  * `binary` columns with typed metadata, decode/feature-extract in
  * partition-sized batches.
  *
  * ==STUB NOTICE==
  * Real decoders (JPEG/PNG/audio) are NOT available in this build
  * environment, so [[extractFeatures]] substitutes a *deterministic
  * fake decode* (byte histogram + rolling checksum standing in for
  * pixels/samples). Everything around the stub — the binary schema,
  * the `Dataset[MediaAsset]` typed boundary, the mapPartitions batch
  * shape (decoder state initialized once per partition, streamed over
  * rows), and the feature schema — is the real plumbing a decoder
  * drops into: replace the body of `decodeOne` with the codec call.
  *
  * Scale notes: payload bytes never hit the driver; features are a
  * narrow projection so downstream aggregation shuffles only small
  * rows; partition-batched decode amortizes per-partition setup the
  * way an Arrow-batched Pandas UDF would in PySpark.
  */
object MultimodalOps {

  /** Lift documents into binary assets (stand-in for `binaryFile`
    * sources); format/width/height are deterministic metadata.
    */
  def assetsFromDocuments(docs: DataFrame): Dataset[MediaAsset] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        element_at(array(lit("png"), lit("jpeg"), lit("wav")),
          (pmod(col("doc_id"), lit(3)) + 1).cast("int")).as("format"),
        (pmod(col("doc_id"), lit(7)) * 64 + 64).cast("int").as("width"),
        (pmod(col("doc_id"), lit(5)) * 64 + 64).cast("int").as("height"),
        encode(col("text"), "UTF-8").as("content"))
      .as[MediaAsset]
  }

  /** Partition-batched "decode" — STUB body, real batch shape. */
  def extractFeatures(assets: Dataset[MediaAsset]): Dataset[MediaFeatures] = {
    val spark = assets.sparkSession
    import spark.implicits._
    assets.mapPartitions { batch =>
      // Real codec: initialize the decoder ONCE here per partition.
      batch.map(decodeOne)
    }
  }

  /** STUB: deterministic byte-level features in place of pixel/sample
    * decode. Replace this body with the real codec call.
    */
  private def decodeOne(a: MediaAsset): MediaFeatures = {
    val bytes = a.content
    var checksum = 0L
    val hist = new Array[Double](16)
    var i = 0
    while (i < bytes.length) {
      val b = bytes(i) & 0xff
      checksum = (checksum * 1000003L + b) % 2147483648L
      hist(b >> 4) += 1.0
      i += 1
    }
    val n = math.max(bytes.length, 1).toDouble
    val norm = hist.map(_ / n)
    MediaFeatures(a.doc_id, a.format, bytes.length, checksum, norm,
      norm.take(8).map(_.toFloat))
  }
}
