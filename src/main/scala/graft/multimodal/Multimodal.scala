package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video payloads travel as
  * opaque `binary` columns with typed metadata; decode / feature-extract
  * steps run batched per partition (the Scala analog of mapInPandas —
  * one decoder instantiation per partition, vectorized batches).
  *
  * The decode itself is STUBBED (no image/audio libs in this container):
  * `StubDecoder` derives deterministic fake features from the bytes. The
  * Spark-side plumbing — schema, partitioning, batch shape — is real and
  * tested; swap `StubDecoder` for a JNI/FFI decoder in production.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, modality: String, payload: Array[Byte])
  final case class MediaFeatures(doc_id: Long, modality: String, byteLen: Long,
                                 width: Int, height: Int, meanLuma: Double)

  /** Wrap a text corpus as fake media payloads: modality round-robins by
    * id; payload = utf-8 bytes (stands in for encoded media). */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      element_at(array(lit("image"), lit("audio"), lit("video")),
        (col("doc_id") % 3 + 1).cast("int")).as("modality"),
      encode(col("text"), "UTF-8").as("payload"))

  /** Deterministic fake decode: "dimensions" and "luma" from byte stats.
    * Replace with a real decoder; the signature is the contract. */
  object StubDecoder {
    def decode(modality: String, payload: Array[Byte]): (Int, Int, Double) = {
      val n = payload.length
      val sum = payload.foldLeft(0L)((a, b) => a + (b & 0xff))
      val w = 16 + (n % 64)
      val h = if (modality == "audio") 1 else 16 + ((n / 64) % 64)
      (w, h, if (n == 0) 0.0 else sum.toDouble / n)
    }
  }

  /** Batched per-partition decode — one decoder per partition, rows
    * streamed through it (mapInPandas shape). Repartition first so decode
    * parallelism matches cluster cores, not file layout. */
  def extractFeatures(spark: SparkSession, media: DataFrame,
                      partitions: Int = 0): Dataset[MediaFeatures] = {
    import spark.implicits._
    val m = if (partitions > 0) media.repartition(partitions) else media
    m.as[MediaRow].mapPartitions { rows =>
      // per-partition decoder init goes here (expensive handle, once)
      rows.map { r =>
        val (w, h, luma) = StubDecoder.decode(r.modality, r.payload)
        MediaFeatures(r.doc_id, r.modality, r.payload.length.toLong, w, h, luma)
      }
    }
  }

  final case class ResizedMedia(doc_id: Long, modality: String,
                                width: Int, height: Int, payload: Array[Byte])

  /** Resize plumbing: payload → fixed (w,h) thumbnail. The stub
    * downsamples bytes deterministically (stride sampling); a real
    * decoder swaps in behind the same partition-batched signature. */
  def resize(spark: SparkSession, media: DataFrame, w: Int, h: Int,
             partitions: Int = 0): Dataset[ResizedMedia] = {
    import spark.implicits._
    val m = if (partitions > 0) media.repartition(partitions) else media
    m.as[MediaRow].mapPartitions { rows =>
      rows.map { r =>
        val target = math.max(1, w * h)
        val stride = math.max(1, r.payload.length / target)
        val out = r.payload.indices.by(stride).take(target)
          .map(r.payload.apply).toArray
        ResizedMedia(r.doc_id, r.modality, w, h, out)
      }
    }
  }

  final case class Frame(doc_id: Long, frameIdx: Int, payload: Array[Byte])

  /** Frame sampling for video payloads: split the byte stream into
    * fixed-size "frames" and keep every `everyN`-th — one input row fans
    * out to many frame rows (the flatMap shape real video sampling has). */
  def sampleFrames(spark: SparkSession, media: DataFrame, frameBytes: Int,
                   everyN: Int): Dataset[Frame] = {
    import spark.implicits._
    media.as[MediaRow].filter(_.modality == "video").flatMap { r =>
      r.payload.grouped(frameBytes).zipWithIndex
        .filter { case (_, i) => i % everyN == 0 }
        .map { case (bytes, i) => Frame(r.doc_id, i, bytes) }
    }
  }
}
