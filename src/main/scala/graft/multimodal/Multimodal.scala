package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal column plumbing for training-data pipelines: image/audio/
  * video ride as opaque `binary` columns with typed metadata; decode /
  * feature-extraction runs per-partition so heavyweight codecs are
  * initialized once per task, not per row (the Scala analogue of
  * `mapInPandas` batch processing).
  *
  * The codec itself is STUBBED (no image/audio libraries in this
  * environment): [[StubCodec]] derives deterministic pseudo-metadata and
  * features from the payload bytes. The Spark-side contract — schema,
  * partition-batched execution, feature vector shape, and the
  * repartition sizing for 100 TB blob scans — is real and tested;
  * swapping StubCodec for a JNI/JavaCV decoder changes no plan shape. */
object Multimodal {

  /** Decoded-asset schema appended to the carrier columns. */
  val metaSchema: StructType = StructType(Seq(
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("format", StringType, nullable = false)))

  /** Per-asset feature vector length (stub "embedding"). */
  val FeatureDim = 16

  trait Codec extends Serializable {
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int, String)
    def features(payload: Array[Byte]): Array[Float]
  }

  /** Deterministic fake codec: dimensions and features are pure
    * functions of the bytes (so tests and oracles are stable). A real
    * implementation decodes headers / samples frames here. */
  object StubCodec extends Codec {
    def decodeMeta(payload: Array[Byte]): (Int, Int, Int, String) = {
      val n = payload.length
      val w = (math.abs(n.toLong * 2654435761L) % 1920L).toInt + 1
      val h = (math.abs(n.toLong * 40503L) % 1080L).toInt + 1
      val fmt = if (n % 2 == 0) "png" else "jpeg"
      (n, w, h, fmt)
    }
    def features(payload: Array[Byte]): Array[Float] = {
      val out = new Array[Float](FeatureDim)
      var i = 0
      while (i < payload.length) {
        out(i % FeatureDim) += (payload(i) & 0xff) / 255.0f
        i += 1
      }
      out
    }
  }

  /** Attach decoded metadata + feature vector to a DataFrame with a
    * binary `payloadCol`. Partition-batched: the codec is bound once per
    * partition iterator (mapPartitions), rows stream through. */
  def decodeAndFeaturize(df: DataFrame, payloadCol: String,
      codec: Codec = StubCodec): DataFrame = {
    val inSchema = df.schema
    val outSchema = StructType(inSchema.fields ++ metaSchema.fields :+
      StructField("features", ArrayType(FloatType, containsNull = false)))
    val payloadIdx = inSchema.fieldIndex(payloadCol)
    implicit val enc = RowEncoder.encoderFor(outSchema)
    df.mapPartitions { rows =>
      // per-partition codec binding happens here (once per task)
      rows.map { r =>
        val payload = r.getAs[Array[Byte]](payloadIdx)
        val (n, w, h, fmt) = codec.decodeMeta(payload)
        Row.fromSeq(r.toSeq ++ Seq(n, w, h, fmt, codec.features(payload).toSeq))
      }
    }
  }

  /** Blob-scan sizing: large binary rows blow past the default
    * bytes-per-partition heuristics (row count ≪ bytes). Repartition to
    * a target of ~`targetMB` of payload per task before decode — at
    * 100 TB this is the difference between 10k balanced tasks and a few
    * straggler tasks OOMing on skewed shards.
    *
    * Sizing comes from Catalyst plan statistics — for file-backed
    * frames that is the FileIndex's on-disk byte total, already listed
    * at planning time: NO data scan, no Spark job. (The previous
    * version ran sum(octet_length(payload)) first — an extra full read
    * of every blob at 100 TB.) The payload scan survives only as the
    * fallback for frames whose statistics are the unknown-size
    * placeholder (no file lineage and no CBO stats). */
  def repartitionForBlobs(df: DataFrame, payloadCol: String,
      targetMB: Int = 128): DataFrame = {
    val statBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    val credible = statBytes > 0 && statBytes < BigInt(1L << 50) // < 1 PiB
    val totalBytes =
      if (credible) statBytes.toLong
      else df.agg(sum(octet_length(col(payloadCol)))).head.getLong(0).max(1L)
    val parts = math.max(1, (totalBytes / (targetMB.toLong * 1024 * 1024)).toInt)
    df.repartition(parts)
  }

  /** Frame-sampling shape for video payloads: explode K evenly-spaced
    * pseudo-frames per asset (stub: byte slices), keeping lineage
    * (asset id, frame index) — the downstream shape a real frame
    * extractor produces. */
  def sampleFrames(df: DataFrame, payloadCol: String, idCol: String,
      k: Int = 4): DataFrame =
    df.select(col(idCol), posexplode(transform(
      sequence(lit(0), lit(k - 1)),
      i => substring_index(
        base64(col(payloadCol)), "=", 1).substr(i * 8 + 1, lit(8)))))
      .withColumnRenamed("pos", "frame_idx")
      .withColumnRenamed("col", "frame_stub")
}
