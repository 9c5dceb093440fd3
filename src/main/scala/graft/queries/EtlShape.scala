package graft.queries

import graft.{GQuery, Tables}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The reference's end-to-end pipeline shapes (SURVEY.md §3) exercised
  * deterministically on the testdata star schema, plus the multimodal
  * binary-column plumbing a training-data pipeline needs. */
object EtlShape {

  /** §3.2 gold-enrich shape: fact ⟕ dim with FR→EN-style renames (P1),
    * right-key drop (P2/P3 hygiene via Seq-join), type coercion (F2/F3),
    * and a deterministic processing-date column (F5's shape; literal so
    * the gate compare is stable). */
  val goldEnrich: GQuery = GQuery(
    "e1_gold_enrich_shape",
    (s, d) => {
      val fact = Tables.orders(s, d)
        .withColumnRenamed("o_custkey", "employee_id")
        .withColumn("total_price", col("o_totalprice").try_cast("double"))
      val dim = Tables.customer(s, d)
        .withColumnRenamed("c_custkey", "employee_id")
        .withColumnRenamed("c_name", "employee_name")
        .select("employee_id", "employee_name", "c_mktsegment")
      fact
        .join(broadcast(dim), Seq("employee_id"), "left")
        .withColumn("gold_processing_date", lit("2026-01-01"))
        .select(col("o_orderkey"), col("employee_id"), col("employee_name"),
          col("c_mktsegment"), col("total_price"), col("gold_processing_date"))
        .orderBy(col("o_orderkey"))
    },
    Some("""SELECT o_orderkey, o_custkey AS employee_id,
              c_name AS employee_name, c_mktsegment,
              CAST(o_totalprice AS DOUBLE) AS total_price,
              '2026-01-01' AS gold_processing_date
            FROM orders LEFT JOIN customer ON o_custkey = c_custkey
            ORDER BY o_orderkey"""))

  /** Multimodal plumbing (audio/video-shaped): treat document text bytes
    * as an opaque binary payload, carry typed metadata, run the
    * deterministic stub "decoder" (StubCodec — retained for payload
    * kinds the JDK cannot decode; images get the real ImageIO path in
    * m2 below): byte length + pseudo width/height derived from the
    * payload hash. The Spark-side schema/partitioning/batch shape is
    * real; only this codec is fake. */
  val multimodalMeta: GQuery = GQuery(
    "m1_multimodal_decode_stub",
    (s, d) => {
      val payload = Tables.documents(s, d)
        .select(col("doc_id"), col("text").cast("binary").as("payload"),
          col("source"))
      payload.select(
        col("doc_id"), col("source"),
        octet_length(col("payload")).as("n_bytes"),
        // stub codec: dims from the byte-length hash (deterministic)
        (pmod(octet_length(col("payload")) * 2654435761L, lit(1920L)) + 1)
          .as("width"),
        (pmod(octet_length(col("payload")) * 40503L, lit(1080L)) + 1)
          .as("height"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT doc_id, source, strlen(text) AS n_bytes,
              (strlen(text) * 2654435761) % 1920 + 1 AS width,
              (strlen(text) * 40503) % 1080 + 1 AS height
            FROM documents ORDER BY doc_id"""))

  /** REAL image decode (javax.imageio, JDK-only): deterministic PNG/BMP
    * fixtures are encoded per doc_id (DataGen.imageBytes — dimensions,
    * format and dHash are pure functions of the id), then decoded
    * through the partition-batched [[graft.multimodal.Multimodal]]
    * pipeline with [[graft.multimodal.Multimodal.ImageIoCodec]]:
    * header-parsed width/height/format + 64-bit dHash over a 9×8
    * block-mean grayscale grid. The oracle states the expected decode
    * output arithmetically — any header-parse or hash defect breaks the
    * row hash. */
  val imageDecode: GQuery = GQuery(
    "m2_image_decode",
    (s, d) => {
      val enc = udf((id: Long) => graft.etl.DataGen.imageBytes(id))
      val assets = Tables.documents(s, d)
        .select(col("doc_id").cast("long").as("doc_id"))
        .withColumn("payload", enc(col("doc_id")))
      graft.multimodal.Multimodal
        .decodeAndFeaturize(assets, "payload",
          graft.multimodal.Multimodal.ImageIoCodec)
        .select(col("doc_id"),
          col("width").cast("long").as("width"),
          col("height").cast("long").as("height"),
          col("format"), col("phash"))
        .orderBy(col("doc_id"))
    },
    Some("""SELECT CAST(doc_id AS BIGINT) AS doc_id,
              CAST(16 + (doc_id * 7) % 48 AS BIGINT) AS width,
              CAST(16 + (doc_id * 13) % 48 AS BIGINT) AS height,
              CASE WHEN doc_id % 3 = 0 THEN 'bmp' ELSE 'png' END AS format,
              CAST(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE -1 END AS BIGINT)
                AS phash
            FROM documents ORDER BY doc_id"""))

  /** S11 raw-parquet escape hatch + U1: per-file scan union with a
    * provenance column, deterministic order. */
  val unionScan: GQuery = GQuery(
    "s11_multi_scan_union",
    (s, d) => {
      val a = Tables.nation(s, d).withColumn("src", lit("nation"))
        .select(col("n_nationkey").as("key"), col("n_name").as("name"), col("src"))
      val b = Tables.region(s, d).withColumn("src", lit("region"))
        .select(col("r_regionkey").as("key"), col("r_name").as("name"), col("src"))
      a.unionByName(b).orderBy(col("src"), col("key"))
    },
    Some("""SELECT * FROM (
              SELECT n_nationkey AS key, n_name AS name, 'nation' AS src
              FROM nation
              UNION ALL
              SELECT r_regionkey, r_name, 'region' FROM region)
            ORDER BY src, key"""))

  val all: Seq[GQuery] = Seq(goldEnrich, multimodalMeta, imageDecode, unionScan)
}
