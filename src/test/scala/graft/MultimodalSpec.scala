package graft

import graft.multimodal.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema contract, partition-batched decode,
  * deterministic stub codec, blob repartition sizing. */
class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private lazy val assets = Seq(
    (1L, "small payload"),
    (2L, "a considerably longer payload with more bytes in it"),
    (3L, "x")).toDF("asset_id", "s")
    .select(col("asset_id"), col("s").cast("binary").as("payload"))

  test("decodeAndFeaturize appends meta + features with the right schema") {
    val out = Multimodal.decodeAndFeaturize(assets, "payload",
      Multimodal.StubCodec)
    assert(out.columns.toSeq ==
      Seq("asset_id", "payload", "n_bytes", "width", "height", "format",
        "phash", "features"))
    val r = out.filter(col("asset_id") === 1).head
    assert(r.getAs[Int]("n_bytes") == "small payload".length)
    assert(r.getAs[scala.collection.Seq[Float]]("features").length ==
      Multimodal.FeatureDim)
    // deterministic: run twice, same output
    val again = Multimodal.decodeAndFeaturize(assets, "payload",
      Multimodal.StubCodec)
      .filter(col("asset_id") === 1).head
    assert(r.getAs[Int]("width") == again.getAs[Int]("width"))
    assert(r.getAs[Long]("phash") == again.getAs[Long]("phash"))
  }

  test("ImageIoCodec decodes a real PNG payload: header dims, format, dHash") {
    import graft.etl.DataGen
    // odd id → png + horizontal gradient (dHash all ones); even → solid
    val png = DataGen.imageBytes(5L)
    assert(png.length > 8 &&
      (png(1) & 0xff) == 'P' && (png(2) & 0xff) == 'N' && (png(3) & 0xff) == 'G',
      "fixture must be a real PNG byte stream")
    val (n, w, h, fmt) = Multimodal.ImageIoCodec.decodeMeta(png)
    assert(n == png.length)
    assert(w == DataGen.imageWidth(5L) && h == DataGen.imageHeight(5L))
    assert(fmt == "png")
    assert(Multimodal.ImageIoCodec.phash(png) == -1L) // gradient → all bits
    val feats = Multimodal.ImageIoCodec.features(png)
    assert(feats.length == Multimodal.FeatureDim)
    // gradient: left-column blocks darker than right-column blocks
    assert(feats(0) < feats(3) && feats(12) < feats(15))
  }

  test("ImageIoCodec decodes BMP and solid images; stub stays for A/V") {
    import graft.etl.DataGen
    val bmp = DataGen.imageBytes(6L) // even → solid gray, id%3==0 → bmp
    val (_, w, h, fmt) = Multimodal.ImageIoCodec.decodeMeta(bmp)
    assert(w == DataGen.imageWidth(6L) && h == DataGen.imageHeight(6L))
    assert(fmt == "bmp")
    assert(Multimodal.ImageIoCodec.phash(bmp) == 0L) // solid → no gradient bits
    // non-image payloads must fail loudly, not fabricate metadata
    intercept[IllegalArgumentException] {
      Multimodal.ImageIoCodec.decodeMeta("not an image".getBytes)
    }
  }

  test("imageAssets fixture: decoded values equal the stored expectations") {
    import graft.etl.DataGen
    val fx = DataGen.imageAssets(spark, n = 24)
    val decoded = Multimodal.decodeAndFeaturize(fx, "payload")
    val bad = decoded.filter(
      col("width") =!= col("expected_width") ||
        col("height") =!= col("expected_height") ||
        col("format") =!= col("expected_format") ||
        col("phash") =!= col("expected_phash"))
    assert(bad.isEmpty, "every fixture image must decode to its expectations")
  }

  test("imageNearDups pairs near-identical images, separates different ones") {
    import java.awt.image.BufferedImage
    import javax.imageio.ImageIO
    def png(f: (Int, Int) => Int, w: Int = 64, h: Int = 64): Array[Byte] = {
      val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = f(x, y) & 0xff
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      ImageIO.write(img, "png", bos); bos.toByteArray
    }
    val horiz = png((x, _) => x * 4)
    // one hot pixel: block means barely move, dHash unchanged or ≤3 bits
    val horizNoisy = png((x, y) => if (x == 10 && y == 10) 255 else x * 4)
    val vert = png((_, y) => y * 4)
    val vertClone = png((_, y) => y * 4)
    val assets = Seq((1L, horiz), (2L, horizNoisy), (3L, vert),
      (4L, vertClone)).toDF("doc_id", "payload")
    val pairs = Multimodal.imageNearDups(assets, "payload")
      .select($"id_a", $"id_b", $"dist").as[(Long, Long, Int)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((1L, 2L), (3L, 4L)),
      s"pairs: ${pairs.toSeq}")
    assert(pairs.forall(_._3 <= 3))
  }

  test("repartitionForBlobs yields a bounded partition count") {
    val out = Multimodal.repartitionForBlobs(assets, "payload", targetMB = 1)
    assert(out.rdd.getNumPartitions == 1) // tiny data → single task
    assert(out.count() == 3)
  }

  test("sampleFrames explodes k frames per asset with lineage") {
    val frames = Multimodal.sampleFrames(assets, "payload", "asset_id", k = 4)
    assert(frames.count() == 12)
    assert(frames.columns.toSeq == Seq("asset_id", "frame_idx", "frame_stub"))
    assert(frames.groupBy("asset_id").count()
      .filter(col("count") =!= 4).isEmpty)
  }

  test("decodeAudio: real WAV container parse, frame math, peak/rms") {
    import graft.etl.DataGen
    val ids = spark.range(0, 16)
      .select(col("id").as("doc_id"))
    val enc = org.apache.spark.sql.functions.udf(
      (id: Long) => DataGen.audioBytes(id))
    val decoded = Multimodal.decodeAudio(
      ids.withColumn("payload", enc(col("doc_id"))), "payload")
    val rows = decoded
      .select("doc_id", "sample_rate", "n_samples", "duration_ms",
        "peak", "rms", "n_frames")
      .collect()
    assert(rows.length == 16)
    rows.foreach { r =>
      val id = r.getLong(0)
      val sr = DataGen.audioSampleRate(id)
      val n = DataGen.audioNumSamples(id)
      val a = DataGen.audioAmplitude(id)
      assert(r.getInt(1) == sr, s"sample_rate id=$id")
      assert(r.getLong(2) == n.toLong, s"n_samples id=$id")
      assert(r.getLong(3) == n.toLong * 1000 / sr, s"duration id=$id")
      assert(r.getInt(4) == a, s"peak id=$id")
      // square wave: every sample is ±a, so RMS is exactly a
      assert(r.getDouble(5) == a.toDouble, s"rms id=$id")
      assert(r.getInt(6) == (n - 256) / 128 + 1, s"n_frames id=$id")
    }
    // degenerate framing: a clip shorter than one frame has 0 frames
    val tiny = Multimodal.decodeAudio(
      ids.limit(1).withColumn("payload", enc(col("doc_id"))),
      "payload", frameLen = 100000, hop = 128)
    assert(tiny.select("n_frames").head().getInt(0) == 0)
  }

  test("decodeAudio: big-endian AIFF/AU containers normalize to s16le") {
    import javax.sound.sampled.{AudioFileFormat, AudioFormat, AudioInputStream, AudioSystem}
    // ±1000 square wave, 8kHz, 800 samples, serialized big-endian
    val sr = 8000f; val n = 800; val amp = 1000
    def pcmBe: Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(n * 2)
        .order(java.nio.ByteOrder.BIG_ENDIAN)
      for (i <- 0 until n) bb.putShort(if ((i / 8) % 2 == 0) amp.toShort
        else (-amp).toShort)
      bb.array()
    }
    def container(tpe: AudioFileFormat.Type): Array[Byte] = {
      val fmt = new AudioFormat(AudioFormat.Encoding.PCM_SIGNED,
        sr, 16, 1, 2, sr, true) // bigEndian = true
      val ais = new AudioInputStream(
        new java.io.ByteArrayInputStream(pcmBe), fmt, n.toLong)
      val bos = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, tpe, bos)
      bos.toByteArray
    }
    val rows = Multimodal.decodeAudio(
      Seq((1L, container(AudioFileFormat.Type.AIFF)),
        (2L, container(AudioFileFormat.Type.AU)))
        .toDF("doc_id", "payload"), "payload")
      .select("doc_id", "sample_rate", "n_samples", "peak", "rms")
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getInt(1) == 8000, s"sample_rate doc=${r.getLong(0)}")
      assert(r.getLong(2) == n.toLong, s"n_samples doc=${r.getLong(0)}")
      assert(r.getInt(3) == amp, s"peak doc=${r.getLong(0)}")
      assert(r.getDouble(4) == amp.toDouble, s"rms doc=${r.getLong(0)}")
    }
  }
}
