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
    val out = Multimodal.decodeAndFeaturize(assets, "payload")
    assert(out.columns.toSeq ==
      Seq("asset_id", "payload", "n_bytes", "width", "height", "format",
        "features"))
    val r = out.filter(col("asset_id") === 1).head
    assert(r.getAs[Int]("n_bytes") == "small payload".length)
    assert(r.getAs[scala.collection.Seq[Float]]("features").length ==
      Multimodal.FeatureDim)
    // deterministic: run twice, same output
    val again = Multimodal.decodeAndFeaturize(assets, "payload")
      .filter(col("asset_id") === 1).head
    assert(r.getAs[Int]("width") == again.getAs[Int]("width"))
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
}
