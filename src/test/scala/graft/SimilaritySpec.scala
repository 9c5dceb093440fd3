package graft

import graft.similarity.VectorFunctions._
import org.apache.spark.sql.functions._

/** ANN semantics: brute force is the gold ranking; LSH and IVF are
  * approximations whose results must be internally consistent and
  * bounded by it. */
class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  lazy val e = Tables.embeddings(spark, sf)
  lazy val queries = e.filter(col("vec_id") < 5)

  test("brute-force top-k: ranks are dense and sims non-increasing") {
    val got = bruteForceTopK(e, queries, k = 10)
      .select($"query_id", $"rank", $"sim").as[(Long, Int, Double)]
      .collect().groupBy(_._1)
    assert(got.size == 5)
    got.values.foreach { rs =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1 to 10))
      assert(sorted.sliding(2).forall(p => p(0)._3 >= p(1)._3))
    }
  }

  test("IVF results are a subset-ranking bounded by brute force") {
    val brute = bruteForceTopK(e, queries, k = 10)
      .groupBy($"query_id").agg(max($"sim").as("best"))
      .as[(Long, Double)].collect().toMap
    val ivf = ivfTopK(e, queries, e.filter(col("vec_id") < 16),
      k = 5, nprobe = 2)
      .select($"query_id", $"rank", $"sim").as[(Long, Int, Double)].collect()
    assert(ivf.nonEmpty)
    // approximate search can never beat the exact best
    ivf.foreach { case (q, _, sim) => assert(sim <= brute(q)) }
    // every probed centroid's own assignment is itself (self-similarity 1)
    val asg = ivfAssign(e, e.filter(col("vec_id") < 16))
      .filter($"vec_id" < 16)
      .select($"vec_id", $"centroid_id").as[(Long, Long)].collect()
    assert(asg.forall { case (v, c) => v == c })
  }

  test("LSH bucket join candidates all share the exact code") {
    val withCode = e.select($"vec_id",
      lshCode($"embedding", 8, 64).as("b")).as[(Long, Long)].collect()
    assert(withCode.map(_._2).distinct.length > 1) // codes spread
    assert(withCode.forall { case (_, b) => b >= 0 && b < 256 })
  }
}
