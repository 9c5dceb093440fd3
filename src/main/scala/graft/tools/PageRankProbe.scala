package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-timing probe for the g1 PageRank shape (diagnostic only). */
object PageRankProbe {
  def main(args: Array[String]): Unit = {
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def t[A](label: String)(f: => A): A = {
      val s = System.nanoTime(); val r = f
      println(f"PHASE $label%-18s ${(System.nanoTime() - s) / 1e9}%.2f s")
      r
    }
    t("warmup")(spark.range(1000).selectExpr("sum(id)").collect())
    val edges = graft.Tables.orders(spark, d)
      .join(graft.Tables.lineitem(spark, d),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("src"),
        (col("l_suppkey") + 1000000L).as("dst"))
    t("edges_count")(edges.count())
    val r = t("pagerank_3") {
      graft.operators.PageRank.pageRank(edges, "src", "dst", iters = 3)
    }
    t("result_count")(r.queryExecution.toRdd.count())
    val r2 = t("pagerank_3_again") {
      graft.operators.PageRank.pageRank(edges, "src", "dst", iters = 3)
    }
    t("result_count2")(r2.queryExecution.toRdd.count())

    // inlined body with per-phase timing (mirror of PageRank.pageRank)
    val e = t("inl_edges") {
      val x = edges
        .select(col("src"), col("dst"))
        .filter(col("src").isNotNull && col("dst").isNotNull)
        .distinct().repartition(col("src")).persist()
      x.count(); x
    }
    val nodesDeg = t("inl_nodesDeg") {
      val nodes = e.select(col("src").as("node"))
        .union(e.select(col("dst").as("node"))).distinct()
      val x = nodes.join(e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("outdeg")), Seq("node"), "left").persist()
      x.count(); x
    }
    val nNodes = nodesDeg.count()
    var ranks = nodesDeg.withColumn("rank_micro", lit(1000000L)).persist()
    t("inl_ranks0")(ranks.count())
    for (i <- 1 to 3) {
      t(s"inl_iter$i") {
        val dang = ranks.filter(col("outdeg").isNull)
          .agg(coalesce(sum(col("rank_micro")), lit(0L)).as("dang"))
        val live = ranks.filter(col("outdeg").isNotNull)
        val inSum = e.join(live, e("src") === live("node"))
          .select(col("dst").as("node"),
            expr("rank_micro div outdeg").as("contrib"))
          .groupBy(col("node"))
          .agg(sum(col("contrib")).as("in_sum"))
        val next = nodesDeg.join(inSum, Seq("node"), "left")
          .crossJoin(broadcast(dang))
          .select(col("node"), col("outdeg"),
            (lit(150000L) + expr(
              s"(850 * (coalesce(in_sum, CAST(0 AS BIGINT)) + " +
                s"(dang div CAST($nNodes AS BIGINT)))) div 1000"))
              .as("rank_micro"))
          .persist()
        next.count()
        ranks.unpersist()
        ranks = next
      }
    }
    spark.stop()
  }
}
