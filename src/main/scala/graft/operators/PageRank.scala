package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deterministic PageRank in integer fixed-point arithmetic.
  *
  * Web-corpus curation weights domains by link authority (the
  * Common Crawl pipeline's quality prior); the float formulation is
  * hostile to verification because fp summation order varies with
  * partitioning. Ranks here are BIGINT micro-units (10^6 = 1.0) and
  * every step is integer division and integer sums — associative and
  * commutative, so the result is bit-identical under any partitioning,
  * any engine (the DuckDB oracle replays the same recurrence), any
  * cluster size.
  *
  * Per iteration (damping d as a per-mille integer):
  *   contrib(e)   = rank(src) div outdeg(src)
  *   inSum(v)     = Σ contrib over in-edges of v
  *   dangShare    = (Σ rank over outdeg-0 nodes) div nNodes
  *   rank'(v)     = (1000 − d)·unit div 1000
  *                  + d·(inSum(v) + dangShare) div 1000
  *
  * Truncating division loses < 1 micro-unit per term — fixed-point
  * noise far below any ranking decision, and identically reproduced
  * everywhere.
  *
  * Scale shape: each iteration is ONE Spark job whose only large
  * exchange is the keyed sum of |E| (dst, contrib) pairs. The ranks
  * generation carries its node's outdeg (static — joined once at
  * setup, never re-joined), the dangling mass rides along as a
  * broadcast one-row aggregate of the cached ranks (no driver
  * round-trip between jobs), and the edge set is pre-hash-partitioned
  * on src so a sort-merge plan never re-shuffles |E| payloads when
  * ranks outgrows the broadcast threshold. Ranks persist per
  * iteration and the previous generation unpersists, so the plan
  * never deepens past one generation (the connectedComponents
  * re-rooting lesson). */
object PageRank {

  /** Ranks after `iters` iterations over the DISTINCT edge set, as
    * (node, rank_micro). Nodes are the union of both endpoint columns;
    * null endpoints are dropped.
    *
    * Adaptive small-graph cutover (same shape and default bound as
    * connectedComponents'): the distinct edge set is persisted before
    * the loop anyway, so when it is under `localEdgeThreshold`
    * integral-id edges the whole recurrence runs as one driver-side
    * array sweep (~16 B/edge collected, ≈128 MB at the 8M default —
    * inside the 1 GB spark.driver.maxResultSize default) instead of
    * O(iters) shuffle jobs. Integer fixed-point arithmetic makes the
    * two legs BIT-IDENTICAL — there is no fp summation order to
    * diverge on — and OperatorsSpec forces and equates both. Graphs
    * beyond the bound take the distributed loop unchanged. */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
      iters: Int, dampPermille: Int = 850,
      localEdgeThreshold: Long = 8000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters in [1, 50], got $iters")
    require(dampPermille >= 0 && dampPermille <= 1000,
      s"dampPermille in [0, 1000], got $dampPermille")
    // repartition BEFORE distinct: hash(src) satisfies the (src, dst)
    // clustering requirement (same src → same partition), so the
    // dedup aggregates in place — one |E| shuffle instead of two
    val e = edges
      .select(col(srcCol).as("src"), col(dstCol).as("dst"))
      .filter(col("src").isNotNull && col("dst").isNotNull)
      .repartition(col("src"))
      .distinct()
      .persist()
    // node type parity with the distributed path: union(src, dst)
    // coerces to the WIDER endpoint type, so the local leg casts its
    // long-indexed output back to exactly that
    import org.apache.spark.sql.types.{ByteType, ShortType, IntegerType, LongType}
    val endTypes = e.schema.fields.map(_.dataType)
    val integralId = endTypes.forall {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
    if (integralId && e.count() <= localEdgeThreshold)
      return localPageRank(e, endTypes.maxBy(_.defaultSize), iters,
        dampPermille)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node"))).distinct()
    // (node, outdeg) with outdeg NULL for dangling nodes — static
    // across iterations, so joined exactly once, here
    val nodesDeg = nodes
      .join(e.groupBy(col("src").as("node"))
          .agg(count(lit(1)).as("outdeg")),
        Seq("node"), "left")
      .persist()
    val nNodes = nodesDeg.count()
    if (nNodes == 0) {
      e.unpersist(); nodesDeg.unpersist()
      return nodesDeg.select(col("node"))
        .withColumn("rank_micro", lit(0L)).limit(0)
    }
    val base = (1000L - dampPermille) * 1000000L / 1000L
    var ranks = nodesDeg.withColumn("rank_micro", lit(1000000L)).persist()
    ranks.count()
    for (_ <- 1 to iters) {
      // one-row dangling-mass aggregate over the cached generation;
      // broadcast below so the scalar never detours through the driver
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
          (lit(base) + expr(
            s"($dampPermille * (coalesce(in_sum, CAST(0 AS BIGINT)) + " +
              s"(dang div CAST($nNodes AS BIGINT)))) div 1000"))
            .as("rank_micro"))
        .persist()
      next.count()
      ranks.unpersist()
      ranks = next
    }
    val out = ranks.select(col("node"), col("rank_micro"))
      .orderBy(col("node"))
    e.unpersist(); nodesDeg.unpersist()
    out
  }

  /** Driver-side leg of [[pageRank]]'s small-graph cutover: the
    * identical integer recurrence over index-compressed arrays — one
    * contrib sweep per iteration, no per-iteration jobs at all.
    * `e` is the caller's persisted distinct (src, dst) frame; released
    * here. Result is re-distributed via parallelize so the output is a
    * self-contained leaf like the distributed path's persisted ranks. */
  private def localPageRank(e: DataFrame,
      idType: org.apache.spark.sql.types.DataType, iters: Int,
      dampPermille: Int): DataFrame = {
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val spark = e.sparkSession
    val pairs = e.select(col("src").cast("long"), col("dst").cast("long"))
      .collect()
    e.unpersist(false)
    // index-compress node ids (insertion order is irrelevant: every
    // per-node term is independent, the only cross-node reductions are
    // integer sums)
    val idx = scala.collection.mutable.LongMap.empty[Int]
    def ensure(x: Long): Int =
      idx.getOrElse(x, { val i = idx.size; idx.update(x, i); i })
    val srcIdx = new Array[Int](pairs.length)
    val dstIdx = new Array[Int](pairs.length)
    var i = 0
    while (i < pairs.length) {
      srcIdx(i) = ensure(pairs(i).getLong(0))
      dstIdx(i) = ensure(pairs(i).getLong(1))
      i += 1
    }
    val n = idx.size
    if (n == 0) {
      val schema = StructType(Seq(
        StructField("node", LongType, nullable = true),
        StructField("rank_micro", LongType, nullable = false)))
      return spark.createDataFrame(
          spark.sparkContext.emptyRDD[Row], schema)
        .select(col("node").cast(idType).as("node"), col("rank_micro"))
    }
    val outdeg = new Array[Long](n)
    i = 0
    while (i < pairs.length) { outdeg(srcIdx(i)) += 1L; i += 1 }
    val base = (1000L - dampPermille) * 1000000L / 1000L
    var ranks = Array.fill(n)(1000000L)
    for (_ <- 1 to iters) {
      var dang = 0L
      var v = 0
      while (v < n) { if (outdeg(v) == 0L) dang += ranks(v); v += 1 }
      val dangShare = dang / n
      // contrib(src) = rank div outdeg, computed once per src
      val contrib = new Array[Long](n)
      v = 0
      while (v < n) {
        if (outdeg(v) != 0L) contrib(v) = ranks(v) / outdeg(v)
        v += 1
      }
      val inSum = new Array[Long](n)
      i = 0
      while (i < pairs.length) {
        inSum(dstIdx(i)) += contrib(srcIdx(i)); i += 1
      }
      val next = new Array[Long](n)
      v = 0
      while (v < n) {
        next(v) = base + dampPermille * (inSum(v) + dangShare) / 1000L
        v += 1
      }
      ranks = next
    }
    val rows: Seq[Row] =
      idx.iterator.map { case (id, ix) => Row(id, ranks(ix)) }.toSeq
    val slices = math.max(1, math.min(
      spark.sparkContext.defaultParallelism, rows.length / 65536 + 1))
    val schema = StructType(Seq(
      StructField("node", LongType, nullable = true),
      StructField("rank_micro", LongType, nullable = false)))
    spark.createDataFrame(spark.sparkContext.parallelize(rows, slices),
        schema)
      .select(col("node").cast(idType).as("node"), col("rank_micro"))
      .orderBy(col("node"))
  }
}
