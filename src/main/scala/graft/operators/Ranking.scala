package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact global ranking WITHOUT a global sort.
  *
  * A naive `row_number() OVER (ORDER BY key)` funnels the whole dataset
  * through ONE window partition — the classic scale-killer. When the
  * primary key has bounded cardinality (an integer score, a bucketed
  * metric — here: a quality score in 0..~10⁴ millis), the exact global
  * rank decomposes:
  *
  *   rank(row) = offset(coarse)  +  row_number within its coarse group
  *
  * where offset = running count of all smaller coarse values. The
  * histogram of coarse values is tiny regardless of corpus size, so its
  * running-sum window is driver-scale work; the per-group row_numbers
  * are an ordinary DISTRIBUTED window partitioned by coarse value. Net:
  * one aggregation + one broadcast join + one partitioned window — the
  * 100 TB corpus is never globally sorted, yet every row gets the exact
  * rank a global sort would give it (ties broken by `fine`).
  */
object Ranking {

  /** Reject inputs whose columns collide with the working/output names
    * (silent overwrite would corrupt results — cf. the exactDedup _fp
    * collision class). */
  private def requireFree(df: DataFrame, names: String*): Unit = {
    val clash = names.filter(df.columns.contains)
    require(clash.isEmpty,
      s"input frame already has column(s) ${clash.mkString(", ")}")
  }

  /** Adds `global_rank` (1-based, dense total order by (coarse, fine)).
    * `coarse` must be bounded-cardinality; `fine` must make (coarse,
    * fine) unique for a deterministic total order. */
  def globalRankByCoarseKey(df: DataFrame, coarse: String,
      fine: String): DataFrame = {
    requireFree(df, "_offset", "_coarse_k", "global_rank")
    val hist = df.groupBy(col(coarse)).agg(count(lit(1)).as("_cnt"))
    // running-sum over the HISTOGRAM only (bounded rows) — the single
    // partition here is by design, not a leak
    val wOff = Window.orderBy(col(coarse))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("_offset", coalesce(sum(col("_cnt")).over(wOff), lit(0L)))
      .drop("_cnt")
    val wIn = Window.partitionBy(col(coarse)).orderBy(col(fine))
    // null-safe join: a NULL coarse group is legal (window partitioning
    // groups nulls; orderBy sorts them first, so they rank lowest) —
    // a plain equi-join would silently drop those rows
    df.join(broadcast(offsets.withColumnRenamed(coarse, "_coarse_k")),
        col(coarse) <=> col("_coarse_k"))
      .drop("_coarse_k")
      .withColumn("global_rank",
        col("_offset") + row_number().over(wIn).cast("long"))
      .drop("_offset")
  }

  /** Exact global INCLUSIVE prefix sum of `valueCol` in (coarse, fine)
    * order, same decomposition as [[globalRankByCoarseKey]]: per-group
    * value totals make a bounded histogram whose running sum gives each
    * group's offset; a distributed window partitioned by the coarse key
    * finishes the within-group cumsum. Powers budgeted selection
    * ("take the best docs until N tokens") without a global sort. */
  def globalPrefixSum(df: DataFrame, coarse: String, fine: String,
      valueCol: String, as: String = "cum_value"): DataFrame = {
    requireFree(df, "_voff", "_coarse_k", as)
    val hist = df.groupBy(col(coarse))
      .agg(sum(col(valueCol).cast("long")).as("_vsum"))
    val wOff = Window.orderBy(col(coarse))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = hist
      .withColumn("_voff", coalesce(sum(col("_vsum")).over(wOff), lit(0L)))
      .drop("_vsum")
    val wIn = Window.partitionBy(col(coarse)).orderBy(col(fine))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.join(broadcast(offsets.withColumnRenamed(coarse, "_coarse_k")),
        col(coarse) <=> col("_coarse_k"))
      .drop("_coarse_k")
      .withColumn(as,
        col("_voff") + sum(col(valueCol).cast("long")).over(wIn))
      .drop("_voff")
  }

  /** Equal-frequency bucket assignment on top of
    * [[globalRankByCoarseKey]]: bucket = ((rank−1)·n) div N + 1 —
    * integer quantile arithmetic (NOT SQL ntile: ntile places all
    * remainder rows in the leading buckets, this spreads them evenly;
    * any bucket's size differs from ntile's by at most one row). */
  def curriculumBuckets(df: DataFrame, coarse: String, fine: String,
      nBuckets: Int): DataFrame = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    requireFree(df, "_n", "bucket")
    val ranked = globalRankByCoarseKey(df, coarse, fine)
    val total = df.agg(count(lit(1)).as("_n"))
    ranked.crossJoin(broadcast(total))
      .withColumn("bucket",
        expr(s"((global_rank - 1) * $nBuckets) div _n") + 1)
      .drop("_n")
  }

  /** Per-key top-N cap (CommonCrawl-style per-domain document cap),
    * hot-key safe: a window partitioned by key ALONE funnels every row
    * of a hot domain through one task. Phase 1 ranks within (key,
    * shard-of-tiebreaker) and keeps ≤ n per shard — the per-key top-n
    * is a subset of that union — so phase 2's per-key window sees at
    * most shards·n rows regardless of domain size (the v8 quantized-
    * search shard-bound, applied to ranking). Adds 1-based `rank`;
    * `order` must give a deterministic total order within a key. */
  def topNPerKey(df: DataFrame, key: Column, order: Seq[Column], n: Int,
      shardBy: Column, shards: Int = 32): DataFrame = {
    require(n > 0 && shards > 0, s"n and shards must be positive")
    requireFree(df, "_shard", "_srank", "rank")
    val w1 = Window.partitionBy(key, col("_shard")).orderBy(order: _*)
    val w2 = Window.partitionBy(key).orderBy(order: _*)
    df.withColumn("_shard", pmod(shardBy, lit(shards)))
      .withColumn("_srank", row_number().over(w1))
      .filter(col("_srank") <= n)
      .withColumn("rank", row_number().over(w2))
      .filter(col("rank") <= n)
      .drop("_shard", "_srank")
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher, SIGIR 2009)
    * of N independently ranked lists over one id space — the standard
    * way to combine a sparse (BM25) and a dense (embedding) retriever
    * without score calibration, since only RANKS enter the fusion.
    * Each list contributes `scale div (kConst + rank)` to its ids
    * (INTEGER division — the float 1/(k+r) form ties unpredictably
    * across engines; kConst=60 per the paper); an id absent from a
    * list simply receives nothing (union semantics). Output:
    * `(rank, <idCol>, rrf_score, n_lists)` for the top `k` fused ids,
    * ties broken by id.
    *
    * Scale: inputs are top-k-sized ranked lists by contract, so the
    * union + id-keyed aggregate shuffles O(N·k) narrow rows — fusion
    * cost is independent of corpus size, and the final ordering runs
    * on an aggregate that is already ≤ N·k rows. */
  def rrfFuse(ranked: Seq[DataFrame], idCol: String, rankCol: String,
      k: Int, kConst: Long = 60L, scale: Long = 1000000L): DataFrame = {
    require(ranked.nonEmpty, "rrfFuse needs at least one ranked list")
    require(k > 0 && kConst >= 0 && scale > 0, "bad rrf parameters")
    // same collision class requireFree rejects elsewhere: an id column
    // named like a working/output column would be silently overwritten
    // (idCol = "rank" would emit the fusion rank twice and lose the ids)
    require(!Seq("__c", "rrf_score", "n_lists", "rank").contains(idCol),
      s"idCol '$idCol' collides with rrfFuse working/output columns " +
        "(__c, rrf_score, n_lists, rank)")
    // ranks must be 1-based: a 0-based list with kConst=0 would divide
    // by zero — which integer `div` resolves to NULL, so sum() would
    // SILENTLY drop the list's best document's contribution (and a
    // negative rank would contribute with the wrong sign). Fail loudly
    // per row instead — the inputs are k-sized ranked lists by
    // contract, so the guard costs nothing measurable.
    // Column API with backtick-quoted identifiers (no SQL-string
    // splicing): a column named with spaces/dots/hyphens resolves like
    // any other — col() alone would parse a dot as struct access
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    val contrib = ranked.map(_.select(q(idCol),
      when(q(rankCol) >= 1,
        graft.queries.Exact.idiv(lit(scale),
          lit(kConst) + q(rankCol).cast("long")))
        .otherwise(raise_error(concat(
          lit(s"rrfFuse: rank column '$rankCol' must be >= 1, got "),
          coalesce(q(rankCol).cast("string"), lit("null")))))
        .as("__c")))
    contrib.reduce(_ unionByName _)
      .groupBy(q(idCol))
      .agg(sum(col("__c")).as("rrf_score"), count(lit(1)).as("n_lists"))
      .orderBy(col("rrf_score").desc, q(idCol))
      .limit(k)
      // single-partition window is safe here: it ranks the ≤ k rows
      // the limit already reduced to (the bm25TopK output pattern)
      .withColumn("rank", row_number().over(
        Window.orderBy(col("rrf_score").desc, q(idCol))))
      .select(col("rank").cast("long").as("rank"), q(idCol),
        col("rrf_score"), col("n_lists"))
  }
}
