package graft

import graft.io.ManagedParquetTable
import graft.similarity.IncrementalIvfPqIndex
import graft.similarity.VectorFunctions._
import org.apache.spark.sql.functions._

/** Persisted IVF-PQ index (v17): maintained ≡ rebuild under the frozen
  * training artifacts, stored search ≡ per-run search, and probe plans
  * open only the files covering the probed inverted lists. */
class IvfPqIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Dim = 64
  private val M = 4
  private val Ksub = 16
  lazy val e = Tables.embeddings(spark, sf)

  test("change-feed maintenance is exactly rebuild-equivalent; stored " +
      "search equals the per-run derivation (recall identical by identity)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim)
    val cents = e.filter($"vec_id" < 16)
    val cbs = pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim)
    intercept[IllegalArgumentException] {
      idx.refresh() // refresh before train must fail loudly
    }
    idx.train(cents, cbs)
    intercept[IllegalArgumentException] {
      idx.train(cents, cbs) // retrain = silent index corruption; refuse
    }
    src.append(e.filter($"vec_id" % 2 === 0))
    idx.refresh()
    assert(idx.lastRefresh == "full")
    src.append(e.filter($"vec_id" % 2 === 1))
    idx.refresh()
    assert(idx.lastRefresh == "incremental")
    idx.refresh()
    assert(idx.lastRefresh == "noop")
    // dv delete and a scattered rewriting delete both maintain
    src.deleteWhereDV($"vec_id" % 5 === 0)
    idx.refresh()
    assert(idx.lastRefresh == "incremental")
    src.deleteWhere($"vec_id" % 7 === 1)
    idx.refresh()
    assert(idx.lastRefresh == "incremental")
    // content identity vs a from-scratch encode of the live set under
    // the SAME frozen artifacts — (id, centroid_id, codes) rows match
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList)
    val maintained = idx.read()
      .select($"vec_id", $"centroid_id", $"codes")
      .collect().map(key).toSet
    val rebuilt = ivfPqEncode(src.read(), cents, cbs, M, Ksub, Dim)
      .select($"vec_id", $"centroid_id", $"codes")
      .collect().map(key).toSet
    assert(maintained == rebuilt,
      s"maintained ${maintained.size} vs rebuilt ${rebuilt.size}")
    // stored probe-pruned search ≡ the per-run composition on the live
    // corpus — row identity, so recall@k against brute force is
    // unchanged by construction
    val live = src.read()
    val qs = live.filter($"vec_id" < 12)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val stored = rows(idx.topK(qs, k = 5, nprobe = 4))
    val rederived = rows(ivfPqTopK(live, qs, cents, cbs,
      M, Ksub, Dim, k = 5, nprobe = 4))
    assert(stored == rederived)
  }

  test("crash-replayed refresh windows converge: basis rollback and a " +
      "half-applied window both heal without duplicate or lost rows") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_crash").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim)
    val cents = e.filter($"vec_id" < 16)
    val cbs = pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim)
    idx.train(cents, cbs)
    src.append(e.filter($"vec_id" % 2 === 0))
    idx.refresh()
    // SORTED-SEQ identity, not set identity: a replay that duplicated
    // rows would survive a set compare
    def state() = idx.read()
      .select($"vec_id", $"centroid_id", $"codes")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList))
      .sortBy(t => (t._1, t._2)).toSeq
    val basis = java.nio.file.Paths.get(s"$root/idx/_graft_index_basis")
    // --- crash A: the window committed fully but the basis publish was
    // lost (death between the index commit and publishBasis) ---
    val preWindow = java.nio.file.Files.readString(basis)
    src.append(e.filter($"vec_id" % 2 === 1))
    src.deleteWhereDV($"vec_id" % 5 === 0)
    idx.refresh()
    val committed = state()
    java.nio.file.Files.writeString(basis, preWindow) // roll the basis back
    idx.refresh() // full window replays
    assert(idx.lastRefresh == "incremental")
    assert(state() === committed,
      "replaying an already-applied window must be an exact no-op")
    // --- crash B: the window's drop commit landed but the re-encode
    // append did not (death between the two index commits) ---
    src.deleteWhere($"vec_id" % 7 === 1) // rewriting delete: survivors
    // re-emitted as delete+insert pairs in the change feed
    val ch = src.changesSince(java.nio.file.Files.readString(basis)
      .split("\n").head.trim.toLong)
    val windowKeys = ch.select($"vec_id").distinct()
    idx.table.deleteMatchingDV(windowKeys, Seq("vec_id")) // half-applied
    idx.refresh() // replay: drops again (no-op), then re-encodes
    assert(idx.lastRefresh == "incremental")
    val healed = state()
    val rebuilt = ivfPqEncode(src.read(), cents, cbs, M, Ksub, Dim)
      .select($"vec_id", $"centroid_id", $"codes")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList))
      .sortBy(t => (t._1, t._2)).toSeq
    assert(healed === rebuilt,
      s"healed ${healed.size} vs rebuilt ${rebuilt.size}")
  }

  test("a RECREATED source table (basis ahead of head) fails loudly — " +
      "the shared BasisTracker guard covers the vector maintainer too") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_regress").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim)
    idx.train(e.filter($"vec_id" < 16),
      pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim))
    src.append(e.filter($"vec_id" % 2 === 0))
    src.append(e.filter($"vec_id" % 2 === 1)) // head = 1
    idx.refresh()
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$root/t"), true)
    val src2 = new ManagedParquetTable(spark, s"$root/t")
    src2.append(e.limit(10)) // head = 0 < recorded basis 1
    val err = intercept[IllegalStateException] { idx.refresh() }
    assert(err.getMessage.contains("recreated") &&
      err.getMessage.contains("rebuild"))
  }

  test("reorg(): distribution drift decays recall under the frozen " +
      "artifacts, retraining from the live table restores it, " +
      "maintenance stays rebuild-exact after the swap, and an " +
      "interrupted reorg gates every entry point") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_reorg").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim)
    val eDrop = e.select($"vec_id", $"embedding")
    idx.train(e.filter($"vec_id" < 16),
      pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim))
    src.append(eDrop)
    idx.refresh()
    // DRIFT window: 10 tight clusters (10 members each) around anchor
    // directions the frozen training never saw. Under the old
    // centroids the clusters blend into shared lists, so a
    // single-probe search reads the wrong neighborhood and the old
    // codebooks cannot separate siblings from cousins — the canonical
    // recall decay an IVF-PQ deployment REORGs away.
    val anchors = e.filter($"vec_id" >= 100 && $"vec_id" < 110)
      .select(($"vec_id" - 100).as("aid"), $"embedding".as("av"))
    val drift = eDrop.filter($"vec_id" < 100)
      .withColumn("aid", $"vec_id" % 10)
      .join(anchors, "aid")
      .select(($"vec_id" + 10000L).as("vec_id"),
        zip_with($"av", $"embedding",
          (a, x) => (a * lit(2.0f) + x * lit(0.3f)).cast("float"))
          .as("embedding"))
    src.append(drift)
    idx.refresh()
    val live = src.read()
    val qs = live.filter($"vec_id" >= 10000L && $"vec_id" < 10008L)
    // k = 9: a drift query's true neighborhood is its 9 cluster siblings
    val truth = bruteForceTopK(live, qs, k = 9)
      .select($"query_id", $"neighbor_id")
      .as[(Long, Long)].collect().groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    def recall(ann: org.apache.spark.sql.DataFrame): Int = {
      val got = ann.select($"query_id", $"neighbor_id")
        .as[(Long, Long)].collect().groupBy(_._1)
        .view.mapValues(_.map(_._2).toSet).toMap
      truth.map { case (qid, t) =>
        (got.getOrElse(qid, Set.empty[Long]) intersect t).size }.sum
    }
    val total = truth.values.map(_.size).sum
    val before = recall(idx.topK(qs, k = 9, nprobe = 1))
    idx.reorg(iters = 3)
    val after = recall(idx.topK(qs, k = 9, nprobe = 1))
    info(s"drifted-query recall@9: before=$before after=$after of $total")
    // measured on this deterministic fixture: 29 -> 64 of 72. The
    // margins leave room for testdata regen without losing the story.
    assert(before < after,
      s"reorg must restore recall: $before -> $after of $total")
    assert(after * 10 >= total * 7,
      s"post-reorg recall must clear 70%: $after of $total")
    // maintenance after the swap is rebuild-exact under the NEW
    // artifacts (the refresh loop encodes with whatever is frozen NOW)
    src.append(e.select(($"vec_id" + 20000L).as("vec_id"), $"embedding"))
    idx.refresh()
    assert(idx.lastRefresh == "incremental")
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList)
    val maintained = idx.read()
      .select($"vec_id", $"centroid_id", $"codes")
      .collect().map(key).toSet
    val rebuilt = ivfPqEncode(src.read(), idx.centroids, idx.codebooks,
        M, Ksub, Dim)
      .select($"vec_id", $"centroid_id", $"codes")
      .collect().map(key).toSet
    assert(maintained == rebuilt,
      s"maintained ${maintained.size} vs rebuilt ${rebuilt.size}")
    // an interrupted reorg (marker left behind) must gate EVERY entry
    // point: codes and codebooks may disagree, and a served score from
    // that state is wrong, not stale
    val marker = java.nio.file.Paths
      .get(s"$root/idx/_graft_reorg_inflight")
    java.nio.file.Files.createFile(marker)
    intercept[IllegalArgumentException] { idx.refresh() }
    intercept[IllegalArgumentException] { idx.topK(qs, k = 5, nprobe = 2) }
    intercept[IllegalArgumentException] { idx.read() }
    // reorg() is also the recovery entry point: a leftover marker
    // rolls back first (here: nothing was swapped), then the reorg
    // re-runs to completion
    idx.reorg(iters = 1)
    assert(!java.nio.file.Files.exists(marker))
    idx.refresh()
    assert(idx.lastRefresh == "noop")
  }

  test("reorg() crash inside the swap window: entry points refuse the " +
      "mixed state, recoverReorg discards staging and restores the " +
      "committed pre-reorg index, a re-run completes, maintained == " +
      "rebuilt") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_crash").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim)
    idx.train(e.filter($"vec_id" < 16),
      pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim))
    src.append(e.select($"vec_id", $"embedding"))
    idx.refresh()
    val qs = e.filter($"vec_id" < 5)
    def probe() = idx.topK(qs, k = 5, nprobe = 4)
      .select($"query_id", $"rank", $"neighbor_id")
      .as[(Long, Long, Long)].collect().toSeq
      .sortBy(t => (t._1, t._2))
    val preReorg = probe()
    val preBasis = idx.basis
    // kill the swap before rename 0 (marker only), 1 (live lists moved
    // aside, staged not yet promoted), 2 (lists swapped, artifacts
    // not), and 5 (everything but the last codebook rename): every
    // window must refuse service and roll back to the pre-reorg state
    for (n <- Seq(0, 1, 2, 5)) {
      idx.crashBeforeMove = n
      val ex = intercept[RuntimeException] { idx.reorg(iters = 1) }
      assert(ex.getMessage.contains("forged crash"), ex.getMessage)
      intercept[IllegalArgumentException] { idx.read() }
      intercept[IllegalArgumentException] { idx.topK(qs, 5, 4) }
      intercept[IllegalArgumentException] { idx.refresh() }
      idx.crashBeforeMove = -1
      idx.recoverReorg()
      assert(probe() === preReorg,
        s"rollback after a crash at rename $n must serve the " +
          "committed pre-reorg state")
      assert(idx.basis == preBasis,
        "rollback must leave the pre-reorg basis (the new basis only " +
          "publishes after a completed swap)")
    }
    // the other recovery path: re-running reorg() itself rolls the dead
    // swap back, then completes
    idx.crashBeforeMove = 3
    intercept[RuntimeException] { idx.reorg(iters = 1) }
    idx.crashBeforeMove = -1
    idx.reorg(iters = 1)
    idx.refresh()
    assert(idx.lastRefresh == "noop")
    // maintenance after the recovered reorg is rebuild-exact under the
    // swapped-in artifacts
    src.append(e.select(($"vec_id" + 20000L).as("vec_id"), $"embedding"))
    idx.refresh()
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList)
    val maintained = idx.read()
      .select($"vec_id", $"centroid_id", $"codes")
      .collect().map(key).toSet
    val rebuilt = ivfPqEncode(src.read(), idx.centroids, idx.codebooks,
        M, Ksub, Dim)
      .select($"vec_id", $"centroid_id", $"codes")
      .collect().map(key).toSet
    assert(maintained == rebuilt,
      s"maintained ${maintained.size} vs rebuilt ${rebuilt.size}")
  }

  test("long horizon: 30 windows of append/dv-delete/rewriting-delete " +
      "with compactDeletes and vacuum interleaved; maintained lists == " +
      "a from-scratch encode of the live table at every window") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_horizon").toString
    val rnd = new scala.util.Random(509)
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim)
    val cents = e.filter($"vec_id" < 16)
    val cbs = pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim)
    idx.train(cents, cbs)
    val eDrop = e.select($"vec_id", $"embedding")
    val pool = eDrop.select($"vec_id").as[Long].collect().toVector
    // live ids tracked driver-side so delete batches target real rows
    val live = collection.mutable.Set.empty[Long]
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), r.getLong(1), r.getSeq[Int](2).toList)
    def check(w: Int): Unit = {
      val maintained = idx.read()
        .select($"vec_id", $"centroid_id", $"codes")
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      val rebuilt = ivfPqEncode(src.read(), cents, cbs, M, Ksub, Dim)
        .select($"vec_id", $"centroid_id", $"codes")
        .collect().map(key).sortBy(k => (k._1, k._2)).toSeq
      assert(maintained === rebuilt,
        s"window $w: maintained ${maintained.size} vs rebuilt ${rebuilt.size}")
    }
    val init = rnd.shuffle(pool).take(80)
    src.append(eDrop.where($"vec_id".isin(init: _*)))
    live ++= init
    idx.refresh()
    check(0)
    for (w <- 1 to 30) {
      rnd.nextInt(10) match {
        case n if n < 5 => // append fresh vectors
          val fresh = rnd.shuffle((pool.toSet -- live).toSeq)
            .take(1 + rnd.nextInt(12))
          if (fresh.nonEmpty) {
            src.append(eDrop.where($"vec_id".isin(fresh: _*)))
            live ++= fresh
          }
        case n if n < 8 => // dv delete of live ids
          val victims = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(6))
          if (victims.nonEmpty) {
            src.deleteWhereDV($"vec_id".isin(victims: _*))
            live --= victims
          }
        case _ => // rewriting delete: survivors round-trip as
          // delete+insert pairs through the change feed
          val victims = rnd.shuffle(live.toSeq).take(1 + rnd.nextInt(4))
          if (victims.nonEmpty) {
            src.deleteWhere($"vec_id".isin(victims: _*))
            live --= victims
          }
      }
      idx.refresh()
      // hygiene at its own cadence: the index's own dv purge and the
      // SOURCE table's retention must not break the basis (the
      // per-window refresh keeps it inside the retained tail)
      if (w % 7 == 0) idx.table.compactDeletes(0.01) // near-always purge
      if (w % 9 == 0) src.vacuum(graceMs = 0L, retainVersions = Some(12L))
      check(w)
    }
    assert(live.nonEmpty, "fixture must end with live rows")
  }

  test("probe plan opens only the files covering the probed lists; " +
      "the pruned scan returns exactly the unpruned result") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_prune").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    // tiny rowsPerFile forces the bulk build to fan out into many
    // range-clustered files (the 100 TB layout at test scale)
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim, rowsPerFile = 50L)
    val cents = e.filter($"vec_id" < 16)
    val cbs = pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim)
    idx.train(cents, cbs)
    src.append(e)
    idx.refresh()
    val qs = e.filter($"vec_id" < 3)
    val (kept, total) = idx.probeFilePlan(qs, nprobe = 2)
    assert(total >= 8, s"build must fan out into many files, got $total")
    assert(kept < total,
      s"probe must skip unprobed lists' files: kept $kept of $total")
    // and the pruned read changes nothing: stored search == scoring the
    // FULL index frame with the same probes
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .select($"query_id", $"rank", $"neighbor_id", $"sim")
      .as[(Long, Int, Long, Double)].collect()
      .sortBy(r => (r._1, r._2)).toSeq
    val pruned = rows(idx.topK(qs, k = 10, nprobe = 2))
    val full = rows(storedIvfPqTopK(idx.read(),
      ivfPqProbes(qs, cents, cbs, M, Ksub, Dim, nprobe = 2),
      M, Ksub, k = 10))
    assert(pruned == full)
  }

  test("maintenancePlan: segment and tombstone pressure fire at their " +
      "thresholds and clear after the recommended actions; a torn " +
      "reorg preempts as the only row") {
    import graft.similarity.IvfPqMaintenancePolicy
    val root = java.nio.file.Files
      .createTempDirectory("graft_ivfpq_mp").toString
    val src = new ManagedParquetTable(spark, s"$root/t")
    val idx = new IncrementalIvfPqIndex(spark, s"$root/t", s"$root/idx",
      m = M, ksub = Ksub, dim = Dim)
    val pol = IvfPqMaintenancePolicy(maxListSegments = 4,
      maxLiveDvEntries = 2)
    val cents = e.filter($"vec_id" < 16)
    val cbs = pqTrain(e, m = M, ksub = Ksub, iters = 0, dim = Dim)
    idx.train(cents, cbs)
    assert(idx.maintenancePlan(pol).isEmpty, "untouched index: empty plan")
    // per-window appends accumulate lists-table segments
    for (w <- 0 until 4) {
      src.append(e.filter($"vec_id" % 4 === w))
      idx.refresh()
    }
    val p1 = idx.maintenancePlan(pol)
    assert(p1.exists(a => a.action == "compactLists" &&
      a.metric == "list_segments" && a.value >= 4),
      s"4 append windows must recommend a lists compaction: $p1")
    idx.table.compact()
    assert(idx.maintenancePlan(pol).isEmpty,
      "compact() satisfies the plan")
    // tombstone entries: forged directly on the lists table —
    // refresh()'s in-line compactDeletes(0.3) usually keeps entries
    // bounded; the signal exists for a table whose refresh cadence
    // lapsed while foreign dv commits landed
    val live = idx.read().select($"vec_id").as[Long]
      .collect().sorted.toSeq
    idx.table.deleteMatchingDV(Seq(live(0)).toDF("vec_id"), Seq("vec_id"))
    idx.table.deleteMatchingDV(Seq(live(1)).toDF("vec_id"), Seq("vec_id"))
    val p2 = idx.maintenancePlan(pol)
    assert(p2.exists(a => a.action == "compactDeletes" &&
      a.metric == "live_dv_entries" && a.value >= 2),
      s"2 live dv entries must recommend compactDeletes: $p2")
    // any positive threshold folds here: the forged entries tombstone
    // 2 rows of the single compacted segment, a tiny live fraction
    idx.table.compactDeletes(0.0001)
    assert(idx.maintenancePlan(pol).isEmpty,
      "a full compactDeletes clears the tombstone signal")
    // a torn reorg preempts everything else
    val marker = new java.io.File(s"$root/idx/_graft_reorg_inflight")
    assert(marker.createNewFile())
    val p3 = idx.maintenancePlan(pol)
    assert(p3.map(_.action) == Seq("recoverReorg"),
      s"recovery must be the ONLY row over a torn reorg: $p3")
    assert(marker.delete())
  }
}
