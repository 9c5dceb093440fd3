package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession

/** Optimization-round measurement aid: run ONE catalog gate with a
  * job-level listener and print every Spark job's wall time and call
  * site, so fixture-heavy gates (index lifecycles, MV refreshes) can be
  * attributed job by job instead of guessed at. Measurement only — no
  * query semantics; not part of the driver contract.
  *
  * usage: runMain graft.tools.ProfileGate <sfDir> <gate> [reps]
  */
object ProfileGate {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val gate = args(1)
    val reps = if (args.length > 2) args(2).toInt else 1
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // StageInfo.shuffleDepId is private[spark]; reflection is fine in a
    // measurement-only tool
    val shuffleDepIdField = {
      val f = classOf[org.apache.spark.scheduler.StageInfo]
        .getDeclaredField("shuffleDepId")
      f.setAccessible(true); f
    }
    def shuffleDepIdOf(s: org.apache.spark.scheduler.StageInfo): Option[_] =
      shuffleDepIdField.get(s).asInstanceOf[Option[_]]

    // a compact signature of what the job's stages compute: the distinct
    // operator scope names of their RDDs (scan/exchange/join kinds)
    def scopeSig(e: SparkListenerJobStart): String =
      e.stageInfos.flatMap(_.rddInfos).flatMap(_.scope.map(_.name))
        .distinct.sorted.mkString(",")

    final case class J(id: Int, site: String, t0: Long, var ms: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // attribute via the result stage's callsite: the first graft
        // frame in its details stack, else the job's captured
        // callSite.long property (future-submitted broadcast/AQE-stage
        // jobs inherit the submitting action's thread-locals), else the
        // stage name
        val si = e.stageInfos.sortBy(-_.stageId).headOption
        def graftFrame(text: String): Option[String] =
          text.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileGate"))
            .map(_.trim.stripPrefix("at "))
        // future-submitted jobs (no graft frame anywhere): classify by
        // framework frames so broadcast builds and AQE shuffle-stage
        // materializations are counted separately
        def classify(s: org.apache.spark.scheduler.StageInfo): String =
          // a map-stage job (submitMapStage: its top stage carries a
          // shuffleDepId) is an AQE shuffle-stage materialization; a
          // future-submitted collect job is a broadcast build
          if (shuffleDepIdOf(s).isDefined)
            "future:aqe-shuffle-stage [" + scopeSig(e) + "]"
          else if (s.name.contains("CompletableFuture"))
            "future:broadcast-build [" + scopeSig(e) + "]"
          else "future:" + s.name.takeWhile(_ != '\n')
        val site = si.flatMap(s => graftFrame(s.details))
          .orElse(Option(e.properties)
            .flatMap(p => Option(p.getProperty("callSite.long")))
            .flatMap(graftFrame)
            .map("future@" + _))
          .orElse(si.map(classify))
          .getOrElse("?")
        jobs.put(e.jobId, J(e.jobId, site, System.nanoTime(), -1L))
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        val j = jobs.get(e.jobId)
        if (j != null) j.ms = (System.nanoTime() - j.t0) / 1000000L
      }
    })

    val fn = graft.SparkEntry.queries(gate)
    for (r <- 1 to reps) {
      jobs.clear()
      val t0 = System.nanoTime()
      val df = fn(spark, sfDir)
      val t1 = System.nanoTime()
      df.queryExecution.toRdd.count()
      val t2 = System.nanoTime()
      Thread.sleep(200) // let listener drain
      import scala.jdk.CollectionConverters._
      val all = jobs.values().asScala.toSeq.sortBy(_.id)
      println(f"== rep $r: setup ${(t1 - t0) / 1e9}%.2f s, query ${(t2 - t1) / 1e9}%.2f s, jobs ${all.size}")
      val bySite = all.groupBy(_.site).toSeq
        .map { case (s, js) => (s, js.size, js.map(_.ms).sum) }
        .sortBy(-_._3)
      bySite.take(40).foreach { case (s, n, ms) =>
        println(f"  $ms%7d ms  n=$n%-4d $s")
      }
      println(f"  job-sum ${all.map(_.ms).sum} ms")
    }
    spark.stop()
  }
}
