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

    final case class J(id: Int, site: String, t0: Long, var ms: Long)
    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, J]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        // attribute via the result stage's callsite: the first graft
        // frame in its details stack, else the stage name
        val si = e.stageInfos.sortBy(-_.stageId).headOption
        val site = si.map { s =>
          s.details.linesIterator
            .find(l => l.contains("graft.") && !l.contains("ProfileGate"))
            .map(_.trim.stripPrefix("at "))
            .getOrElse(s.name.takeWhile(_ != '\n'))
        }.getOrElse("?")
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
