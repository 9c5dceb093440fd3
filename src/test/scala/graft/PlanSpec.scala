package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

/** Physical-plan assertions for the scale posture README/BASELINE
  * claim: predicates reach the parquet scan as PushedFilters and
  * projections prune ReadSchema — not just "the answer is right", but
  * "the plan is the one a 100 TB run needs". */
class PlanSpec extends SparkSpec {

  /** All parquet scans in the executed plan (post-AQE initial plan). */
  private def scans(df: DataFrame): Seq[FileSourceScanExec] =
    df.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s
    } match {
      case Nil => // AQE wraps the plan; look through it
        df.queryExecution.executedPlan
          .collect { case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => a.initialPlan }
          .flatMap(_.collect { case s: FileSourceScanExec => s })
      case ss => ss
    }

  test("filter pushdown: a selective predicate reaches the parquet scan") {
    val df = Tables.orders(spark, sf).filter(col("o_orderkey") === 42L)
    val sc = scans(df)
    assert(sc.nonEmpty)
    val pushed = sc.head.metadata("PushedFilters")
    assert(pushed.contains("EqualTo(o_orderkey,42)"), pushed)
  }

  test("column pruning: a 2-column projection reads a 2-column schema") {
    val df = Tables.lineitem(spark, sf)
      .select(col("l_orderkey"), col("l_quantity"))
    val sc = scans(df)
    assert(sc.nonEmpty)
    val read = sc.head.metadata("ReadSchema")
    assert(read.contains("l_orderkey") && read.contains("l_quantity"))
    assert(!read.contains("l_comment") && !read.contains("l_extendedprice"),
      read)
  }

  test("gate queries keep pushdown through their own plans (p8, w2)") {
    val p8 = SparkEntry.queries("p8_watermark_filter")(spark, sf)
    val p8scan = scans(p8).find(_.metadata("Location").contains("events"))
    assert(p8scan.exists(
      !_.metadata("PushedFilters").replace("[]", "").isEmpty),
      s"p8 pushed nothing: ${p8scan.map(_.metadata("PushedFilters"))}")
    val w2 = SparkEntry.queries("w2_ordered_export")(spark, sf)
    val w2scan = scans(w2)
    assert(w2scan.nonEmpty)
    assert(!w2scan.head.metadata("ReadSchema").contains("l_comment"),
      w2scan.head.metadata("ReadSchema"))
  }
}
