package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** GraftExtensions: functions resolvable from pure SQL in a session
  * built through the extension hook. */
class ExtensionsSpec extends AnyFunSuite {

  lazy val spark: SparkSession = SparkSpec.session

  test("injected functions usable from SQL") {
    val r = spark.sql(
      """SELECT graft_poly_hash('ab') AS h,
                graft_tokenize('  A b  C ') AS toks,
                graft_cosine(array(1.0D, 0.0D), array(1.0D, 0.0D)) AS cos,
                graft_lang_id('the cat and the dog of it') AS lang,
                graft_simhash32('hello world hello') AS sh
      """).collect()(0)
    assert(r.getLong(0) == 3105L) // (0*31+97)*31+98
    assert(r.getSeq[String](1) == Seq("a", "b", "c"))
    assert(r.getDouble(2) == 1.0)
    assert(r.getString(3) == "en")
    assert(r.getLong(4) != 0L)
  }

  test("bloom kernels: SQL aggregate builds a sketch the probe accepts") {
    spark.range(0, 1000).createOrReplaceTempView("bloom_src")
    // the probe's bloom side must be a constant or scalar subquery
    // (BloomFilterMightContain contract) — the subquery form is the
    // whole point: build + probe in ONE distributed statement
    val probe = spark.sql(
      """SELECT id, graft_bloom_might_contain(
           (SELECT graft_bloom_agg(xxhash64(id), 2000L, 16384L)
            FROM bloom_src WHERE id % 2 = 0),
           xxhash64(id)) AS hit
         FROM bloom_src""")
    // every inserted element answers true; the complement has only
    // fpp noise (sketch sized generously, so well under 10% here)
    val evens = probe.filter("id % 2 = 0 AND NOT hit").count()
    val oddHits = probe.filter("id % 2 = 1 AND hit").count()
    assert(evens == 0, "an inserted element can never answer false")
    assert(oddHits < 50, s"fpp noise out of bounds: $oddHits/500")
  }

  test("graft_cms_sketch from SQL: row sums account for every input") {
    spark.range(0, 500).createOrReplaceTempView("cms_src")
    val cells = spark.sql(
      """SELECT graft_cms_sketch(id % 37, 2, 16).cells AS c
         FROM cms_src""").head.getSeq[Long](0)
    assert(cells.length == 32)
    assert(cells.slice(0, 16).sum == 500L && cells.slice(16, 32).sum == 500L)
  }

  test("graft_cms_sketch rejects non-integral input at analysis time") {
    spark.range(0, 5).selectExpr("cast(id as string) AS s")
      .createOrReplaceTempView("cms_bad_src")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      spark.sql("SELECT graft_cms_sketch(s, 2, 16) FROM cms_bad_src")
        .collect()
    }
    assert(e.getMessage.contains("integral"), e.getMessage)
  }
}
