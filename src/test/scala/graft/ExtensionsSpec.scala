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
}
