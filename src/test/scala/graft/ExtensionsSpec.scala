package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** cosine_sim must be callable from SQL text when the session is built
  * with GraftExtensions (SparkSessionExtensions → injectFunction). */
class ExtensionsSpec extends AnyFunSuite {

  test("cosine_sim registered via spark.sql.extensions is callable from SQL") {
    val shared = SparkSpec.session // ensure the shared context exists
    // extensions bind at session build time; a fresh session over the same
    // SparkContext picks them up (getOrCreate would return the shared one)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      // `spark.sql.extensions` is a STATIC conf (read from the SparkContext
      // at first-session build); over a pre-existing test context the
      // programmatic Builder.withExtensions hook applies the same class
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val r = s.sql(
        """SELECT round(cosine_sim(
          |  CAST(array(1.0, 2.0) AS ARRAY<FLOAT>),
          |  CAST(array(2.0, 4.0) AS ARRAY<FLOAT>)), 6) AS c""".stripMargin)
        .collect().head.getDouble(0)
      assert(r == 1.0)
      // the un-extended shared session must NOT see the function
      intercept[Exception] {
        shared.sql("SELECT cosine_sim(CAST(array(1.0) AS ARRAY<FLOAT>), CAST(array(1.0) AS ARRAY<FLOAT>))")
      }
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
