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

  test("register() into an existing session is idempotent and guarded") {
    val shared = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val cosine = new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")
      val md5p = new org.apache.spark.sql.catalyst.FunctionIdentifier("md5_prefix64")
      assert(!s.sessionState.functionRegistry.functionExists(cosine))
      // pre-register a sentinel under md5_prefix64: the guarded register
      // must SKIP it (functionExists) rather than replace it, while still
      // registering the absent cosine_sim
      val sentinel: Seq[org.apache.spark.sql.catalyst.expressions.Expression] =>
          org.apache.spark.sql.catalyst.expressions.Expression =
        _ => org.apache.spark.sql.catalyst.expressions.Literal(42L)
      s.sessionState.functionRegistry.registerFunction(md5p,
        new org.apache.spark.sql.catalyst.expressions.ExpressionInfo(
          "sentinel", "md5_prefix64"), sentinel)
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      assert(s.sessionState.functionRegistry.functionExists(cosine))
      assert(s.sessionState.functionRegistry.lookupFunctionBuilder(md5p)
        .exists(_ eq sentinel), "guarded register must not replace an existing function")
      // and a second full call is a no-op, not a warning-logging replace
      org.apache.spark.sql.graft.GraftExtensions.register(s)
      assert(s.sessionState.functionRegistry.lookupFunctionBuilder(md5p)
        .exists(_ eq sentinel))
      val r = s.sql(
        """SELECT round(cosine_sim(
          |  CAST(array(3.0, 0.0) AS ARRAY<FLOAT>),
          |  CAST(array(3.0, 0.0) AS ARRAY<FLOAT>)), 6) AS c""".stripMargin)
        .collect().head.getDouble(0)
      assert(r == 1.0)
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }

  test("bloom_build/bloom_might_contain are callable from SQL text") {
    val shared = SparkSpec.session
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    try {
      val s = SparkSession.builder()
        .master("local[4]")
        .withExtensions(new org.apache.spark.sql.graft.GraftExtensions()(_))
        .config("spark.sql.shuffle.partitions", "2")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
      val bytes = s.sql(
        "SELECT bloom_build(CAST(h AS BIGINT), 1024, 0.03) FROM VALUES (7), (13), (99) t(h)")
        .collect().head.getAs[Array[Byte]](0)
      // probe with the built filter inlined as a binary literal (the
      // foldable-filter contract bloom_might_contain enforces)
      val hex = bytes.map(b => f"${b & 0xff}%02x").mkString
      val probes = s.sql(
        s"SELECT bloom_might_contain(X'$hex', 13L), bloom_might_contain(X'$hex', 101L)")
        .collect().head
      assert(probes.getBoolean(0), "inserted value must probe true")
      // 101 was never inserted: overwhelmingly false at fpp=0.03 (and
      // deterministic — asserted so a hashing regression can't hide)
      assert(!probes.getBoolean(1))
    } finally {
      SparkSession.setActiveSession(shared)
      SparkSession.setDefaultSession(shared)
    }
  }
}
