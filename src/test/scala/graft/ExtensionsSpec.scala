package graft

import graft.operators.Sessionize
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("dot_f is callable from SQL via GraftExtensions") {
    val shared = TestSpark.spark // materialize the shared session first
    // a fresh SparkSession over the same SparkContext, with extensions
    // applied (getOrCreate would return `shared` and skip them)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val s = SparkSession.builder()
      .master("local[2]")
      .withExtensions(new graft.plans.GraftExtensions)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    try {
      val got = s.sql(
        "SELECT dot_f(array(cast(1 as float), cast(2 as float)), " +
          "array(cast(3 as float), cast(4 as float))) AS d")
        .head.getDouble(0)
      assert(got === 11.0)
    } finally {
      SparkSession.setDefaultSession(shared)
      SparkSession.setActiveSession(shared)
    }
  }
}

class SessionizeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("typed flatMapGroups sessions equal the window-based w2_sessionize") {
    val win = SparkEntry.queries("w2_sessionize")(spark, TestSpark.sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toSet
    val typed = Sessionize.sessions(spark,
        Tables(spark, TestSpark.sfDir, "events"), gapUs = 1800L * 1000000L)
      .collect().map(s => (s.user_id, s.session_id, s.n_events, s.start_ms, s.end_ms))
      .toSet
    assert(typed === win)
  }
}
