package graft

import graft.operators.Candidates
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** [[Candidates.restrictToScalable]] — the hand-planted runtime-filter form
  * of candidate restriction for sets too big to broadcast. Bloom filters
  * have no false negatives, so the contract is EXACT equality with the
  * broadcast semi-join; the plan must show the map-side
  * `might_contain` prune and must NOT carry a broadcast hint on the id
  * set (Spark may still pick broadcast for the exact join at test scale —
  * what is pinned is that the corpus rows reaching that join are already
  * bloom-pruned). */
class BloomRestrictSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private lazy val corpus = spark.range(10000).select(col("id"),
    (col("id") * 31 % 997).as("payload"))

  test("row-for-row identical to the broadcast semi-join") {
    val ids = spark.range(10000).filter(col("id") % 7 === 2).select(col("id"))
    val viaBloom = Candidates.restrictToScalable(corpus, ids, "id")
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    val viaBroadcast = Candidates.restrictTo(corpus, ids, "id")
      .orderBy(col("id")).collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(viaBloom.sameElements(viaBroadcast))
    assert(viaBloom.length === 10000 / 7 + 1)
  }

  test("empty candidate set restricts to nothing") {
    val none = spark.range(0).select(col("id"))
    assert(Candidates.restrictToScalable(corpus, none, "id").count() === 0L)
  }

  test("duplicate candidate ids do not duplicate rows") {
    val dup = Seq(3L, 3L, 3L, 8L).toDF("id")
    val got = Candidates.restrictToScalable(corpus, dup, "id")
      .orderBy(col("id")).select(col("id")).as[Long].collect()
    assert(got.toSeq === Seq(3L, 8L))
  }

  test("plan prunes with might_contain BEFORE the exact join") {
    val ids = spark.range(10000).filter(col("id") % 3 === 0).select(col("id"))
    val plan = Candidates.restrictToScalable(corpus, ids, "id")
      .queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"bloom prune missing from plan:\n$plan")
    // the prune must sit in a Filter below the join, i.e. the plan keeps
    // a Filter node carrying might_contain (not a join-side condition)
    assert(plan.linesIterator.exists(l =>
        l.contains("Filter") || l.contains("might_contain")),
      s"no filter stage with might_contain:\n$plan")
  }

  test("expectedIds override sizes the bloom without changing results") {
    val ids = spark.range(10000).filter(col("id") % 11 === 5).select(col("id"))
    val got = Candidates
      .restrictToScalable(corpus, ids, "id", expectedIds = 100000L, fpp = 0.001)
      .count()
    assert(got === ids.count())
  }
}
