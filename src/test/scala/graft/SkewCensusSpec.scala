package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Skew stress for the census-join family (VERDICT r8 #4): duplicateSpans
  * (and novelty, which reuses the same join shape) deliberately marks
  * non-first shingle instances with a hash-keyed EQUI-JOIN instead of a
  * row_number window, because duplicated text is hot BY DEFINITION — a
  * boilerplate run appearing in 50% of documents puts every instance of
  * one shingle hash on one key. A window makes that an unsplittable
  * straggler partition; the equi-join lets AQE's skew-join split the hot
  * key across tasks. This spec forces exactly that regime — one shingle
  * hash carrying ~26k instances (half the corpus) against a median
  * partition of a few hundred unique instances — and asserts BOTH the
  * answer (every boilerplate copy marked, first occurrence survives) and
  * the plan (AQEShuffleRead reports skewed splits in the final adaptive
  * plan).
  *
  * The skew thresholds are scaled down to test size (the production
  * defaults trip at 256 MB partitions); what is under test is the JOIN
  * SHAPE — that the hot key sits in a splittable shuffle join with no
  * broadcast assumption (firsts is corpus-scale at 100 TB) and no
  * per-key window. Round-9 history: the original plain `join(sh, "__h")`
  * could NEVER be split — OptimizeSkewedJoin requires both join inputs
  * to be bare shuffle stages, and the census aggregate pipelined into
  * the right side broke the match. [[Dedup.censusJoin]]'s struct-keyed
  * exchange barrier is the fix this spec pins. */
class SkewCensusSpec extends AnyFunSuite {

  /** Session clone with the skew-split regime pinned: no auto-broadcast
    * (the firsts census is corpus-scale in production), thresholds scaled
    * to test-size shuffles. Cloning keeps the overrides out of the shared
    * test session. */
  private lazy val s2 = {
    val s = TestSpark.spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "8")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    s.conf.set("spark.sql.adaptive.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2.0")
    s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "4096")
    s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048")
    s
  }

  /** 4000 docs: every doc gets 5 globally-unique filler tokens; every EVEN
    * doc appends a 100-token boilerplate run of one repeated token, so all
    * its fully-inside k=5 windows hash identically — ONE shingle hash with
    * 96 instances x 2000 docs (~192k rows on one key), vs unique hashes
    * everywhere else. */
  private lazy val fixture = {
    val boiler = Seq.fill(100)("lorem").mkString(" ")
    s2.range(4000).select(col("id"),
      when(col("id") % 2 === 0,
        concat_ws(" ",
          expr("array_join(transform(sequence(1, 5), j -> concat('u', id, 'x', j)), ' ')"),
          lit(boiler)))
        .otherwise(
          expr("array_join(transform(sequence(1, 5), j -> concat('u', id, 'x', j)), ' ')"))
        .as("text"))
  }

  test("hot-shingle census join: correct spans AND AQE-split skew partitions") {
    val spans = Dedup.duplicateSpans(fixture, "id", "text", k = 5)
    val rows = spans.collect()

    // ---- the answer: every boilerplate copy surfaces as one merged span
    // 2000 hot docs -> 2000 spans (clean docs contribute nothing)
    assert(rows.length === 2000, s"expected 2000 spans, got ${rows.length}")
    assert(rows.forall(_.getAs[Long]("id") % 2 == 0),
      "a clean (odd) doc was marked duplicated")
    val byId = rows.map(r => r.getAs[Long]("id") ->
      (r.getAs[Long]("span_start"), r.getAs[Long]("span_end"))).toMap
    // doc 0 holds the corpus-FIRST instance (id, st) = (0, 6): its span
    // starts one shingle later; every other hot doc's full run is marked.
    // tokens 1-5 are filler, 6-105 the run; windows fully inside: st 6..101
    assert(byId(0L) === ((7L, 105L)), s"corpus-first doc span: ${byId(0L)}")
    assert(byId(2L) === ((6L, 105L)), s"non-first hot doc span: ${byId(2L)}")
    assert(byId.filterKeys(_ >= 2).values.forall(_ == ((6L, 105L))),
      "every non-first boilerplate copy must be fully marked")

    // ---- the plan: the marking join's shuffle read split the hot key.
    // AQEShuffleReadExec prints "skewed" in its final-plan string args
    // only when hasSkewedPartition — an unsplit straggler fails here.
    val plan = spans.queryExecution.executedPlan.toString
    assert(plan.contains("skew=true"),
      s"marking join was not rewritten as a skew join — plan:\n$plan")
    assert(plan.contains("skewed"),
      s"hot shingle did NOT trigger an AQE skew split — plan:\n$plan")
  }
}
