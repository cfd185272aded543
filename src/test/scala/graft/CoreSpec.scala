package graft

import graft.functions.VectorOps
import graft.operators._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.warehouse.dir",
        java.nio.file.Files.createTempDirectory("graft_wh").toString)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
  val sfDir = "/root/testdata/sf0.001"
}

class VectorOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("codegen dot product matches higher-order-function reference bitwise") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        VectorOps.dot(col("embedding"), col("qv")).as("fast"),
        VectorOps.dotHof(col("embedding"), col("qv")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(both.count() === 0)
  }

  test("codegen sqDist matches higher-order-function reference bitwise") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val q = emb.filter(col("vec_id") === 0).select(col("embedding").as("qv"))
    val both = emb.crossJoin(broadcast(q))
      .select(
        VectorOps.sqDist(col("embedding"), col("qv")).as("fast"),
        VectorOps.sqDistHof(col("embedding"), col("qv")).as("ref"))
      .filter(col("fast") =!= col("ref"))
    assert(both.count() === 0)
    val hand = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 6.0f, 3.0f))).toDF("a", "b")
    assert(hand.select(VectorOps.sqDist(col("a"), col("b"))).head.getDouble(0) === 25.0)
  }

  test("dot on hand vectors") {
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f))).toDF("a", "b")
    val got = df.select(VectorOps.dot(col("a"), col("b"))).head.getDouble(0)
    assert(got === 32.0)
  }

  test("self-dot of normalized embeddings is ~1") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val bad = emb.select(VectorOps.dot(col("embedding"), col("embedding")).as("d"))
      .filter(abs(col("d") - 1.0) > 1e-4)
    assert(bad.count() === 0)
  }
}

class FusionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("single channel is identity (combine_utils.py:36-37)") {
    val ch = Seq((1L, 10.0), (2L, 5.0)).toDF("id", "score")
    val got = Fusion.fuseByAddition(Seq(ch)).orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getDouble(1))).toSeq ===
      Seq((1L, 10.0), (2L, 5.0)))
  }

  test("two-channel min-max fusion on hand fixture (eps denominator)") {
    // ch1: min 0 max 10 -> 1 maps to (1-0)/(10-0+1e-6); ch2 constant channel
    // -> all scores (5-5)/(0+1e-6) = 0.
    val ch1 = Seq((1L, 0.0), (2L, 10.0), (3L, 1.0)).toDF("id", "score")
    val ch2 = Seq((1L, 5.0), (2L, 5.0), (3L, 5.0)).toDF("id", "score")
    val got = Fusion.fuseByAddition(Seq(ch1, ch2)).orderBy("id").collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(got(1L) - 0.0) < 1e-9)
    assert(math.abs(got(2L) - 10.0 / 10.000001) < 1e-9)
    assert(math.abs(got(3L) - 1.0 / 10.000001) < 1e-9)
  }

  test("RRF fuses by rank, ignoring score calibration") {
    // ch1 scores in [0,1], ch2 in the thousands — rank fusion must not care.
    // ch1 ranks: 2(r1), 1(r2), 3(r3); ch2 ranks: 3(r1), 1(r2).
    val ch1 = Seq((1L, 0.9), (2L, 0.95), (3L, 0.1)).toDF("id", "score")
    val ch2 = Seq((3L, 9000.0), (1L, 8000.0)).toDF("id", "score")
    val got = Fusion.fuseByRrf(Seq(ch1, ch2), k0 = 60).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    assert(math.abs(got(1L) - (1.0 / 62 + 1.0 / 62)) < 1e-12)
    assert(math.abs(got(2L) - 1.0 / 61) < 1e-12)
    assert(math.abs(got(3L) - (1.0 / 63 + 1.0 / 61)) < 1e-12)
  }

  test("RRF rank ties break by id (deterministic across engines)") {
    val ch = Seq((5L, 1.0), (2L, 1.0), (9L, 1.0)).toDF("id", "score")
    val got = Fusion.fuseByRrf(Seq(ch)).collect()
      .map(r => (r.getLong(0), r.getDouble(1))).toMap
    // equal scores rank by ascending id: 2 -> r1, 5 -> r2, 9 -> r3
    assert(math.abs(got(2L) - 1.0 / 61) < 1e-12)
    assert(math.abs(got(5L) - 1.0 / 62) < 1e-12)
    assert(math.abs(got(9L) - 1.0 / 63) < 1e-12)
  }
}

class TemporalJoinsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("asofBackward picks latest right row at or before left ts") {
    val left = Seq((1L, 10L, 100L), (2L, 10L, 205L), (3L, 20L, 50L))
      .toDF("id", "k", "t")
      .select(col("id"), col("k"), timestamp_micros(col("t")).as("t"))
    val right = Seq((10L, 100L, "a"), (10L, 200L, "b"), (10L, 300L, "c"))
      .toDF("k", "t", "v")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("v"))
    val got = TemporalJoins
      .asofBackward(left, right, "k", "t", "t", Map("v" -> "rv"))
      .orderBy("id")
      .collect()
      .map(r => (r.getLong(0), Option(r.getString(3)).orNull))
    // id=1 matches "a" at equal ts (<=); id=2 matches "b"; id=3 has no match
    assert(got.toSeq === Seq((1L, "a"), (2L, "b"), (3L, null)))
  }

  test("pointInIntervalJoin matches intervals crossing bucket boundaries") {
    val points = Seq((1L, 3_600_000_500L), (2L, 100L), (3L, 7_200_000_000L))
      .toDF("pid", "t")
      .select(col("pid"), timestamp_micros(col("t")).as("t"))
    // one interval spanning buckets 0..2 (width = 1h in micros)
    val iv = Seq((7L, 1L, 7_200_000_001L)).toDF("iid", "s", "e")
      .select(col("iid"), timestamp_micros(col("s")).as("s"),
        timestamp_micros(col("e")).as("e"))
    val got = TemporalJoins
      .pointInIntervalJoin(points, col("t"), iv, col("s"), col("e"))
      .select("pid").orderBy("pid").as[Long].collect()
    assert(got.toSeq === Seq(1L, 2L, 3L))
  }
}

class QueriesSmokeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every declared query runs and most return rows at sf0.001") {
    val counts = SparkEntry.queries.map { case (name, fn) =>
      name -> fn(spark, TestSpark.sfDir).count()
    }
    val empty = counts.filter(_._2 == 0).keys.toSeq.sorted
    // thresholded event queries may legitimately thin out at sf0.001,
    // but the bulk must be non-empty
    assert(counts.count(_._2 > 0) >= counts.size - 2, s"too many empty: $empty")
  }

  test("oracle SQL declared for every query (known rows-only exceptions listed)") {
    // every exception must be DELIBERATE: a query whose derivation is not
    // practically SQL-expressible (the driver then records a rows-only
    // check and a spec carries the substance). Growing this set is a
    // review decision, not a convenience.
    // EMPTY as of r17: sim_opq_adc — the last exception — is now
    // oracle-backed at its full geometry (15 deflations x 6 power
    // rounds, 4x4 eigenvalue allocation, 2 Lloyd refinements) via the
    // shortest-form-decimal parametric generators.
    val rowsOnly = Set.empty[String]
    assert(SparkEntry.queries.keySet -- rowsOnly === SparkEntry.oracleSql.keySet)
    assert(rowsOnly.subsetOf(SparkEntry.queries.keySet))
    assert(rowsOnly.intersect(SparkEntry.oracleSql.keySet).isEmpty,
      "a rows-only exception grew an oracle — remove it from the list")
  }
}
