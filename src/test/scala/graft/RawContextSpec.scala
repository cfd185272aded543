package graft

import graft.sources.RawContext
import org.scalatest.funsuite.AnyFunSuite

class RawContextSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("per-file line ordinals recover the positional keyframe convention") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctx")
    // two "videos", one with a BOM, lines = per-keyframe context strings
    java.nio.file.Files.writeString(dir.resolve("L21_V001.txt"),
      "person car\ndog\n\ntree sky\n")
    java.nio.file.Files.writeString(dir.resolve("L21_V002.txt"),
      "﻿cat\nhouse boat\n")
    val got = RawContext.readOrdinalText(spark, dir.toString)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(got === Set(
      ("L21_V001", 0, "person car"), ("L21_V001", 1, "dog"),
      ("L21_V001", 2, ""), ("L21_V001", 3, "tree sky"),
      ("L21_V002", 0, "cat"), ("L21_V002", 1, "house boat")))
    // the wholetext fallback recovers the identical relation
    val whole = RawContext.readOrdinalTextWhole(spark, dir.toString)
      .collect()
      .map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      .toSet
    assert(whole === got)
  }

  test("wholetext path keeps exact ordinals on a file big enough to split") {
    val dir = java.nio.file.Files.createTempDirectory("graft_ctx_big")
    val lines = (0 until 2000).map(i => s"ctx line $i with some padding text")
    java.nio.file.Files.writeString(dir.resolve("L99_V009.txt"),
      lines.mkString("\n") + "\n")
    java.nio.file.Files.writeString(dir.resolve("L99_V010.txt"),
      "﻿first\n\nlast\n")
    val conf = spark.conf
    val oldMax = conf.get("spark.sql.files.maxPartitionBytes")
    val oldCost = conf.get("spark.sql.files.openCostInBytes")
    try {
      // force the default line reader to split the big file
      conf.set("spark.sql.files.maxPartitionBytes", "4096")
      conf.set("spark.sql.files.openCostInBytes", "0")
      assert(spark.read.text(dir.toString).rdd.getNumPartitions > 2,
        "fixture not split — test would prove nothing")
      val got = RawContext.readOrdinalTextWhole(spark, dir.toString)
        .collect().map(r => (r.getString(0), r.getInt(1), r.getString(2)))
      assert(got.filter(_._1 == "L99_V009").sortBy(_._2).map(_._3).toSeq === lines)
      assert(got.filter(_._1 == "L99_V010").sortBy(_._2).map(_._3).toSeq ===
        Seq("first", "", "last"))
    } finally {
      conf.set("spark.sql.files.maxPartitionBytes", oldMax)
      conf.set("spark.sql.files.openCostInBytes", oldCost)
    }
  }
}

class AsofPropertySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("nearestInTime(k=2) equals brute-force argsort-of-abs-diff take-2") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val left = (1 to 100).map(i =>
      (i.toLong, rnd.nextInt(3).toLong, rnd.nextInt(500).toLong * 2000000L))
    val right = (1 to 60).map(i =>
      (rnd.nextInt(3).toLong, rnd.nextInt(500).toLong * 2000000L + 1000000L, i.toLong))
    val leftDf = left.toDF("lid", "k", "t")
      .select(col("lid"), col("k"), timestamp_micros(col("t")).as("t"))
    val rightDf = right.toDF("k", "t", "rid")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("rid"))
      .groupBy("k", "t").agg(min("rid").as("rid")) // unique (k, t)
    val got = graft.operators.TemporalJoins
      .nearestInTime(leftDf, rightDf, "k", "t", "t", "rid", k = 2)
      .collect()
      .groupBy(_.getLong(0))
      .map { case (lid, rows) =>
        lid -> rows.sortBy(_.getLong(4)).map(_.getLong(3)).toList }
    val rightClean = right.groupBy(r => (r._1, r._2))
      .map { case ((k, t), vs) => (k, t, vs.map(_._3).min) }.toSeq
    left.foreach { case (lid, k, t) =>
      val cands = rightClean.filter(_._1 == k)
      if (cands.nonEmpty) {
        // brute force: sort by (abs diff, time-order index) take 2
        val byTime = cands.sortBy(c => (c._2, c._3)).zipWithIndex
        val want = byTime.sortBy { case ((_, ct, _), idx) =>
          (math.abs(ct - t), idx) }.take(2).map(_._1._3).toList
        assert(got(lid) === want, s"lid=$lid")
      } else assert(!got.contains(lid))
    }
  }

  test("asofBackward tolerance nulls out stale matches (merge_asof semantics)") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val left = (1 to 150).map(i =>
      (i.toLong, rnd.nextInt(4).toLong, rnd.nextInt(800).toLong * 1000000L))
    val right = (1 to 200).map(i =>
      (rnd.nextInt(4).toLong, rnd.nextInt(800).toLong * 1000000L, rnd.nextDouble()))
    val tolUs = 50L * 1000000L
    val leftDf = left.toDF("id", "k", "t")
      .select(col("id"), col("k"), timestamp_micros(col("t")).as("t"))
    val rightDf = right.toDF("k", "t", "v")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("v"))
      .groupBy("k", "t").agg(max("v").as("v"))
    val got = graft.operators.TemporalJoins
      .asofBackward(leftDf, rightDf, "k", "t", "t", Map("v" -> "rv"),
        toleranceMicros = Some(tolUs))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    val rightClean = right.groupBy(r => (r._1, r._2))
      .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
    left.foreach { case (id, k, t) =>
      val want = rightClean.filter(r => r._1 == k && r._2 <= t && t - r._2 <= tolUs)
        .sortBy(_._2).lastOption.map(_._3)
      // NOTE: a stale latest match hides any older in-tolerance one — that
      // is the merge_asof contract (the match is latest-then-filtered);
      // brute force mirrors it by filtering then taking the latest, which
      // only differs when the latest is out of tolerance AND an older row
      // is in tolerance — impossible, staleness grows backwards in time
      assert(got(id) === want, s"id=$id k=$k t=$t")
    }
  }

  test("asofBackward equals brute-force latest-at-or-before on random data") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(42)
    val left = (1 to 200).map(i =>
      (i.toLong, (rnd.nextInt(5)).toLong, rnd.nextInt(1000).toLong * 1000000L))
    val right = (1 to 300).map(i =>
      ((rnd.nextInt(5)).toLong, rnd.nextInt(1000).toLong * 1000000L, rnd.nextDouble()))
    val leftDf = left.toDF("id", "k", "t")
      .select(col("id"), col("k"), timestamp_micros(col("t")).as("t"))
    val rightDf = right.toDF("k", "t", "v")
      .select(col("k"), timestamp_micros(col("t")).as("t"), col("v"))
      // dedupe equal (k, t) so "the latest right row" is unique
      .groupBy("k", "t").agg(max("v").as("v"))
    val got = graft.operators.TemporalJoins
      .asofBackward(leftDf, rightDf, "k", "t", "t", Map("v" -> "rv"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    val rightClean = right.groupBy(r => (r._1, r._2))
      .map { case ((k, t), vs) => (k, t, vs.map(_._3).max) }.toSeq
    left.foreach { case (id, k, t) =>
      val want = rightClean.filter(r => r._1 == k && r._2 <= t)
        .sortBy(_._2).lastOption.map(_._3)
      assert(got(id) === want, s"id=$id k=$k t=$t")
    }
  }
}
