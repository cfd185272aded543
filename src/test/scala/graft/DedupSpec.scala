package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("exact dedup keeps lowest id per identical text") {
    val docs = Seq((5L, "x y z"), (2L, "x y z"), (9L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(docs, "doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got === Map(2L -> 2L, 9L -> 1L))
  }

  test("duplicateSpans marks cross-doc and within-doc runs, merged, first copy exempt") {
    val docs = Seq(
      (1L, "a b c d e f g h"),                   // the original run
      (2L, "x y z a b c d e f q"),               // 6-token copy of doc 1's run
      (3L, "p q r s t u p q r s t u"),           // a within-doc repeat
      (4L, "m n o m n o m")                      // too short for any 5-shingle dup
    ).toDF("doc_id", "text")
    val got = Dedup.duplicateSpans(docs, "doc_id", "text", k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet
    // doc 2: shingles at st=4 ("a b c d e") and st=5 ("b c d e f") both
    // first occur in doc 1 -> one merged span over tokens 4..9
    // doc 3: the second "p q r s t u" (st=7,8 vs firsts at st=1,2) -> 7..12
    // docs 1 and 4: nothing (first copies are exempt; doc 4 has no dup)
    assert(got === Set((2L, 4L, 9L, 2L), (3L, 7L, 12L, 2L)))
  }

  test("removeDuplicateSpans excises later copies, keeps the first, passes dup-free docs") {
    val docs = Seq(
      (1L, "a b c d e f g h"),
      (2L, "x y z a b c d e f q"),           // tokens 4..9 are doc 1's run
      (3L, "q r s t u v")                    // dup-free
    ).toDF("doc_id", "text")
    val got = Dedup.removeDuplicateSpans(docs, "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    assert(got(1L) === (("a b c d e f g h", 8L, 0L)))   // first copy untouched
    assert(got(2L) === (("x y z q", 10L, 6L)))          // span 4..9 excised
    assert(got(3L) === (("q r s t u v", 6L, 0L)))
  }

  test("aHash: one-byte mutation stays within Hamming 6, unrelated content does not") {
    import graft.operators.Multimodal
    val base = ('a' to 'z').mkString(" ") * 4
    val mutant = base.dropRight(1) + "q"
    val other = "totally different content that shares no bytes at all " * 4
    val df = Seq((1L, base), (2L, mutant), (3L, other)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val fp = Multimodal.aHash(df, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(2L)) <= 6,
      s"mutant drifted ${java.lang.Long.bitCount(fp(1L) ^ fp(2L))} bits")
    assert(java.lang.Long.bitCount(fp(1L) ^ fp(3L)) > 6)
    // and the banded pairing surfaces exactly the planted pair
    val pairs = Dedup.simhashPairsBanded(
        Multimodal.aHash(df, "doc_id", "content")
          .select(col("id"), col("ahash").as("simhash")), maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("aHashWide: 126-bit fingerprint keeps the mutant near, banded == all-pairs") {
    import graft.operators.Multimodal
    val base = ('a' to 'z').mkString(" ") * 4
    val mutant = base.dropRight(1) + "q"
    val other = "totally different content that shares no bytes at all " * 4
    val df = Seq((1L, base), (2L, mutant), (3L, other)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val fp = Multimodal.aHashWide(df, "doc_id", "content")
    val words = fp.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    assert(words(1L).length === 7, "7 words, one per band")
    def ham(a: Array[Long], b: Array[Long]) =
      a.zip(b).map { case (x, y) => java.lang.Long.bitCount(x ^ y) }.sum
    assert(ham(words(1L), words(2L)) <= 6,
      s"mutant drifted ${ham(words(1L), words(2L))} of 126 bits")
    assert(ham(words(1L), words(3L)) > 6)
    // each word respects its 18-bit band width
    words.values.foreach(_.foreach(w => assert((w >> 18) === 0L, s"word overflow: $w")))
    // banded pairing = exactly the planted pair = the all-pairs result
    val banded = Dedup.hammingPairsBandedWide(fp, maxHamming = 6)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val allPairs = (for {
      (i, wa) <- words; (j, wb) <- words if i < j
      h = ham(wa, wb).toLong if h <= 6
    } yield (i, j, h)).toSet
    assert(banded === allPairs)
    assert(banded.map(p => (p._1, p._2)) === Set((1L, 2L)))
    // bands=1 degenerates to the classic 63-bit aHash, bit for bit
    val classic = Multimodal.aHash(df, "doc_id", "content")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val one = Multimodal.aHashWide(df, "doc_id", "content", bands = 1, bandBits = 63)
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).head).toMap
    assert(one === classic)
    // pigeonhole precondition is ENFORCED, not assumed: too few words for
    // the requested maxHamming throws instead of silently missing pairs
    val narrow = Multimodal.aHashWide(df, "doc_id", "content",
      bands = 4, bandBits = 18)
    val e = intercept[Exception] {
      Dedup.hammingPairsBandedWide(narrow, maxHamming = 6).collect()
    }
    assert(e.getMessage.contains("pigeonhole") ||
      Option(e.getCause).exists(_.getMessage.contains("pigeonhole")), e.getMessage)
  }

  test("aHashAuto: sizing sweep holds the pigeonhole invariant; e2e at auto geometry") {
    import graft.operators.Multimodal
    // the BASELINE.md guidance as code, pinned across 10 decades of N:
    // bandBits tracks 2·log₂N (clamped to [9, 63]), bands ALWAYS exceeds
    // maxHamming (the exact-recall pigeonhole), and the realized
    // threshold never exceeds the requested differing-bit fraction
    val f = 6.0 / 126.0
    (0 to 9).foreach { e =>
      val n = math.pow(10, e).toLong.max(1)
      val p = Multimodal.aHashAutoParams(n, f)
      val wantBits = math.min(63, math.max(9,
        math.ceil(2.0 * math.log(n.max(2).toDouble) / math.log(2.0)).toInt))
      assert(p.bandBits === wantBits, s"n=$n")
      assert(p.bands > p.maxHamming, s"pigeonhole violated at n=$n: $p")
      assert(p.realizedDiffFraction <= f + 1e-12, s"threshold loosened at n=$n: $p")
      assert(p.maxHamming >= 0 && p.bands >= 2)
    }
    // the reference geometry is the fixed point at its own scale:
    // 2·log₂(512) = 18 bits and the 6-of-126 fraction lands bands=7
    assert(Multimodal.aHashAutoParams(512, f) ===
      Multimodal.WideHashParams(7, 18, 6))
    // maxHamming scales with the cell count (constant-threshold rule):
    // wider bands at the same fraction allow proportionally more bits
    val p512 = Multimodal.aHashAutoParams(512, f)
    val p1e6 = Multimodal.aHashAutoParams(1000000L, f)
    assert(p1e6.bandBits > p512.bandBits)
    // end-to-end at auto geometry: fingerprints + pairing at the helper's
    // OWN maxHamming find the planted near-dup and throw nowhere
    val base = ('a' to 'z').mkString(" ") * 4
    val mutant = base.dropRight(1) + "q"
    val other = "totally different content that shares no bytes at all " * 4
    val df = Seq((1L, base), (2L, mutant), (3L, other)).toDF("doc_id", "text")
      .select(col("doc_id"), col("text").cast("binary").as("content"))
    val (fp, p3) = Multimodal.aHashAuto(df, "doc_id", "content", n = 3)
    assert(p3.bands > p3.maxHamming)
    val pairs = Dedup.hammingPairsBandedWide(fp, maxHamming = p3.maxHamming)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs === Set((1L, 2L)))
  }

  test("decontaminateSpans excises exactly the benchmark-leaked run") {
    val docs = Seq(
      (1L, "a b c d e f g h i j"),
      (2L, "p q r s t u v w")
    ).toDF("doc_id", "text")
    val bench = Seq((100L, "c d e f g")).toDF("doc_id", "text")
    val got = Dedup.decontaminateSpans(docs, bench,
        "doc_id", "text", "doc_id", "text", k = 5)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3))))
      .toMap
    // doc 1's tokens 3..7 are the leaked bench run -> excised; doc 2 intact
    assert(got(1L) === (("a b h i j", 10L, 5L)))
    assert(got(2L) === (("p q r s t u v w", 8L, 0L)))
  }

  test("duplicateSpans on a dup-free corpus is empty") {
    val docs = Seq((1L, "a b c d e f"), (2L, "q r s t u v")).toDF("doc_id", "text")
    assert(Dedup.duplicateSpans(docs, "doc_id", "text", k = 5).count() === 0)
  }

  test("minhash LSH finds a near-duplicate pair and skips unrelated docs") {
    val base = (1 to 30).map(i => s"tok$i").mkString(" ")
    val nearDup = base.replace("tok7", "tok7x")
    val other = (100 to 130).map(i => s"tok$i").mkString(" ")
    val docs = Seq((1L, base), (2L, nearDup), (3L, other)).toDF("doc_id", "text")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(pairs.toSet === Set((1L, 2L)))
    // the ARTIFACT-FED serving form (persisted hashed shingles + bucket
    // table) returns the identical pair relation — the artifacts are the
    // one-shot pipeline's own intermediates
    val sh = Dedup.shingles(docs, "doc_id", "text")
    val hashed = sh.select(col("id"), Dedup.hash60(col("s")).as("hv"))
    val buckets = Dedup.minhashBucketsFromHashes(hashed, 16, 2)
    def rows(df: org.apache.spark.sql.DataFrame) = df
      .collect().map(r => (r.getLong(0), r.getLong(1),
        BigDecimal(r.getDouble(2)).setScale(6, BigDecimal.RoundingMode.HALF_UP)))
      .toSet
    assert(rows(Dedup.minhashLshPairsFromIndex(hashed, buckets)) ===
      rows(Dedup.minhashLshPairs(docs, "doc_id", "text", threshold = 0.5)))
  }

  test("simhash is identical for identical token multisets, differs otherwise") {
    val docs = Seq((1L, "a b c a"), (2L, "b a a c"), (3L, "q r s t u v")).toDF("doc_id", "text")
    val got = Dedup.simhash(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got(1L) === got(2L))
    assert(got(1L) !== got(3L))
  }

  test("hash60Local matches the distributed hash60 expression") {
    import org.apache.spark.sql.functions._
    val samples = Seq("1:0", "16:63", "abc", "spark join table")
    val viaSpark = samples.toDF("s")
      .select(col("s"), Dedup.hash60(col("s")).as("h"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    samples.foreach(s => assert(Dedup.hash60Local(s) === viaSpark(s), s))
  }

  test("cosine pairs finds identical vectors") {
    val docs = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(1.0f, 0.0f)), (3L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val got = Dedup.cosinePairs(docs, "vec_id", "embedding", 0.9)
      .select("i", "j").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(got.toSet === Set((1L, 2L)))
  }

  test("all-pairs cosine is GUARDED: an over-limit corpus throws with routing advice") {
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val ex = intercept[IllegalArgumentException] {
      Dedup.cosinePairs(emb, "vec_id", "embedding", 0.45, maxRows = 100L)
    }
    assert(ex.getMessage.contains("cosinePairsBlocked"), ex.getMessage)
  }

  test("all-pairs jaccard is GUARDED the same way (hot-shingle quadratic risk)") {
    val docs = Seq((1L, "a b c d"), (2L, "a b c e"), (3L, "f g h i"),
      (4L, "a b c d")).toDF("doc_id", "text")
    val ex = intercept[IllegalArgumentException] {
      Dedup.jaccardPairs(docs, "doc_id", "text", maxRows = 3L)
    }
    assert(ex.getMessage.contains("minhashLshPairs"), ex.getMessage)
    // under the limit the oracle form still runs
    assert(Dedup.jaccardPairs(docs, "doc_id", "text").count() >= 1L)
  }

  test("cell-blocked cosine: exact scores, candidates gated by co-probing; full probes == all-pairs") {
    import graft.operators.Similarity
    import org.apache.spark.sql.functions._
    val emb = Tables(spark, TestSpark.sfDir, "embeddings")
    val cents = Similarity.kmeansFit(emb, k = 4, iters = 1)
    def pairs(df: org.apache.spark.sql.DataFrame) = df
      .select(col("i"), col("j"), round(col("cos"), 4).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val all = pairs(Dedup.cosinePairs(emb, "vec_id", "embedding", 0.45))
    // probes covering every cell => every pair co-blocked => exactly all-pairs
    val full = pairs(Dedup.cosinePairsBlocked(emb, cents, "vec_id", "embedding",
      0.45, probes = 4))
    assert(full === all, "full-probe blocking must degenerate to all-pairs")
    // partial probing: a SUBSET with exact scores (blocking gates
    // candidacy, never the score)
    val blocked = pairs(Dedup.cosinePairsBlocked(emb, cents, "vec_id", "embedding",
      0.45, probes = 2))
    assert(blocked.subsetOf(all), "blocked pair carries a non-exact score")
    assert(blocked.nonEmpty)
    cents.unpersist()
  }
}
