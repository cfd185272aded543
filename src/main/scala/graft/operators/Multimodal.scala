package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: image/audio/video as opaque `BINARY` columns
  * with typed metadata, plus decode / feature-extract / frame-sample
  * operators. (Engine extension; in the reference all media decoding happens
  * offline in GPU notebooks — CLIP `clip.ipynb`, OCR `ocr.ipynb`, VAD/ASR
  * `audio_*.ipynb` — and the engine only ever sees the extracted columns.)
  *
  * ==STUB boundary==
  * No image/audio codecs exist in this environment, so `decode*` here is a
  * DETERMINISTIC FAKE: metadata is derived from independent md5 substrings
  * of the content bytes. The Spark-side plumbing is the real design and is
  * what's tested: binary column + schema, per-field derivation as codegen'd
  * column expressions, frame expansion via `sequence`/`explode` (a
  * Generator, partition-parallel). In production the fake derivations are
  * replaced by a batched inference stage (`mapPartitions` over Arrow
  * batches / an external encoder service) with the SAME schema contract, so
  * downstream operators are unaffected.
  */
object Multimodal {

  /** Independent small hash fields from disjoint md5 substrings of the
    * binary content (avoids 64-bit division, which DuckDB/Spark round
    * differently at 2^60 scale). */
  private def hslice(c: Column, from: Int, mod: Int): Column =
    conv(substring(md5(c), from, 8), 16, 10).cast("long") % mod

  /** "Decode" image/video metadata from a binary column. */
  def decodeStub(df: DataFrame, idCol: String, binCol: String): DataFrame =
    df.select(col(idCol).as("id"),
      (lit(320) + hslice(col(binCol), 1, 1600)).as("width"),
      (lit(240) + hslice(col(binCol), 9, 840)).as("height"),
      (lit(1) + hslice(col(binCol), 17, 240)).as("n_frames"),
      ((hslice(col(binCol), 25, 36000)).cast("double") / 100.0).as("duration_s"))

  /** Frame sampling: one row per sampled frame index (every `every`-th
    * frame), the Generator-shaped expansion used for keyframe extraction. */
  def sampleFrames(meta: DataFrame, every: Int): DataFrame =
    meta.select(col("id"), col("n_frames"),
      explode(expr(s"sequence(0, cast(n_frames - 1 as int), $every)")).as("frame_idx"))

  /** Audio segmentation stub: <=10s ASR windows per clip (the reference's
    * `audio_regconition.ipynb` windowing), computed from the stub duration. */
  def audioSegments(meta: DataFrame, windowS: Double = 10.0): DataFrame =
    meta.select(col("id"), col("duration_s"),
      ceil(col("duration_s") / lit(windowS)).cast("long").as("n_segments"))

  /** Aspect-preserving fit into a `maxW x maxH` box with INTEGER-ONLY
    * arithmetic (scale in basis points, floor division) — bit-identical
    * across engines, unlike float scaling. No-op when already inside the
    * box (scale capped at 1.0 = 10000 bp). */
  def resizeMeta(meta: DataFrame, maxW: Int, maxH: Int): DataFrame =
    meta
      .withColumn("__s", least(
        expr(s"(${maxW}L * 10000) div width"),
        expr(s"(${maxH}L * 10000) div height"),
        lit(10000L)))
      .select(col("id"), col("width"), col("height"),
        expr("width * __s div 10000").as("new_width"),
        expr("height * __s div 10000").as("new_height"))

  /** Batched feature-extraction PLUMBING over a binary media column: typed
    * `mapPartitions` that batches rows (`batchSize` per inference call —
    * the shape a GPU encoder wants), hands the batch of byte payloads to a
    * pluggable `infer`, and flattens back to one feature row per input —
    * the Scala analog of the `mapInPandas` batched-UDF pattern (reference
    * runs CLIP at bs=4 in `clip.ipynb` cell 7). Partition-parallel, no
    * shuffle, output schema fixed by the Encoder. The default `infer` is
    * the deterministic STUB (md5-derived floats); production swaps in a
    * real encoder client with the SAME signature and schema. */
  def extractFeaturesBatched(
      df: DataFrame, idCol: String, binCol: String,
      dim: Int = 8, batchSize: Int = 32,
      infer: (Seq[Array[Byte]], Int) => Seq[Array[Float]] = stubInfer): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    df.select(col(idCol).cast("long"), col(binCol))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(batchSize).flatMap { batch =>
          val feats = infer(batch.map(_._2), dim)
          require(feats.length == batch.length,
            s"infer returned ${feats.length} features for ${batch.length} inputs")
          batch.iterator.zip(feats.iterator).map { case ((id, _), f) => (id, f) }
        }
      }
      .toDF("id", "feature")
  }

  /** aHash (average-hash) PERCEPTUAL fingerprint over a binary media
    * column — the classic image near-dup fingerprint: bit i is whether
    * cell i's intensity exceeds the image mean. Production derives cell
    * intensities from the decoded grayscale grid; under the ==STUB
    * boundary== each cell's intensity instead derives from the md5 of
    * that cell's OWN byte slice of the content (`(i*L) div cells` ..
    * `((i+1)*L) div cells`). The slice derivation is deliberately
    * LOCALITY-PRESERVING: contents sharing most bytes share most cell
    * slices, hence most fingerprint bits — so the downstream Hamming
    * machinery ([[graft.operators.Dedup.simhashPairsBanded]]) is
    * exercised on genuinely-near fingerprints, not just exact copies.
    *
    * Engine-portable: intensities are hash60-derived ints, and the
    * mean threshold is the integer-exact `x_i * cells > Σx` (no float
    * mean to diverge). One projection over the corpus — no shuffle, no
    * UDF, stays in codegen. Output `(id, ahash)`, a `cells`-bit BIGINT
    * ready for Hamming banding (cells = 63 matches the banding
    * convention). */
  def aHash(
      df: DataFrame, idCol: String, binCol: String, cells: Int = 63): DataFrame = {
    require(cells >= 1 && cells <= 63, s"cells must be in [1, 63], got $cells")
    df.select(col(idCol).as("id"),
      element_at(aHashWords(binCol, bands = 1, bandBits = cells), 1).as("ahash"))
  }

  /** The fingerprint construction shared by [[aHash]] and [[aHashWide]]:
    * `bands` BIGINT words of `bandBits` threshold bits each, as ONE
    * nested-lambda expression. The single-expression shape is
    * load-bearing: the cell-intensity transform (`cells` md5 slices) and
    * the total are bound ONCE per row as lambda variables (`transform(
    * array(x), x -> …)` is SQL's let-binding), so no later projection
    * collapse can re-inline the md5 pass into every bit reference — the
    * three-projection form of this computation collapsed into ~2×cells
    * transform re-evaluations per row inside the pairing join's plan
    * (measured 50 s vs 2 s at sf0.1). */
  private def aHashWords(binCol: String, bands: Int, bandBits: Int): Column = {
    val cells = bands * bandBits
    val slice =
      s"substring($binCol, 1 + cast((i * length($binCol)) div $cells as int), " +
        s"cast(((i + 1) * length($binCol)) div $cells as int) - " +
        s"cast((i * length($binCol)) div $cells as int))"
    val xs = s"transform(sequence(0, ${cells - 1}), i -> " +
      s"cast(conv(substring(md5($slice), 1, 15), 16, 10) as bigint) % 1000)"
    expr(
      s"""element_at(transform(array($xs), xv ->
         |  element_at(transform(array(aggregate(xv, 0L, (acc, x) -> acc + x)), tot ->
         |    transform(sequence(0, ${bands - 1}), w ->
         |      aggregate(sequence(0, ${bandBits - 1}), 0L, (a2, b) ->
         |        a2 + if(element_at(xv, cast(w * $bandBits + b + 1 as int)) * $cells > tot,
         |                shiftleft(1L, b), 0L)))), 1)), 1)""".stripMargin)
  }

  /** WIDE aHash — [[aHash]] scaled past the 63-bit BIGINT ceiling for
    * banded pairing at large N. The banded Hamming candidate join
    * generates ~`N²/2^bandBits` pairs per band for unrelated content,
    * so the 63-bit form (9-bit bands at maxHamming 6) carries an
    * `N²/2⁹` term — measured 7.1× at the 1M-row probe and the named
    * first term to fail at the next 100× (BASELINE.md). Widening the
    * fingerprint to `bands × bandBits` cells (default 7 × 18 = 126
    * bits) drops per-band collisions by `2^(bandBits-9)` (512× at the
    * default) while the pigeonhole exact-recall guarantee is untouched:
    * each WORD of the output array is one whole band, and ≤ maxHamming
    * differing bits cannot touch all `maxHamming + 1` words.
    *
    * Construction is [[aHash]]'s, with `cells = bands * bandBits`:
    * cell intensities from per-cell byte slices (locality-preserving
    * under the ==STUB boundary==), integer-exact threshold
    * `x_i * cells > Σx`, bit `i` packed into word `i div bandBits` at
    * position `i mod bandBits`. One map-only projection, no shuffle.
    * Output `(id, ahash ARRAY<BIGINT>)` of length `bands`, ready for
    * [[graft.operators.Dedup.hammingPairsBandedWide]]. */
  def aHashWide(
      df: DataFrame, idCol: String, binCol: String,
      bands: Int = 7, bandBits: Int = 18): DataFrame = {
    require(bands >= 1, s"bands must be >= 1, got $bands")
    require(bandBits >= 1 && bandBits <= 63,
      s"bandBits must be in [1, 63], got $bandBits")
    // fanOutNarrow: the cells-many-md5 fingerprint is expensive per row
    // and a narrow local scan computes it on 1-2 tasks (no-op at scale
    // and for streaming frames — guide §2.5, r19)
    Skew.fanOutNarrow(df.select(col(idCol).as("id"), col(binCol)))
      .select(col("id"), aHashWords(binCol, bands, bandBits).as("ahash"))
  }

  /** Auto-sized [[aHashWide]] + banding geometry (VERDICT r10 #3 — the
    * BASELINE.md sizing prose as code). Fields feed [[aHashWide]]
    * (`bands`, `bandBits`) and
    * [[graft.operators.Dedup.hammingPairsBandedWide]] (`maxHamming`). */
  case class WideHashParams(bands: Int, bandBits: Int, maxHamming: Int) {
    def cells: Int = bands * bandBits
    /** The similarity threshold the geometry actually enforces. */
    def realizedDiffFraction: Double = maxHamming.toDouble / cells
  }

  /** Size the wide-fingerprint knobs from the corpus row count and the
    * intended similarity threshold, instead of hand-picking:
    *
    *  - `bandBits = clamp(ceil(2·log₂ n), 9, 63)` — per-band random
    *    collisions are ~N²/2^bandBits, so 2·log₂N keeps the banded
    *    join's candidate volume ~linear in N (the measured knob,
    *    BASELINE.md).
    *  - `maxHamming` scales WITH the cell count so the threshold means
    *    the same similarity at every width (`diffFraction` defaults to
    *    the reference geometry's 6-of-126 ≈ 4.8%; a fixed absolute
    *    radius over more cells would silently tighten it).
    *  - `bands > maxHamming` ALWAYS (the pigeonhole exact-recall
    *    invariant [[graft.operators.Dedup.hammingPairsBandedWide]]
    *    enforces per row) — the search below never emits a geometry
    *    the pairing join would reject or, worse, silently miss pairs
    *    under.
    *
    * The constraints interact: once `diffFraction · bandBits >= 1` the
    * pigeonhole cap (`maxHamming <= bands − 1`) binds before the
    * requested fraction is reached, and adding bands only creeps toward
    * `1/bandBits` at ever-wider rows. The search picks, over
    * `bands ∈ [2, maxBands]`, the geometry whose REALIZED fraction is
    * nearest the request (ties to fewer bands — fewer join passes,
    * narrower rows); callers that need the exact requested threshold at
    * large N should read [[WideHashParams.realizedDiffFraction]] and
    * verify candidates with the full-Hamming filter at the intended
    * radius. */
  def aHashAutoParams(
      n: Long,
      diffFraction: Double = 6.0 / 126.0,
      maxBands: Int = 16): WideHashParams = {
    require(n >= 1, s"corpus row count must be >= 1, got $n")
    require(diffFraction > 0 && diffFraction < 0.5,
      s"diffFraction must be in (0, 0.5), got $diffFraction")
    require(maxBands >= 2, s"maxBands must be >= 2, got $maxBands")
    val bandBits = math.min(63, math.max(9,
      math.ceil(2.0 * math.log(math.max(n, 2).toDouble) / math.log(2.0)).toInt))
    val best = (2 to maxBands).map { bands =>
      val mh = math.min(bands - 1,                 // pigeonhole invariant
        math.floor(diffFraction * bands * bandBits).toInt)
      (bands, mh,
        math.abs(mh.toDouble / (bands * bandBits) - diffFraction))
    }.minBy { case (bands, _, dist) => (dist, bands) }
    WideHashParams(best._1, bandBits, best._2)
  }

  /** [[aHashWide]] with [[aHashAutoParams]] geometry — returns the
    * fingerprints AND the params so the caller feeds the SAME
    * `maxHamming` to the banded pairing. */
  def aHashAuto(
      df: DataFrame, idCol: String, binCol: String, n: Long,
      diffFraction: Double = 6.0 / 126.0,
      maxBands: Int = 16): (DataFrame, WideHashParams) = {
    val p = aHashAutoParams(n, diffFraction, maxBands)
    (aHashWide(df, idCol, binCol, p.bands, p.bandBits), p)
  }

  /** Deterministic stand-in for a batched media encoder: `dim` floats in
    * [0, 1) from independent md5 nibbles of the content. */
  def stubInfer(batch: Seq[Array[Byte]], dim: Int): Seq[Array[Float]] =
    batch.map { bytes =>
      val hex = java.security.MessageDigest.getInstance("MD5").digest(bytes)
        .map("%02x".format(_)).mkString
      (0 until dim).map { i =>
        Integer.parseInt(hex.substring((i * 2) % 30, (i * 2) % 30 + 2), 16) / 256.0f
      }.toArray
    }
}
