package graft.operators

import graft.functions.VectorOps
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication suite for large-scale training-data pipelines: exact,
  * MinHash+LSH, SimHash, exact n-gram Jaccard, and embedding-cosine
  * near-dup. (Engine extension beyond the reference surface — the reference
  * has only result-level dedup, `utils/combine_utils.py:19-24`.)
  *
  * All hashing uses [[hash60]] — the first 15 hex chars of md5 as a positive
  * 60-bit BIGINT — which DuckDB ('0x'||substr(md5(s),1,15))::BIGINT and Spark
  * conv(substr(md5(s),1,15),16,10) compute identically, so every stage
  * (minhash values, band buckets, fingerprints) is reproducible across
  * engines and across runs: a hard requirement when dedup decisions must be
  * auditable over 100 TB.
  *
  * Scale design: exact dedup is one hash-shuffle; MinHash/LSH turns the
  * quadratic near-dup join into (1) a corpus-linear signature build (explode
  * shingles x H seeds, min-aggregate), (2) an equi-join on (band, bucket) —
  * candidates only — and (3) a per-candidate verification join. No stage is
  * all-pairs. The exact-Jaccard operator exists as the small-data oracle
  * (and the verify step); its blocked self-join on shared shingles is the
  * thing LSH replaces at scale.
  */
object Dedup {

  /** Approximate Jaccard threshold where a banded MinHash config flips from
    * mostly-miss to mostly-catch: t ~= (1/bands)^(1/rowsPerBand) (MMDS ch.3).
    * Used to pick (numHashes, rowsPerBand) for a target similarity. */
  def lshThreshold(bands: Int, rowsPerBand: Int): Double =
    math.pow(1.0 / bands, 1.0 / rowsPerBand)

  /** Portable 60-bit hash: BIGINT from the md5 hex prefix. */
  def hash60(c: Column): Column =
    conv(substring(md5(c), 1, 15), 16, 10).cast("long")

  /** Seed-parameterized hash family: h_seed(s) = hash60(seed || ':' || s). */
  def hash60Seeded(seed: Column, c: Column): Column =
    hash60(concat(seed.cast("string"), lit(":"), c))

  /** Exact dedup: group by content hash, keep the lowest id. Output
    * (keep_id, n_copies). One shuffle on the hash key; at scale, hash first
    * so the shuffle key is 8 bytes, not the document. */
  def exact(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs.select(hash60(col(textCol)).as("__key"), col(idCol))
      .groupBy(col("__key"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
      .select(col("keep_id"), col("n_copies"))

  /** PARAGRAPH-level dedup (the CCNet/Gopher line-dedup shape): split each
    * document on `sep`, keep only the corpus-wide FIRST occurrence of every
    * paragraph (smallest `(id, position)` — deterministic, so the choice is
    * oracle-checkable), and reassemble each document from its surviving
    * paragraphs in original order. Boilerplate that repeats across
    * documents (headers, navigation, license blocks) vanishes from every
    * document but the first one containing it — removing it per-document
    * is what exact/minhash DOC-level dedup cannot do.
    *
    * Scale shape: one explode (corpus-linear in paragraphs), one groupBy
    * on the 60-bit paragraph hash for the first-occurrence election (the
    * same md5-hash keying as [[exact]] — partial-agg min(struct), no
    * paragraph text shuffled beyond its first-occurrence row), one
    * groupBy(id) to reassemble. No windows over the whole corpus, no
    * driver-side state. Returns `(idCol, textCol, n_paras, n_kept)`;
    * a document whose every paragraph appeared earlier keeps an empty
    * text with `n_kept = 0`. */
  def dedupParagraphs(
      docs: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      sep: String = "\n"): DataFrame = {
    val paras = docs
      .select(col(idCol),
        posexplode(split(col(textCol), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__para")))
    val keyed = paras.select(col(idCol), col("__pos"), col("__para"),
      hash60(col("__para")).as("__h"))
    val firsts = keyed.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("__pos"))).as("__first"))
    val kept = keyed.join(firsts, Seq("__h"))
      .filter(col(idCol) === col("__first").getField(idCol) &&
        col("__pos") === col("__first").getField("__pos"))
    val reasm = kept.groupBy(col(idCol))
      .agg(array_sort(collect_list(struct(col("__pos"), col("__para"))))
          .as("__a"),
        count(lit(1)).as("n_kept"))
      .select(col(idCol),
        concat_ws(sep, transform(col("__a"), s => s.getField("__para")))
          .as(textCol),
        col("n_kept"))
    paras.groupBy(col(idCol)).agg(count(lit(1)).as("n_paras"))
      .join(reasm, Seq(idCol), "left")
      .select(col(idCol), coalesce(col(textCol), lit("")).as(textCol),
        col("n_paras"), coalesce(col("n_kept"), lit(0L)).as("n_kept"))
  }

  /** SPAN-level exact duplicate detection (the ExactSubstr shape of Lee et
    * al. 2022, "Deduplicating Training Data Makes Language Models Better",
    * at fixed k-token granularity): every maximal token interval covered by
    * k-token shingles that occur MORE than once corpus-wide, excluding each
    * shingle's corpus-first occurrence (smallest `(id, start)` —
    * deterministic, so oracle-checkable). Document-level dedup
    * ([[exact]]/[[minhashLshPairs]]) misses text duplicated INSIDE
    * otherwise-distinct documents (licenses, boilerplate, quoted
    * passages); paragraph dedup ([[dedupParagraphs]]) only catches it on
    * separator boundaries; this catches it anywhere — a duplicated run of
    * L >= k tokens surfaces as its L-k+1 marked shingles merged into one
    * span.
    *
    * Scale shape: tokenize + shingle is a projection + generator
    * (corpus-linear, rows carry only `(id, start, hash)`); the
    * corpus-first occurrence per shingle is ONE partial-agg min(struct)
    * groupBy on the 60-bit hash (map-side combine — skew-immune by
    * construction); marking the non-first occurrences is a hash-keyed
    * equi-join against that firsts table. The join deliberately replaces
    * a row_number window: duplicated text is hot BY DEFINITION (the
    * operator exists to find runs copied millions of times), and a
    * window puts every instance of a hot shingle into one unsplittable
    * partition — a straggler exactly on the operator's target data —
    * while AQE's skew-join splits the equi-join's hot keys across tasks.
    * Interval merging is a per-DOCUMENT window over the marked starts
    * (document-bounded — the corpus never sorts globally). Never
    * all-pairs. The paper's suffix array finds duplicates of arbitrary
    * length; at fixed k this relational form is exact for runs >= k, the
    * granularity a training-data pipeline actually drops.
    *
    * Returns one row per maximal duplicated span:
    * `(idCol, span_start, span_end, n_shingles)` — 1-based token
    * ordinals, inclusive. */
  def duplicateSpans(
      docs: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      k: Int = 5): DataFrame = {
    require(k >= 1, s"shingle width must be positive, got $k")
    // the positional shingle pass (regex tokenize + explode + hash) feeds
    // the census aggregate AND the marking join's instance side — staging
    // the 20-byte/row hash frame runs that CPU pass once (r18); the
    // marking join still reads it through a fresh ENSURE_REQUIREMENTS
    // exchange, so the AQE skew-split shape (SkewCensusSpec) is unchanged
    val sh = Mat.stageIfExpensive(tokenShingles(docs, idCol, textCol, k))
    // every instance joins its hash's first occurrence; instances that ARE
    // the first drop out, which also silently drops singleton shingles
    val firsts = sh.groupBy(col("__h"))
      .agg(min(struct(col(idCol), col("st"))).as("__first"))
    val dup = censusJoin(sh, firsts)
      .filter(!(col(idCol) === col("__first").getField(idCol) &&
        col("st") === col("__first").getField("st")))
      .select(col(idCol), col("st"))
    mergeSpans(dup, idCol, k)
  }

  /** The census MARKING join — `instances ⋈ census ON __h` — shaped so
    * AQE's skew-join can actually split a hot hash. Duplicated text is hot
    * BY DEFINITION (this family exists to find runs copied millions of
    * times), and `OptimizeSkewedJoin` only rewrites a join when BOTH
    * inputs are bare ENSURE_REQUIREMENTS shuffle stages directly under the
    * join's sorts: a census aggregate PIPELINED into the right side can
    * never match the rule's pattern, so with the plain `join(..., "__h")`
    * the hot hash sits in one unsplittable task no matter how the skew
    * conf is set (found by SkewCensusSpec, round 9). Wrapping both keys in
    * a single-field struct makes the aggregate's output partitioning
    * (`hash(__h)`) formally not satisfy the join's requirement
    * (`hash(struct(__h))`), so EnsureRequirements plants a fresh exchange
    * above the census — and both join inputs become splittable stages.
    * Cost: ONE extra shuffle of the DISTINCT-hash census table, which is
    * small next to the instance table exactly when duplication is hot —
    * the regime this operator targets. The instance side's physical
    * layout is unchanged (murmur3 of a struct recurses into its fields,
    * so `hash(struct(h)) == hash(h)` partition for partition).
    * SkewCensusSpec pins the skew=true plan this buys. */
  private[graft] def censusJoin(instances: DataFrame, census: DataFrame): DataFrame =
    instances.as("__ci").join(census.as("__cc"),
        struct(col("__ci.__h")) === struct(col("__cc.__h")))
      .drop(col("__cc.__h"))

  /** Positional k-token shingle hashes `(idCol, st, __h)` — the shared
    * feature pass of the span family. One projection + Generator, rows
    * carry only the 8-byte hash. */
  private[graft] def tokenShingles(
      docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame =
    // fanOutNarrow: a one-file local corpus scans as ONE task; spread the
    // tokenize + shingle generation across the cores (no-op at scale)
    Skew.fanOutNarrow(docs.select(col(idCol), col(textCol)))
      .select(col(idCol),
        expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)").as("__a"))
      // guard: sequence(1, 0) is the DESCENDING [1, 0] (see Lexical.ngrams)
      .filter(size(col("__a")) >= k)
      .select(col(idCol),
        posexplode(expr(
          s"transform(sequence(1, size(__a) - ${k - 1}), " +
            s"i -> array_join(slice(__a, i, $k), ' '))")).as(Seq("__p", "__s")))
      .select(col(idCol), (col("__p") + 1).cast("long").as("st"),
        hash60(col("__s")).as("__h"))

  /** Gaps-and-islands merge of marked k-wide starts `(idCol, st)` into
    * maximal spans: equal-width spans sorted by start coalesce whenever
    * the next start is within k of the previous (overlap or exact
    * adjacency = one contiguous run). Per-DOCUMENT window — the corpus
    * never sorts globally. */
  private[graft] def mergeSpans(
      marked: DataFrame, idCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(idCol)).orderBy(col("st"))
    marked
      .withColumn("__brk",
        when(col("st") - lag(col("st"), 1).over(w) <= k, lit(0)).otherwise(lit(1)))
      .withColumn("__g", sum(col("__brk")).over(w))
      .groupBy(col(idCol), col("__g"))
      .agg(min(col("st")).as("span_start"),
        (max(col("st")) + lit(k - 1)).cast("long").as("span_end"),
        count(lit(1)).as("n_shingles"))
      .select(col(idCol), col("span_start"), col("span_end"), col("n_shingles"))
  }

  /** APPLY step for [[duplicateSpans]] — the Lee et al. 2022 training-time
    * treatment: rewrite each document with its duplicated spans EXCISED
    * (the corpus-first copy of every run survives untouched, later copies
    * vanish where they stand). Tokens whose 1-based ordinal falls inside
    * any of the document's spans drop; survivors reassemble in order. The
    * rewrite normalizes whitespace (tokens re-join single-spaced) — the
    * dedup decision operates on the token stream, like the detector.
    *
    * Scale shape: [[duplicateSpans]]' stages plus an id-equi join of the
    * token stream against the per-doc span list (spans are FEW per doc;
    * the range predicate rides the id join — never a corpus range join)
    * and one groupBy(id) reassembly. Returns
    * `(idCol, textCol, n_tokens, n_dropped)` — every input document
    * appears, dup-free ones unchanged (modulo whitespace), a fully-
    * duplicated one with empty text. */
  def removeDuplicateSpans(
      docs: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      k: Int = 5): DataFrame =
    exciseSpans(docs, duplicateSpans(docs, idCol, textCol, k), idCol, textCol)

  /** SPAN-level DECONTAMINATION detection: every maximal token interval of
    * `docs` covered by k-token shingles that ALSO occur in `bench` (the
    * held-out eval set). [[graft.operators.TextAnalysis.contamination]]
    * FLAGS whole documents; this localizes the overlap so
    * [[decontaminateSpans]] can cut only the leaked text and keep the
    * rest of the document — the treatment large-model training pipelines
    * apply before a data freeze.
    *
    * Scale shape: both shingle passes are corpus-linear projections; the
    * benchmark's distinct shingle-hash set is benchmark-sized (tiny next
    * to the corpus — Spark broadcasts it when it fits) and marking is a
    * LEFT SEMI join, so corpus shingles never shuffle more than once;
    * merging is the per-document window. Same k-exactness as
    * [[duplicateSpans]]: any leaked run of >= k tokens is found. */
  def contaminatedSpans(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      benchIdCol: String = "id",
      benchTextCol: String = "text",
      k: Int = 5): DataFrame = {
    require(k >= 1, s"shingle width must be positive, got $k")
    val benchHashes = tokenShingles(bench, benchIdCol, benchTextCol, k)
      .select(col("__h")).distinct()
    val marked = tokenShingles(docs, idCol, textCol, k)
      .join(benchHashes, Seq("__h"), "left_semi")
      .select(col(idCol), col("st"))
    mergeSpans(marked, idCol, k)
  }

  /** APPLY step for [[contaminatedSpans]]: rewrite each document with its
    * benchmark-overlapping spans excised — surgical decontamination that
    * keeps the rest of the document (dropping whole flagged documents
    * wastes the 99% that never leaked). Same output contract as
    * [[removeDuplicateSpans]]. */
  def decontaminateSpans(
      docs: DataFrame,
      bench: DataFrame,
      idCol: String = "id",
      textCol: String = "text",
      benchIdCol: String = "id",
      benchTextCol: String = "text",
      k: Int = 5): DataFrame =
    exciseSpans(docs,
      contaminatedSpans(docs, bench, idCol, textCol, benchIdCol, benchTextCol, k),
      idCol, textCol)

  /** Excise `spans` `(idCol, span_start, span_end)` from `docs`: tokens
    * whose 1-based ordinal falls inside any of the document's spans drop,
    * survivors reassemble in order (single-spaced — the span family
    * operates on the token stream). Spans must be disjoint per doc (the
    * [[mergeSpans]] output invariant), so the left join never duplicates
    * rows. Returns `(idCol, textCol, n_tokens, n_dropped)` with every
    * input document present. */
  private def exciseSpans(
      docs: DataFrame,
      spanFrame: DataFrame,
      idCol: String,
      textCol: String): DataFrame = {
    // Array-level excision (round 9): the original form posexploded every
    // token into its own row, range-joined the whole token stream against
    // the span list, and reassembled with collect_list + array_sort —
    // three corpus-TOKEN-scale shuffles. Spans are FEW per doc and
    // disjoint (the mergeSpans invariant), so instead: group them into a
    // per-doc array (span-row-scale shuffle), one id-equi join onto the
    // docs, and drop in-span tokens with an indexed higher-order filter —
    // the token stream never leaves its document row and the only
    // corpus-scale movement is the docs side of one id join.
    val spansPerDoc = spanFrame
      .groupBy(col(idCol).as("__sid"))
      .agg(collect_list(struct(col("span_start"), col("span_end"))).as("__spans"))
    docs.select(col(idCol), col(textCol))
      .join(spansPerDoc, col(idCol) === col("__sid"), "left")
      .withColumn("__toks", expr(s"regexp_extract_all(lower($textCol), '\\\\w+', 0)"))
      .withColumn("__sp", coalesce(col("__spans"),
        expr("CAST(array() AS ARRAY<STRUCT<span_start: BIGINT, span_end: BIGINT>>)")))
      .withColumn("__kept", expr(
        "filter(__toks, (t, i) -> NOT exists(__sp, " +
          "s -> i + 1 >= s.span_start AND i + 1 <= s.span_end))"))
      .select(col(idCol),
        concat_ws(" ", col("__kept")).as(textCol),
        size(col("__toks")).cast("long").as("n_tokens"),
        (size(col("__toks")) - size(col("__kept"))).cast("long").as("n_dropped"))
  }

  /** Distinct word n-gram shingle sets `(id, s)`. */
  def shingles(docs: DataFrame, idCol: String, textCol: String, n: Int = 3): DataFrame =
    Lexical.ngrams(docs, idCol, textCol, n)
      .select(col("id"), col("ngram").as("s")).distinct()

  /** MinHash signatures `(id, h, mh)`: ONE md5 per shingle, then a universal
    * hash family `mh_h = ((2h+1)*x + 7919h) mod (2^31-1)` over the 31-bit
    * residue — 16x cheaper than hashing `seed:shingle` strings, still
    * engine-portable (products stay < 2^41, no int64 overflow divergence).
    * Linear in corpus size x H; the explode stays inside one stage (no
    * shuffle until the min-aggregate, which combines map-side). */
  def minhash(shingleDf: DataFrame, numHashes: Int): DataFrame =
    shingleDf
      .select(col("id"), (hash60(col("s")) % lit(2147483647L)).as("x"))
      .select(col("id"), explode(sequence(lit(1), lit(numHashes))).as("h"), col("x"))
      .select(col("id"), col("h"),
        (((col("h") * 2 + 1) * col("x") + col("h") * lit(7919L)) % lit(2147483647L)).as("hv"))
      .groupBy(col("id"), col("h"))
      .agg(min(col("hv")).as("mh"))

  /** LSH band buckets `(id, band, bucket)`: rows-per-band consecutive
    * minhashes concatenated and re-hashed. Docs sharing any (band, bucket)
    * are near-dup candidates. */
  def lshBuckets(minhashDf: DataFrame, rowsPerBand: Int): DataFrame =
    minhashDf
      .withColumn("band", floor((col("h") - 1) / lit(rowsPerBand)))
      .groupBy(col("id"), col("band"))
      .agg(sort_array(collect_list(struct(col("h"), col("mh")))).as("sig"))
      .select(col("id"), col("band"),
        hash60(concat_ws(",", expr("transform(sig, x -> cast(x.mh as string))"))).as("bucket"))

  /** [[minhash]] + [[lshBuckets]] fused into ONE aggregation: all H minhash
    * values are H `min` columns of a single groupBy(id) (map-side combined,
    * no H-fold row explode, no second (id,band) shuffle), and band buckets
    * are a projection over the wide row. Identical values to the row-form
    * pipeline — same hash family, same `sig` encoding — at 1/(H)th the
    * shuffled rows and two fewer shuffles. */
  def minhashBuckets(
      shingleDf: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame =
    minhashBucketsFromHashes(
      shingleDf.select(col("id"), hash60(col("s")).as("hv")),
      numHashes, rowsPerBand)

  /** [[minhashBuckets]] from PRE-HASHED shingles `(id, hv)` — the form
    * the persisted signature index stores (8-byte keys, no n-gram
    * strings; the incremental store and `MinhashArtifacts` both land
    * this table). Identical values: `x = hash60(s) mod p == hv mod p`. */
  def minhashBucketsFromHashes(
      hashed: DataFrame, numHashes: Int, rowsPerBand: Int): DataFrame = {
    require(numHashes % rowsPerBand == 0, "numHashes must divide into bands")
    val mins = (1 to numHashes).map { h =>
      min((col("x") * lit(2L * h + 1) + lit(7919L * h)) % lit(2147483647L))
        .as(s"__mh$h")
    }
    val bandCols = (0 until numHashes / rowsPerBand).map { b =>
      val sig = concat_ws(",",
        (1 to rowsPerBand).map(r => col(s"__mh${b * rowsPerBand + r}").cast("string")): _*)
      struct(lit(b.toLong).as("band"), hash60(sig).as("bucket"))
    }
    hashed
      .select(col("id"), (col("hv") % lit(2147483647L)).as("x"))
      .groupBy(col("id"))
      .agg(mins.head, mins.tail: _*)
      .select(col("id"), explode(array(bandCols: _*)).as("__bb"))
      .select(col("id"), col("__bb.band").as("band"), col("__bb.bucket").as("bucket"))
  }

  /** Candidate pairs `(i, j)` sharing >= 1 LSH bucket (i < j, distinct). */
  def lshCandidates(buckets: DataFrame): DataFrame = {
    val a = buckets.select(col("band"), col("bucket"), col("id").as("i"))
    val b = buckets.select(col("band"), col("bucket"), col("id").as("j"))
    a.join(b, Seq("band", "bucket")).filter(col("i") < col("j"))
      .select(col("i"), col("j")).distinct()
  }

  /** Exact Jaccard over given pairs: per-candidate verification join
    * (candidates x shingles, never all-pairs). Shingles are HASHED to
    * 8-byte keys before the join — at corpus scale the intersection
    * shuffle moves fixed-width longs instead of n-gram strings. The same
    * hash is used on the oracle side, so the (astronomically rare)
    * collision affects both engines identically. */
  def verifyJaccard(pairs: DataFrame, shingleDf: DataFrame): DataFrame =
    verifyJaccardHashed(pairs,
      shingleDf.select(col("id"), hash60(col("s")).as("hv")))

  /** [[verifyJaccard]] against PRE-HASHED shingles `(id, hv)` — the
    * artifact-fed serving form ([[minhashBucketsFromHashes]]' sibling). */
  def verifyJaccardHashed(pairs: DataFrame, hashed: DataFrame): DataFrame = {
    // three consumers (sizes + both join sides): stage a computed shingle
    // pipeline once (r18); the artifact-fed form passes a parquet scan,
    // which the cost gate leaves un-staged
    val h = Mat.stageIfExpensive(hashed)
    val sizes = h.groupBy(col("id")).agg(count(lit(1)).as("n"))
    val shA = h.select(col("id").as("i"), col("hv"))
    val shB = h.select(col("id").as("j"), col("hv"))
    pairs
      .join(shA, Seq("i")).join(shB, Seq("j", "hv"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("i"), col("n").as("ni")), Seq("i"))
      .join(sizes.select(col("id").as("j"), col("n").as("nj")), Seq("j"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") / (col("ni") + col("nj") - col("inter"))).as("jaccard"))
  }

  /** MinHash-LSH near-dup pipeline: signatures -> band buckets -> candidate
    * pairs -> exact-Jaccard verify -> threshold. */
  def minhashLshPairs(
      docs: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 16, rowsPerBand: Int = 2,
      shingleN: Int = 3, threshold: Double = 0.5): DataFrame = {
    // the shingle pass feeds the banding aggregate AND the verify side
    // (which reads it three more times) — stage it once (r18)
    val sh = Mat.stageIfExpensive(shingles(docs, idCol, textCol, shingleN))
    val cands = lshCandidates(minhashBuckets(sh, numHashes, rowsPerBand))
    verifyJaccard(cands, sh).filter(col("jaccard") >= threshold)
  }

  /** ARTIFACT-FED [[minhashLshPairs]]: candidates from a PERSISTED
    * bucket table, exact-Jaccard verification against the PERSISTED
    * hashed-shingle table — zero corpus tokenization at query time (the
    * fit-once/load-don't-refit discipline every fitted index here
    * follows; the incremental streaming store maintains the same two
    * tables batch by batch). Values identical to the one-shot pipeline
    * by construction — the artifacts ARE its intermediates. */
  def minhashLshPairsFromIndex(
      hashed: DataFrame, buckets: DataFrame,
      threshold: Double = 0.5): DataFrame =
    verifyJaccardHashed(lshCandidates(buckets), hashed)
      .filter(col("jaccard") >= threshold)

  /** Exact all-pairs n-gram Jaccard (blocked on shared shingles) — the
    * small-data oracle for [[minhashLshPairs]]. Single pass: the shingle
    * self-join feeds the intersection count directly (no candidate
    * materialization + re-join).
    *
    * ORACLE FORM, guarded like [[cosinePairs]]: the blocking is only as
    * good as the shingle distribution — one hot shingle shared by half
    * the corpus (boilerplate) makes that block's self-join quadratic in
    * the corpus, so the guard is on DOCUMENT count, not shingle count.
    * The scale form is [[minhashLshPairs]] (banded candidates, exact
    * verify on candidates only). */
  def jaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, threshold: Double = 0.5,
      maxRows: Long = 100000L): DataFrame = {
    // CHEAP bound probe (the bpeFit maxLocalVocab pattern): limit(max+1)
    // stops the scan at the boundary instead of a full corpus count on
    // every happy-path invocation (limit takes an Int; a maxRows past
    // Int range — absurd for an all-pairs oracle — probes by full count)
    val over =
      if (maxRows < Int.MaxValue)
        docs.limit(maxRows.toInt + 1).count() > maxRows
      else docs.count() > maxRows
    require(!over,
      s"jaccardPairs is the all-pairs ORACLE form: docs exceed maxRows=" +
        s"$maxRows (a hot shared shingle makes its block quadratic). Use " +
        "minhashLshPairs (banded candidates + exact verify), or raise " +
        "maxRows deliberately.")
    // hash-first (see verifyJaccard): the blocked self-join shuffles longs.
    // The hashed-shingle frame feeds the size aggregate AND both self-join
    // sides — without staging, the tokenize + explode + DISTINCT shuffle
    // ran three times (r18; this oracle form is corpus-bounded by maxRows,
    // so the staged frame is bounded too)
    val sh = Mat.stageIfExpensive(shingles(docs, idCol, textCol, shingleN)
      .select(col("id"), hash60(col("s")).as("hv")))
    val sizes = sh.groupBy(col("id")).agg(count(lit(1)).as("n"))
    sh.select(col("id").as("i"), col("hv"))
      .join(sh.select(col("id").as("j"), col("hv")), Seq("hv"))
      .filter(col("i") < col("j"))
      .groupBy(col("i"), col("j")).agg(count(lit(1)).as("inter"))
      .join(sizes.select(col("id").as("i"), col("n").as("ni")), Seq("i"))
      .join(sizes.select(col("id").as("j"), col("n").as("nj")), Seq("j"))
      .select(col("i"), col("j"),
        (col("inter").cast("double") / (col("ni") + col("nj") - col("inter"))).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }

  /** SimHash fingerprint (63 bit): per token-bit, sum +tf/-tf by bit parity
    * of the token hash; bit set where the sum is positive. Integer weights
    * keep the whole computation exact.
    *
    * Shape: one aggregation column per bit in a single groupBy — no 63x row
    * explosion, one shuffle over the postings, all inside codegen (8.6s ->
    * sub-second at sf0.1 vs the explode form). */
  def simhash(docs: DataFrame, idCol: String, textCol: String, bits: Int = 63): DataFrame = {
    val post = Lexical.postings(docs, idCol, textCol) // (id, term, tf)
    val bitSums = (0 until bits).map { b =>
      sum(when(expr(s"(shiftright(hv, $b) & 1) = 1"), col("tf"))
        .otherwise(-col("tf"))).as(s"__s$b")
    }
    post
      .select(col("id"), col("tf"), hash60(col("term")).as("hv"))
      .groupBy(col("id"))
      .agg(bitSums.head, bitSums.tail: _*)
      .select(col("id"),
        (0 until bits).map(b =>
          when(col(s"__s$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** SimHash near-dup pairs with EXACT recall via pigeonhole banding: split
    * the `bits`-bit fingerprint into `maxHamming + 1` equal bands — any two
    * fingerprints within `maxHamming` must agree on at least one whole band
    * (<= maxHamming differing bits cannot touch all maxHamming+1 bands) —
    * equi-join on (band, value) for candidates, then verify the exact
    * hamming distance. Identical result set to the all-pairs cross join,
    * but corpus-linear until the candidate-only verification: the scale
    * form of simhash dedup. */
  def simhashPairsBanded(
      fp: DataFrame, maxHamming: Int = 6, bits: Int = 63): DataFrame = {
    val bands = maxHamming + 1
    require(bits % bands == 0, s"bits=$bits must split into ${bands} bands")
    val bandBits = bits / bands
    val mask = (1L << bandBits) - 1
    val bandCols = (0 until bands).map { b =>
      struct(lit(b.toLong).as("band"),
        (shiftright(col("simhash"), b * bandBits).bitwiseAND(lit(mask))).as("bucket"))
    }
    val bucketed = fp
      .select(col("id"), col("simhash"), explode(array(bandCols: _*)).as("__bb"))
      .select(col("id"), col("simhash"),
        col("__bb.band").as("band"), col("__bb.bucket").as("bucket"))
    val a = bucketed.select(col("band"), col("bucket"),
      col("id").as("i"), col("simhash").as("ha"))
    val b = bucketed.select(col("band"), col("bucket"),
      col("id").as("j"), col("simhash").as("hb"))
    a.join(b, Seq("band", "bucket")).filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        expr("bit_count(ha ^ hb)").cast("long").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** [[simhashPairsBanded]] for MULTI-WORD fingerprints — the scale form
    * of banded Hamming pairing for fingerprints wider than one BIGINT
    * ([[graft.operators.Multimodal.aHashWide]]). Each ARRAY WORD is one
    * whole band: pigeonhole exact recall holds whenever the array is
    * longer than `maxHamming` (≤ maxHamming differing bits cannot touch
    * every word), and per-band collision probability for unrelated
    * content is `2^-bandBits` of the word width — the wider the words,
    * the smaller the `N²/2^bandBits` candidate term that dominates the
    * 63-bit form at large N. Candidates equi-join on (band index, word
    * value); the exact Hamming verify (`Σ bit_count(xorᵥ)`) runs on
    * candidates only. Identical result set to the all-pairs cross join. */
  def hammingPairsBandedWide(fp: DataFrame, maxHamming: Int = 6): DataFrame = {
    // OPTIMIZER BARRIER on the fingerprint input: posexplode makes the
    // optimizer infer `size(ahash) > 0 AND isnotnull(ahash)` filters and
    // push them BELOW the projection that computes the fingerprint,
    // re-inlining the whole cells-many-md5 expression into each filter
    // conjunct (measured ~10x the fingerprint cost at sf0.1). The RDD
    // round-trip pins the column as computed data — each join side then
    // evaluates the fingerprint exactly once. (At artifact scale the
    // caller persists fingerprints like any other fitted store; the
    // barrier covers the compute-inline usage.)
    // r18: the RDD round-trip was a pure optimizer BARRIER — as an
    // unpersisted lineage it still recomputed the cells-many-md5
    // fingerprint once per join side. Mat.materialize is the same barrier
    // (LogicalRDD) with the compute pinned to ONE evaluation.
    val fpCols = fp.select(col("id"), col("ahash"))
    val fpM = Mat.materialize(fpCols)
    val bucketed = fpM
      // pigeonhole precondition, enforced per row: with <= maxHamming
      // words, maxHamming differing bits CAN touch every band and the
      // join would silently MISS pairs — exactly the failure a banded
      // exact-recall operator must never have quietly
      .filter(coalesce(
        expr(s"assert_true(size(ahash) > $maxHamming, " +
          s"'hammingPairsBandedWide needs more than maxHamming=$maxHamming " +
          "words for pigeonhole exact recall — widen the fingerprint or " +
          "lower maxHamming')"), lit(true)))
      .select(col("id"), col("ahash"),
        posexplode(col("ahash")).as(Seq("band", "bucket")))
    val a = bucketed.select(col("band"), col("bucket"),
      col("id").as("i"), col("ahash").as("fa"))
    val b = bucketed.select(col("band"), col("bucket"),
      col("id").as("j"), col("ahash").as("fb"))
    a.join(b, Seq("band", "bucket")).filter(col("i") < col("j"))
      .select(col("i"), col("j"),
        expr("aggregate(zip_with(fa, fb, (x, y) -> bigint(bit_count(x ^ y)))," +
          " 0L, (acc, h) -> acc + h)").as("hamming"))
      .filter(col("hamming") <= maxHamming)
      .distinct()
  }

  /** Driver-side twin of [[hash60]] (same md5-prefix formula), for building
    * tiny deterministic lookup tables that broadcast into plans. */
  def hash60Local(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    java.lang.Long.parseLong(d.take(8).map("%02x".format(_)).mkString.take(15), 16)
  }

  /** Sign-random-projection (SRP/SimHash-for-vectors, Charikar 2002) bits:
    * bit_h = [ sum_i v_i * r_{h,i} > 0 ] with pseudo-random +-1 projections
    * derived from the portable hash (`r_{h,i} = 2*(hash60("h:i") mod 2)-1`),
    * so both engines and every run build identical signatures.
    *
    * The bits x dim projection matrix only depends on (h, i): it's built
    * once on the driver and broadcast, so the corpus-side work is a pure
    * multiply-aggregate (no per-element hashing). Linear in
    * corpus x dim x bits; one shuffle for the per-(id,h) projection sums. */
  def srpBits(
      emb: DataFrame, idCol: String, vecCol: String, bits: Int, dim: Int): DataFrame = {
    val spark = emb.sparkSession
    import spark.implicits._
    val projections = (for (h <- 1 to bits; i <- 0 until dim)
      yield (h, i, (hash60Local(s"$h:$i") % 2 * 2 - 1).toDouble))
      .toDF("h", "i", "r")
    emb.select(col(idCol).as("id"), posexplode(col(vecCol)).as(Seq("i", "x")))
      .join(broadcast(projections), Seq("i"))
      .groupBy(col("id"), col("h"))
      .agg(sum(col("x").cast("double") * col("r")).as("proj"))
      .select(col("id"), col("h"), when(col("proj") > 0, 1L).otherwise(0L).as("mh"))
  }

  /** [[srpBits]] + [[lshBuckets]] fused into a MAP-ONLY projection: each
    * band bucket is computed per row from `bits` codegen'd dot products
    * against literal +-1 float vectors (the projection matrix, built on the
    * driver from the portable hash — same values as [[srpBits]]'s join
    * form). No posexplode, no projection join, no shuffle at all until the
    * candidate join: signature cost is exactly corpus x dim x bits multiplies
    * inside whole-stage codegen. */
  def srpBuckets(
      emb: DataFrame, idCol: String, vecCol: String,
      bits: Int, rowsPerBand: Int, dim: Int): DataFrame = {
    require(bits % rowsPerBand == 0, "bits must divide into bands")
    val bitCols = (1 to bits).map { h =>
      val r = (0 until dim).map(i => (hash60Local(s"$h:$i") % 2 * 2 - 1).toFloat).toArray
      when(VectorOps.dot(col(vecCol), typedlit(r)) > 0, 1L).otherwise(0L)
    }
    val bandCols = (0 until bits / rowsPerBand).map { b =>
      val sig = concat_ws(",",
        (1 to rowsPerBand).map(r => element_at(col("__sig"), b * rowsPerBand + r).cast("string")): _*)
      struct(lit(b.toLong).as("band"), hash60(sig).as("bucket"))
    }
    emb
      .select(col(idCol).as("id"), array(bitCols: _*).as("__sig"))
      .select(col("id"), explode(array(bandCols: _*)).as("__bb"))
      .select(col("id"), col("__bb.band").as("band"), col("__bb.bucket").as("bucket"))
  }

  /** SRP-LSH near-dup over embeddings: banded sign-bit buckets -> candidate
    * pairs -> exact-cosine verify -> threshold. The scale path that replaces
    * [[cosinePairs]]'s all-pairs join: every stage is corpus-linear except
    * the candidate-only verification. */
  def srpCosinePairs(
      emb: DataFrame, idCol: String, vecCol: String,
      bits: Int = 16, rowsPerBand: Int = 4, threshold: Double = 0.45,
      dim: Int = 64): DataFrame = {
    val cands = lshCandidates(srpBuckets(emb, idCol, vecCol, bits, rowsPerBand, dim))
    val a = emb.select(col(idCol).as("i"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("j"), col(vecCol).as("vb"))
    cands.join(a, Seq("i")).join(b, Seq("j"))
      .select(col("i"), col("j"), VectorOps.dot(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** Canonical-id resolution over near-dup PAIRS: every document in a
    * connected component of the duplicate graph maps to the component's
    * minimum id (the row to keep). Iterative min-label propagation with
    * ADAPTIVE pointer doubling: the first rounds are plain propagation
    * (one neighbor-min shuffle each — dedup graphs are usually
    * star/clique-shaped and converge in 2-3 rounds, so the common case
    * pays nothing extra); if the graph is still changing after
    * `doublingAfter` rounds, every later round also shortcuts
    * label := min(label, label(label)), halving the remaining chain
    * distance per round — O(log diameter) convergence (the Pregel-style
    * large-star/small-star recipe) for templated/serial near-dup CHAINS,
    * whose diameter in web corpora can exceed any fixed round budget.
    * Each round is materialized (persist + count) and the loop stops at
    * the fixpoint; a non-converged exit THROWS — silently returning
    * partial labels would corrupt the drop set.
    *
    * A lazy `localCheckpoint` every 4th round bounds logical-plan growth
    * (each round's plan references the previous labels 2-3x, so lineage
    * grows exponentially in rounds even though the physical work is
    * cached). Superseded rounds are unpersisted as soon as the next is
    * materialized; the returned frame rides the final round's storage —
    * one (id, label) table, freed when the frame is garbage-collected.
    *
    * DRIVER-LOCAL FAST PATH (the powerIterate/bpeFit localization
    * discipline): the edge set after banding + threshold verification is
    * usually orders of magnitude smaller than the corpus — at bench
    * scale a few dozen rows — yet every propagation round still pays
    * fixed scheduler/shuffle overhead (measured: the CC loop dominated
    * q39's stage profile on a 39-edge graph). The routing bound is
    * decided by a persist + full `count()` of the pair frame (NOT a
    * `limit(max+1)` probe — CollectLimit's incremental executor re-ran
    * the pair pipeline's final stage several times, a measured ~1 s
    * regression; the persisted count pays the pipeline exactly once and
    * the collect below reuses the cache). At or under `maxLocalEdges`
    * the pairs collect once and resolve by union-find with
    * union-to-smaller-root — the root IS the component minimum, so the
    * output is the identical (id, keep_id) relation (parity spec-pinned,
    * DedupSpec). Past the bound — real web-scale duplicate graphs — the
    * distributed loop runs unchanged.
    *
    * DRIVER MEMORY: the default `maxLocalEdges` = 2^20 admits up to ~1M
    * edge Rows onto the driver plus a HashMap of up to ~2M (id → root)
    * entries — roughly 200-300 MB transient heap at the bound. That is
    * fine on this project's 128 GiB driver but is a real OOM hazard on a
    * small-heap driver that the always-distributed path never had: on
    * constrained drivers pass `maxLocalEdges` explicitly (e.g. 1 << 14 ≈
    * 16k edges ≈ a few MB), or 0 to force the distributed loop. */
  def canonicalIds(
      pairs: DataFrame, maxIter: Int = 20, doublingAfter: Int = 4,
      maxLocalEdges: Int = 1 << 20): DataFrame = {
    val spark0 = pairs.sparkSession
    // materialize the (possibly expensive) pair pipeline ONCE and route
    // on the cached count. NOT limit(max+1).collect(): CollectLimit
    // executes the final stage incrementally (1, then 4x, ... partitions)
    // and re-ran the whole pipeline's last stage several times — measured
    // as a uniform ~1 s regression across every canonicalIds consumer in
    // the first cut of this fast path.
    val p0 = pairs.select(col("i"), col("j")).persist()
    val nEdges = p0.count()
    if (nEdges <= maxLocalEdges) {
      val probe = p0.collect()
      p0.unpersist()
      val parent = new java.util.HashMap[Long, Long]()
      def find(x: Long): Long = {
        var r = x
        while (parent.get(r) != r) r = parent.get(r)
        var c = x
        while (c != r) { val n = parent.get(c); parent.put(c, r); c = n }
        r
      }
      probe.foreach { row =>
        val a = row.getAs[Number](0).longValue()
        val b = row.getAs[Number](1).longValue()
        parent.putIfAbsent(a, a)
        parent.putIfAbsent(b, b)
        val ra = find(a); val rb = find(b)
        // union-to-smaller-root: the root stays the component MINIMUM,
        // exactly the distributed loop's min-label fixpoint
        if (ra < rb) parent.put(rb, ra)
        else if (rb < ra) parent.put(ra, rb)
      }
      val out = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]
      parent.keySet().forEach(id => out += ((id, find(id))))
      import spark0.implicits._
      val dt = pairs.schema("i").dataType
      return out.toSeq.toDF("id", "keep_id")
        .select(col("id").cast(dt), col("keep_id").cast(dt))
    }
    // already persisted above for the routing count; the union below
    // reads it twice (forward + reversed edge directions)
    val p = p0
    val edges = p.select(col("i").as("a"), col("j").as("b"))
      .unionByName(p.select(col("j").as("a"), col("i").as("b")))
      .persist()
    // initial labels are identity, so round 1 collapses to
    // min(id, min neighbor id) — computed directly, one fewer
    // materialized round (every node appears as `a` in the
    // bidirectional edge set)
    var labels = edges.groupBy(col("a")).agg(min(col("b")).as("__nmin"))
      .select(col("a").as("id"), least(col("a"), col("__nmin")).as("label"))
      .persist()
    var persisted = List(labels)
    var changed = 1L
    var it = 1
    while (changed > 0 && it < maxIter) {
      val neighborMin = edges
        .join(labels.select(col("id").as("b"), col("label").as("nl")), Seq("b"))
        .groupBy(col("a")).agg(min(col("nl")).as("nmin"))
      val prop = labels
        .join(neighborMin.select(col("a").as("id"), col("nmin")), Seq("id"), "left")
        .select(col("id"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          col("label").as("__old"))
      // pointer doubling against the previous round's labels:
      // label := min(label, label(label)). Every label value is a node id,
      // so the lookup always hits; left+coalesce guards regardless.
      // Engaged only once the graph has proven deeper than doublingAfter —
      // the extra label-lookup shuffle is pure overhead on shallow graphs.
      val round =
        if (it <= doublingAfter) prop
        else prop
          .join(labels.select(col("id").as("label"), col("label").as("__ll")),
            Seq("label"), "left")
          .select(col("id"),
            least(col("label"), coalesce(col("__ll"), col("label"))).as("label"),
            col("__old"))
      // lazy localCheckpoint every 4th round truncates lineage (the count
      // below materializes it); plain persist on the other rounds — an
      // EAGER final checkpoint was measured at ~2x the whole query cost
      // at bench scale, so the result intentionally rides the last
      // round's storage instead (see below)
      val next =
        if (it % 4 == 0) round.localCheckpoint(false) else round.persist()
      changed = next.filter(col("label") =!= col("__old")).count()
      // superseded PERSISTED rounds are uncached as soon as the new one is
      // materialized (unpersist is a no-op on checkpointed frames — their
      // blocks are freed by the context cleaner once the next truncation
      // drops the last lineage reference, so at most one checkpoint
      // interval of rounds is ever resident)
      persisted.foreach(_.unpersist())
      persisted = List(next)
      labels = next.select(col("id"), col("label"))
      it += 1
    }
    if (changed > 0)
      throw new IllegalStateException(
        s"canonicalIds did not converge within maxIter=$maxIter rounds " +
          "(label propagation still changing) — partial labels would " +
          "corrupt the dedup drop set; raise maxIter")
    edges.unpersist()
    p.unpersist()
    // the returned frame is backed by the FINAL round's persisted/
    // checkpointed storage — one (id, label) table, released when the
    // frame is garbage-collected; nothing else stays cached
    labels.select(col("id"), col("label").as("keep_id"))
  }

  /** KEEPER ELECTION BY QUALITY — the SemDeDup-flavoured refinement of
    * [[canonicalIds]]' min-id convention (Abbas et al. 2023 keep one
    * representative per semantic-duplicate cluster; production pipelines
    * keep the BEST one, not an arbitrary one): for each near-dup
    * component, elect the member with the highest score (id-ascending
    * tie-break so election is deterministic and oracle-checkable) and map
    * every member to it. Input `components` is [[canonicalIds]]' output
    * `(idCol, compCol)`; `scores` is any per-id quality signal — e.g.
    * [[graft.operators.TextAnalysis.qualityScore]] — pre-rounded by the
    * caller if cross-engine rank parity matters.
    *
    * Scale shape: one id-equi join (components are pair-list-sized, far
    * below corpus rows) and one window PARTITIONED by component — no
    * global window, no driver-side state. Returns
    * `(idCol, best_id, scoreCol, keep)`; the drop set is `keep = false`,
    * applied with the same anti-join as the min-id drop path. */
  def keepBest(
      components: DataFrame,
      scores: DataFrame,
      idCol: String = "id",
      compCol: String = "keep_id",
      scoreCol: String = "score"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(compCol))
      .orderBy(col(scoreCol).desc, col(idCol).asc)
    components.join(scores.select(col(idCol), col(scoreCol)), Seq(idCol))
      .withColumn("best_id", first(col(idCol)).over(w))
      .select(col(idCol), col("best_id"), col(scoreCol),
        (col(idCol) === col("best_id")).as("keep"))
  }

  /** Embedding-cosine near-dup pairs, exact ALL-PAIRS form — an O(N^2 d)
    * cartesian that exists ONLY as the small-N oracle for the blocked and
    * banded paths, and is GUARDED accordingly: a corpus above `maxRows`
    * throws with the routing advice instead of silently launching a
    * cross join that can never finish at scale. Production paths:
    * [[cosinePairsBlocked]] (IVF-cell blocking, exact verify) and
    * [[srpCosinePairs]] (SRP-LSH banding, exact verify). */
  def cosinePairs(
      emb: DataFrame, idCol: String, vecCol: String, threshold: Double,
      maxRows: Long = 100000L): DataFrame = {
    val n = emb.count()
    require(n <= maxRows,
      s"cosinePairs is the all-pairs ORACLE form: $n rows exceeds maxRows=" +
        s"$maxRows (${n * n} candidate pairs). Use cosinePairsBlocked " +
        "(IVF-cell blocking) or srpCosinePairs (SRP-LSH banding), or raise " +
        "maxRows deliberately.")
    val a = emb.select(col(idCol).as("i"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("j"), col(vecCol).as("vb"))
    a.crossJoin(b).filter(col("i") < col("j"))
      .select(col("i"), col("j"), VectorOps.dot(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }

  /** CELL-BLOCKED embedding-cosine near-dup pairs — the all-pairs killer
    * (VERDICT r6 #2): block candidates by IVF cell (each row joins its
    * top-`probes` cells against the broadcast centroid table — the
    * [[Similarity.assignCells]] packed argmax generalized to a top-p
    * slice, still map-only), pair WITHIN a cell, verify candidates by
    * exact cosine. No stage is all-pairs: candidate volume is
    * sum(|cell|^2) over cells instead of N^2 — with k ~ sqrt(N) cells
    * (the [[Similarity.IvfParams.auto]] build), per-cell sizes stay
    * bounded and the pair join is an ordinary hash equi-join on the cell
    * key. Scores are EXACT (the block only gates candidacy); recall is
    * bounded by co-probing — a pair lands together when ANY of their
    * top-p cells coincide, so raising `probes` trades candidate volume
    * for recall exactly like LSH band count. `probes` >= the centroid
    * count degenerates to all-pairs (every pair co-blocked) — the
    * property [[DedupSpec]] pins against [[cosinePairs]].
    *
    * `centroids` is the fitted (cluster, cv) artifact
    * ([[Similarity.buildDenseIndex]] / [[Similarity.kmeansFit]]) — the
    * same build-time artifact ANN serving reads; blocking reuses it
    * instead of training anything. Ties and rounding mirror
    * [[Similarity.assignCells]] (sim rounded to `simRound`, ties to the
    * lower cluster id), so the blocked result is oracle-checkable. */
  def cosinePairsBlocked(
      emb: DataFrame, centroids: DataFrame, idCol: String, vecCol: String,
      threshold: Double, probes: Int = 2,
      clusterCol: String = "cluster", simRound: Int = 6): DataFrame = {
    require(probes >= 1, s"probes must be >= 1, got $probes")
    val centArr = centroids.agg(array_sort(
      collect_list(struct(col(clusterCol).cast("int").as("c"), col("cv")))).as("__cents"))
    val scored = transform(col("__cents"), c => struct(
      round(VectorOps.dot(col(vecCol), c.getField("cv")), simRound).as("sim"),
      (lit(0) - c.getField("c")).as("negc")))
    // descending (sim, negc) puts the best-sim, lowest-id cells first —
    // element 1..probes is the top-p assignment, exploded to (id, cell)
    val blocked = emb.filter(col(vecCol).isNotNull)
      .crossJoin(broadcast(centArr))
      .select(col(idCol).as("id"),
        explode(slice(reverse(array_sort(scored)), 1, probes)).as("__s"))
      .select(lit(0L).as("band"), (lit(0) - col("__s.negc")).as("bucket"), col("id"))
    val cands = lshCandidates(blocked)
    val a = emb.select(col(idCol).as("i"), col(vecCol).as("va"))
    val b = emb.select(col(idCol).as("j"), col(vecCol).as("vb"))
    cands.join(a, Seq("i")).join(b, Seq("j"))
      .select(col("i"), col("j"), VectorOps.dot(col("va"), col("vb")).as("cos"))
      .filter(col("cos") >= threshold)
  }
}
