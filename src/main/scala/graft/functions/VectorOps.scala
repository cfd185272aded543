package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftshim.ColumnShim

/** Dense-vector column functions over `ARRAY<FLOAT>`.
  *
  * The reference keeps embeddings in FAISS flat indexes and scores them with
  * exact inner products (reference `utils/faiss_processing.py:94-166`,
  * `data_extraction/create_bin.ipynb` cells 3,8 — vectors are L2-normalized
  * at build time so IP == cosine). Here embeddings are an ordinary
  * `ARRAY<FLOAT>` column and scoring is a Catalyst expression, which keeps
  * the scan->score->top-k plan inside whole-stage codegen and lets Catalyst
  * push candidate filters *below* the scoring (the `IDSelectorArray`
  * pushdown of `faiss_processing.py:154-166`, for free).
  */
object VectorOps {

  /** Codegen'd dot product (the hot path). */
  def dot(a: Column, b: Column): Column =
    ColumnShim.column(
      DotProductF(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Reference implementation via SQL higher-order functions; same fold order
    * and accumulator type as [[dot]], used to cross-check it in tests. */
  def dotHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, v) => acc + v)

  def l2Norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize once at build time (reference `clip.ipynb` cell 7). */
  def l2Normalize(a: Column): Column = {
    val n = l2Norm(a)
    transform(a, x => (x.cast("double") / n).cast("float"))
  }

  /** Cosine similarity; equals [[dot]] when inputs are pre-normalized. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (l2Norm(a) * l2Norm(b))

  /** Squared L2 distance (codegen'd sequential double fold — the PQ
    * assignment hot path). */
  def sqDist(a: Column, b: Column): Column =
    ColumnShim.column(
      SqDistF(ColumnShim.expression(a), ColumnShim.expression(b)))

  /** Reference implementation via SQL higher-order functions; same fold
    * order and accumulator as [[sqDist]], used to cross-check it in
    * tests (mismatched lengths yield NULL here vs truncation there —
    * both sides are equal-length by the store invariant). */
  def sqDistHof(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => {
        val d = x.cast("double") - y.cast("double"); d * d
      }),
      lit(0.0),
      (acc, v) => acc + v)

  def euclidean(a: Column, b: Column): Column = sqrt(sqDist(a, b))
}
