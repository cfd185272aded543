package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation utilities (SURVEY §4 physical notes: "skewed keys ->
  * salting or AQE skew-join"). AQE's runtime skew-join split handles most
  * cases; these are the explicit forms for when the skew is known up front
  * (a hot video, a hot term in postings, a mega-cluster in IVF).
  */
object Skew {

  /** Two-phase salted aggregation: pre-aggregate on (key, salt) — spreading
    * one hot key over `salts` reducers — then finish on key. `saltExpr`
    * must be deterministic (derive it from a row id, not rand(), so retries
    * and oracle comparison stay stable). */
  def saltedSum(
      df: DataFrame, key: Column, value: Column, saltExpr: Column): DataFrame =
    df.groupBy(key.as("__k"), saltExpr.as("__salt"))
      .agg(sum(value).as("__partial"))
      .groupBy(col("__k"))
      .agg(sum(col("__partial")).as("sum"))
      .withColumnRenamed("__k", "key")

  /** Salted equi-join: the left (skewed) side gets a deterministic salt in
    * [0, salts); the right side is replicated across all salt values, so a
    * hot key's rows land on `salts` tasks instead of one. Result set is
    * identical to the unsalted join. */
  def saltedJoin(
      left: DataFrame, right: DataFrame, key: String,
      leftSaltSource: Column, salts: Int): DataFrame = {
    val l = left.withColumn("__salt", pmod(leftSaltSource, lit(salts)))
    val r = right.withColumn("__salt", explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, Seq(key, "__salt")).drop("__salt")
  }
}
