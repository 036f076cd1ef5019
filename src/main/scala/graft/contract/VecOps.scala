package graft.contract

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Shared embedding-vector plumbing for the similarity / dedup queries:
  * one definition of the dot-product formulations and of the normalized
  * vector relation, so the cosine math can never drift between operators.
  */
private[contract] object VecOps {
  val Dim = 64

  /** Spark side: native codegen Catalyst expression (bit-identical to the
    * HOF fold — see [[graft.functions.DotProduct]]).
    */
  val dotSpark = "graft_dot(%s, %s)"

  /** DuckDB oracle: ordered left fold, same IEEE summation order. */
  def dotDuck(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0.0 AS DOUBLE), " +
      s"list_transform(generate_series(1, $Dim), i -> $a[CAST(i AS INTEGER)] * $b[CAST(i AS INTEGER)])), (acc, v) -> acc + v)"

  /** (vec_id, label, v: array<double>, nrm) — norm precomputed ONCE per
    * vector, never per pair.
    */
  def vecs(s: SparkSession, dir: String): DataFrame = {
    GraftFunctions.register(s)
    Tables.embeddings(s, dir)
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(expr(dotSpark.format("v", "v"))))
  }
}
