package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operations over `array<float>` columns, written as
  * order-deterministic folds so the DuckDB oracle reproduces bit-identical
  * doubles (elements are cast to double BEFORE any arithmetic; both engines
  * then do identical IEEE-754 ops in identical order).
  *
  * Scale path: brute-force cosine is O(n) per probe (fine for single-probe
  * top-k); the pair operators bucket first (sign-LSH / IVF lists) so the
  * join never goes quadratic — SURVEY.md §7.4.6.
  */
object VectorOps {

  /** Order-deterministic dot product. Oracle mirror:
    * `list_reduce(list_prepend(0e0, list_transform(generate_series(1,len(a)),
    *  i -> CAST(a[i] AS DOUBLE) * CAST(b[i] AS DOUBLE))), (x,y) -> x+y)`.
    */
  def dot(a: Column, b: Column): Column =
    call_function("graft_dotf", a, b)

  /** Composed HOF form of dot — parity reference for the codegen'd
    * `graft_dotf` (FoldExpressions.DotF).
    */
  def dotHof(a: Column, b: Column): Column =
    Folds.sumZ(
      transform(
        sequence(lit(1), size(a)),
        i => element_at(a, i).cast("double") * element_at(b, i).cast("double")
      )
    )

  /** Cosine similarity dot/(|a||b|) with the same fold discipline. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))

  /** Sign-LSH bucket over the first `bits` dimensions: axis-aligned random
    * hyperplanes (the axes themselves — deterministic, needs no shared
    * random state with the oracle). bucket = Σ 2^(j-1)·[e_j > 0].
    */
  def signBucket(e: Column, bits: Int): Column =
    (1 to bits)
      .map(j => when(element_at(e, j) > lit(0.0f), lit(1L << (j - 1))).otherwise(lit(0L)))
      .reduce(_ + _)
}
