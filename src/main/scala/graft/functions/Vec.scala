package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector column math over `array<float>` embeddings.
  *
  * Everything is `aggregate(zip_with(...))` — a strict left-to-right
  * fold in double precision. Sequential order is load-bearing: it makes
  * the result independent of Spark partitioning AND bit-identical to
  * any engine that folds lists left-to-right (the DuckDB oracle's
  * `list_reduce`), per SURVEY §5. No UDFs, no linear-algebra library —
  * the hot loop stays inside Spark's row pipeline.
  */
object Vec {

  /** Σ aᵢ·bᵢ as a strict left fold: ((0+x₁)+x₂)+… Backed by a
    * codegen'd Catalyst expression ([[graft.plans.DotExpr]]) with the
    * identical accumulation order to
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)`; float inputs promote
    * per element exactly as CAST would. */
  def dot(a: Column, b: Column): Column = graft.plans.Exprs.dot(a, b)

  /** Euclidean norm (sqrt is correctly rounded per IEEE — identical on
    * every conforming engine). */
  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity; NaN on zero vectors (0/0), like the oracle. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
