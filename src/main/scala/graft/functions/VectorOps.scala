package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns (SURVEY.md §2.4 E3).
  *
  * Everything is built from codegen'd higher-order functions
  * (`zip_with`/`aggregate`), computed in DOUBLE and summed left-to-right in
  * index order — deterministic across engines, so results are
  * oracle-hash-matchable. No UDFs: the expressions stay inside whole-stage
  * codegen and are safe for a 100 TB cross-join prune.
  */
object VectorOps {

  /** Cast an `array<float>` to `array<double>` so all accumulation is f64. */
  def f64(v: Column): Column = v.cast("array<double>")

  /** Dot product, left-to-right accumulation. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(f64(a), f64(b), (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm. */
  def normSq(a: Column): Column =
    aggregate(f64(a), lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(normSq(a))

  /** Cosine similarity: dot / (|a| * |b|). Mirrored literally by the DuckDB
    * oracle (`list_inner_product` + two sqrts) so float paths agree. */
  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /** Euclidean distance. */
  def l2Dist(a: Column, b: Column): Column =
    sqrt(aggregate(zip_with(f64(a), f64(b), (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x))
}
