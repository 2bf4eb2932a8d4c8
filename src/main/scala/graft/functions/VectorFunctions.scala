package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector column functions (similarity search over
  * `ARRAY<FLOAT>` columns). Built from higher-order builtin expressions —
  * zip_with/aggregate — so dot products run inside codegen without UDF
  * serialization overhead.
  *
  * Quantization note: `quantize` maps float32 vectors to exact BIGINT
  * vectors (floor(x*scale)). All integer arithmetic plus one final IEEE-754
  * double division/sqrt is bit-identical across engines, which makes
  * similarity thresholds and top-k ranks deterministic — the same trick
  * (int8 quantization) production ANN systems use for throughput.
  */
object VectorFunctions {

  /** Exact integer quantization of a float vector. */
  def quantize(v: Column, scale: Int = 1000): Column =
    transform(v, x => floor(x.cast("double") * scale).cast("long"))

  /** Dot product of two numeric arrays, accumulated in the element type. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Dot product in double (for float inputs). */
  def dotD(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  /** Squared L2 norm of an integer-quantized vector. */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x * x), lit(0L), (acc, x) => acc + x)

  /** Cosine similarity of two integer-quantized vectors (double result). */
  def cosineQ(a: Column, b: Column): Column =
    dot(a, b).cast("double") /
      (sqrt(normSq(a).cast("double")) * sqrt(normSq(b).cast("double")))

  /** Cosine similarity of two float vectors (double math). */
  def cosine(a: Column, b: Column): Column = {
    val n2 = (v: Column) =>
      aggregate(transform(v, x => x.cast("double") * x.cast("double")),
        lit(0.0), (acc, x) => acc + x)
    dotD(a, b) / (sqrt(n2(a)) * sqrt(n2(b)))
  }

  /** Random-hyperplane-style LSH bucket: the sign bits of the vector at
    * `dims` (1-based) concatenated to a string key. Vectors in the same
    * bucket are ANN candidates; at scale this turns the O(n²) all-pairs
    * search into a per-bucket equi-join.
    */
  def signBucket(v: Column, dims: Seq[Int]): Column =
    concat(dims.map(i => when(element_at(v, i) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
