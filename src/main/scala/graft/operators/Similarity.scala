package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Scale design: `bruteKnn` broadcasts the (small) query set against the
  * full corpus — a map-side-only plan with zero shuffle of the corpus, the
  * right baseline when |queries| << |corpus|. `lshKnn` buckets both sides
  * by sign-bit LSH first, turning all-pairs into a per-bucket equi-join;
  * recall is traded via the number of hyperplane bits. On a cluster the
  * corpus side would additionally be bucketed-by on the LSH key at write
  * time to skip the shuffle entirely.
  */
object Similarity {

  /** Exact top-k cosine neighbors for each query vector (brute force).
    * Expects `vec_id` + `embedding ARRAY<FLOAT>` on both sides.
    */
  def bruteKnn(queries: DataFrame, corpus: DataFrame, k: Int): DataFrame = {
    val q = broadcast(queries.select(col("vec_id").as("query_id"), col("embedding").as("qv")))
    val c = corpus.select(col("vec_id").as("neighbor_id"), col("embedding").as("cv"))
    val scored = q.join(c, col("query_id") =!= col("neighbor_id"))
      .select(col("query_id"), col("neighbor_id"), cosine(col("qv"), col("cv")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }

  /** LSH-bucketed ANN: candidates share the sign-bit bucket; top-k within
    * bucket. `dims` picks the hyperplane coordinates (1-based).
    */
  def lshKnn(vectors: DataFrame, k: Int, dims: Seq[Int] = Seq(1, 9, 17, 25, 33, 41, 49, 57)): DataFrame = {
    val b = vectors.select(col("vec_id"), col("embedding"),
      signBucket(col("embedding"), dims).as("bucket"))
    val a = b.alias("a"); val c = b.alias("b")
    val scored = a.join(c, col("a.bucket") === col("b.bucket") &&
        col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"), col("b.vec_id").as("neighbor_id"),
        cosine(col("a.embedding"), col("b.embedding")).as("cos"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("query_id").orderBy(col("cos").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w).cast("long")).filter(col("rank") <= k)
  }
}
