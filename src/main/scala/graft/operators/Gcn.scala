package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph-convolution layer as a sparse Spark aggregation.
  *
  * The reference's GCN (pygcn.py:47-94, used by the TransMOT variants and
  * the placement policy net, placement_optimizer.py:31-54) computes
  * `spmm(adj, X·W)` — a sparse adjacency matrix times dense transformed
  * features. Distributed, that IS an edge-join plus a groupBy: transform
  * each node's features once (X·W, a broadcast-literal matmul fused into
  * whole-stage codegen), ship the transformed message along every edge,
  * and sum per destination. With mean normalization and self-loops this
  * is one mean-aggregator graph-conv layer:
  *
  *   h_i = ReLU( (1/|N(i)∪{i}|) · Σ_{j ∈ N(i)∪{i}} (X_j · W) )
  *
  * Scale shape: the only shuffle is the groupBy on destination node id —
  * messages are fout longs each, edges are processed streaming, and
  * nothing is ever materialized per-pair beyond the edge table itself.
  * Layers stack by feeding the output back as features.
  *
  * Cross-engine determinism: messages are integer-quantized
  * (floor(x·1e6)) BEFORE the neighbor sum — a per-node deterministic
  * computation — so the aggregation sums longs, which is
  * partition-order-independent where a double sum is not. ReLU and the
  * mean divide then happen on exact integers (`greatest(s,0) div deg`).
  *
  * @param nodes (idCol, features ARRAY<double> of length w.length)
  * @param edges undirected pairs (srcCol, dstCol); symmetrized and
  *              self-looped internally
  * @param w     fin x fout weight matrix (a literal; broadcast by value)
  * @return (idCol, h0..h{fout-1} LONG — the quantized activations)
  */
object Gcn {

  def layer(nodes: DataFrame, edges: DataFrame, w: Array[Array[Double]],
            idCol: String = "node_id", srcCol: String = "src",
            dstCol: String = "dst", scale: Double = 1e6): DataFrame = {
    val fin = w.length
    val fout = w(0).length
    // X·W, quantized: one literal-matmul projection per output dim
    def xwDim(d: Int): Column =
      floor((0 until fin).map(f => element_at(col("features"), f + 1) * lit(w(f)(d)))
        .reduce(_ + _) * lit(scale)).cast("long")
    val xw = nodes.select(
      (col(idCol).cast("long").as("j")) +:
        (0 until fout).map(d => xwDim(d).as(s"q$d")): _*)
    // adjacency with both directions + self-loops; canonicalize + distinct
    // first so duplicate rows, reversed duplicates, or an
    // already-symmetrized input can't double-count messages/deg
    val canon = edges
      .select(col(srcCol).cast("long").as("i"), col(dstCol).cast("long").as("j"))
      .filter(col("i") =!= col("j"))
      .select(least(col("i"), col("j")).as("i"), greatest(col("i"), col("j")).as("j"))
      .distinct()
    val adj = canon
      .union(canon.select(col("j").as("i"), col("i").as("j")))
      .union(nodes.select(col(idCol).cast("long").as("i"),
        col(idCol).cast("long").as("j")))
    // spmm: messages summed per destination; mean + ReLU on exact integers
    adj.join(xw, "j")
      .groupBy(col("i").as(idCol))
      .agg(count(lit(1)).as("deg"),
        (0 until fout).map(d => sum(col(s"q$d")).as(s"s$d")): _*)
      .select(
        col(idCol) +:
          (0 until fout).map(d =>
            // SQL `div`: exact integral division (matches DuckDB's `//`)
            expr(s"greatest(s$d, 0L) div deg").cast("long").as(s"h$d")): _*)
  }
}
