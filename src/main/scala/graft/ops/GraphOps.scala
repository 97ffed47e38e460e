package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Graph analytics over edge lists — the dup-pair graphs the dedup tiers
 * emit (`DedupOps.minhashLshPairs` etc.) are undirected graphs, and
 * connected components (`DedupOps.connectedComponentsStar`) is already a
 * first-class operator; triangle counting is the next standard metric
 * (clustering coefficient, community density, spam-farm detection).
 */
object GraphOps {

  /**
   * Per-node triangle counts over an undirected edge list. Edges are
   * canonicalized (lower id first, self-loops and duplicates dropped);
   * emits (node, n_triangles) for every node in at least one triangle.
   *
   * Implementation is the degree-orientation (node-iterator++) algorithm:
   * orient every edge from its lower-(degree, id) endpoint to the higher;
   * each triangle then has exactly ONE apex whose two oriented out-edges
   * form the wedge, closed by a canonical-edge lookup. Wedge volume is
   * Σ out-deg², and orientation bounds out-degree by O(√m) — the hot
   * celebrity node of the naive wedge join (Σ deg² blowup) becomes a
   * wedge SINK instead of a wedge source. Three hash joins on node/edge
   * keys, no all-pairs step; this is the standard MapReduce/GraphX
   * triangle scheme.
   */
  def triangleCounts(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e = edges
      .select(least(col(src), col(dst)).as("a"),
        greatest(col(src), col(dst)).as("b"))
      .filter(col("a") =!= col("b") && col("a").isNotNull &&
        col("b").isNotNull)
      .distinct()
    val deg = e.select(col("a").as("n"))
      .unionAll(e.select(col("b").as("n")))
      .groupBy("n").agg(count(lit(1)).as("d"))
    val oriented = e
      .join(deg.select(col("n").as("a"), col("d").as("da")), "a")
      .join(deg.select(col("n").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
          (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v")))
          .as("o"))
      .select(col("o.u").as("u"), col("o.v").as("v"))
    val wedges = oriented.as("e1")
      .join(oriented.as("e2"), col("e1.u") === col("e2.u") &&
        col("e1.v") < col("e2.v"))
      .select(col("e1.u").as("apex"), col("e1.v").as("a"),
        col("e2.v").as("b"))
    val triangles = wedges.join(e, Seq("a", "b"))
    triangles
      .select(explode(array(col("apex"), col("a"), col("b"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }
}
