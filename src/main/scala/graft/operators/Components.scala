package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.CacheScope.TrackedDataFrame

/** Distributed CONNECTED COMPONENTS over an edge list — the shared
  * fixpoint kernel behind transitive fuzzy grouping
  * ([[Fuzzy.groupConnected]]) and duplicate-cluster assignment
  * ([[Dedup.duplicateClusters]]).
  *
  * Min-label propagation with pointer jumping: labels start at own
  * id; each round (1) lowers a node's label to the min over its
  * neighbors' labels (one edges⋈labels shuffle), then (2)
  * short-circuits chains by following the new label's own label (one
  * labels⋈labels shuffle) — the path-halving step that turns
  * O(diameter) rounds into O(log diameter), the published
  * MapReduce-CC shape (Kiveris et al., "Connected Components in
  * MapReduce and Beyond", SOCC'14). Every round localCheckpoints the
  * narrow (id,label) table, so the plan never grows with iteration
  * count. Labels only decrease and are bounded below by the component
  * min, so the fixpoint is exact: at convergence both endpoints of
  * every edge carry equal labels, and that label is the component's
  * minimum id.
  */
object Components {

  /** @param nodes single-column frame of node ids (column `idCol`);
    *              isolated nodes (no edges) keep their own id as label
    * @param edges two-column frame (`srcCol`, `dstCol`) of UNDIRECTED
    *              edges — symmetrization happens inside
    * @return (idCol, `component`) — component = min node id reachable
    */
  def connected(
      nodes: DataFrame, idCol: String,
      edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 30): DataFrame = {
    val sym = edges.select(col(srcCol).as("__a"), col(dstCol).as("__b"))
      .unionByName(edges.select(col(dstCol).as("__a"), col(srcCol).as("__b")))
      .persistTracked() // reused every round
    var labels = nodes
      .select(col(idCol).as("__id"), col(idCol).as("__lbl"))
      .localCheckpoint(true)
    var converged = false
    var it = 0
    while (!converged && it < maxIters) {
      val nbrMin = sym.join(labels, col("__b") === col("__id"))
        .groupBy(col("__a")).agg(min(col("__lbl")).as("__nlbl"))
      // __prev rides along so convergence is a FILTER on the round's
      // own checkpointed output instead of a join back against the
      // previous labels — one join and one shuffle fewer per round
      val stepped = labels
        .join(nbrMin, col("__id") === col("__a"), "left")
        .select(col("__id"), col("__lbl").as("__prev"),
          least(col("__lbl"), coalesce(col("__nlbl"), col("__lbl"))).as("__lbl"))
      // pointer jump: lbl ← label(lbl). Every label value is itself a
      // node id (labels are only ever ids propagated by min), so the
      // lookup always resolves; the left join + coalesce is belt for
      // the empty-graph edge case.
      val jumpMap = stepped
        .select(col("__id").as("__jid"), col("__lbl").as("__jlbl"))
      val jumped = stepped
        .join(jumpMap, col("__lbl") === col("__jid"), "left")
        .select(col("__id"), col("__prev"),
          least(col("__lbl"), coalesce(col("__jlbl"), col("__lbl"))).as("__lbl"))
        .localCheckpoint(true)
      converged = jumped.filter(col("__lbl") < col("__prev")).isEmpty
      labels = jumped.select(col("__id"), col("__lbl"))
      it += 1
    }
    require(converged,
      s"Components.connected: no fixpoint after $maxIters rounds — " +
        "the graph is pathologically deep; raise maxIters only if the " +
        "component structure is genuinely expected")
    labels.select(col("__id").as(idCol), col("__lbl").as("component"))
  }
}
