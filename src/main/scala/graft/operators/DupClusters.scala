package graft.operators

import graft.PlanCapture.CheckpointOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Duplicate-cluster resolution (SURVEY.md §2.4 extension): near-dup
  * detection emits PAIRS (qe2/qe2b/qe7b), but a training pipeline needs
  * CLUSTERS — "these 7 documents are all the same article" — so it can keep
  * one canonical survivor per group. Pairs → clusters is connected
  * components over the pair graph.
  *
  * Algorithm: distributed min-label propagation with pointer jumping —
  * each round every node takes the minimum label in its neighborhood
  * (one shuffle join + aggregation), then labels contract through their own
  * labels (`l(x) ← l(l(x))`, a second equi-join). Propagation alone needs
  * O(diameter) rounds; the jump step halves chain depth each round, giving
  * O(log n) rounds like the hash-to-min algorithm (Rastogi et al., "Finding
  * Connected Components in Map-Reduce", ICDE 2013). Every round is plain
  * equi-join + groupBy — shuffles on node id, no cross products, and
  * `localCheckpoint` truncates the otherwise-exponential iterative lineage.
  * The driver-side loop holds only a changed-row COUNT per round (the
  * fixpoint probe), never the data.
  *
  * At 100 TB the edge list is the output of the blocked near-dup paths
  * (LSH/SRP candidates), which is orders of magnitude smaller than the
  * corpus; rounds are bounded by log of the largest duplicate cluster.
  */
object DupClusters {

  /** Connected components over an undirected edge list (`da`, `db`).
    * Returns (id, cluster) for every node appearing in an edge, where
    * `cluster` is the minimum node id in the component — a deterministic,
    * engine-independent canonical representative. */
  def connectedComponents(edges: DataFrame, maxIter: Int = 25): DataFrame = {
    val sym = edges.select(col("da").as("id"), col("db").as("nb"))
      .union(edges.select(col("db").as("id"), col("da").as("nb")))
      .auditedCheckpoint()
    // init fuses the first propagation round: the node-set aggregation that
    // would seed lbl=id can take min(id, neighbors) in the same shuffle
    var labels = sym.groupBy("id")
      .agg(least(col("id"), min(col("nb"))).as("lbl")).auditedCheckpoint()
    // convergence probe: did ANY node's label change this round? Labels
    // only ever decrease, so unchanged == fixpoint. The previous round's
    // label rides THROUGH the round as a carried `__prev` column (the
    // propagate join visits every node exactly once, so carrying it is
    // free) and the probe is a filter-isEmpty over the already-
    // checkpointed round result — the r17 fusion of what used to be a
    // separate |nodes| ⋈ |nodes| equi-join + action per round (guide
    // §2.4: two operations keyed the same way share one pass). The
    // comparison stays TYPE-AGNOSTIC — the even-older decimal-label-SUM
    // probe assumed numeric ids: string ids (url keys) would CRASH the
    // cast under ANSI, and with ANSI off every cast is NULL, the sum
    // reads zero each round, and the loop declares convergence after
    // round one with silently wrong clusters (the exact outcome the
    // non-convergence guard below exists to prevent).
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      // min label in the closed neighborhood
      val nbrMin = sym
        .join(labels.select(col("id").as("nb"), col("lbl").as("nlbl")), "nb")
        .groupBy("id").agg(min("nlbl").as("m"))
      // checkpointed: the pointer-jump self-join below reads `stepped`
      // twice — un-materialized, both branches would re-run the propagate
      // shuffle + aggregation every round
      val stepped = labels.select(col("id"), col("lbl").as("__prev"))
        .join(nbrMin, Seq("id"), "left")
        .select(col("id"),
          least(col("__prev"), coalesce(col("m"), col("__prev"))).as("lbl"),
          col("__prev"))
        .auditedCheckpoint()
      // pointer jump: a label is always some node's id, so re-resolving a
      // node's label through its label's own label contracts chains. The
      // jump key is unique on the right side (stepped has one row per id),
      // so `jumped` keeps exactly one row per node and `__prev` stays that
      // node's previous-round label.
      val jumped = stepped
        .join(stepped.select(col("id").as("lbl"), col("lbl").as("lbl2")), Seq("lbl"), "left")
        .select(col("id"), coalesce(col("lbl2"), col("lbl")).as("lbl"), col("__prev"))
        .auditedCheckpoint()
      converged = jumped.filter(col("lbl") =!= col("__prev")).isEmpty
      labels = jumped.select(col("id"), col("lbl"))
      iter += 1
    }
    // truncated labels are silently WRONG (a duplicate group would keep
    // several "canonical" survivors) — fail loud instead
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter rounds; " +
        "raise maxIter (rounds needed ~ log2 of the largest component's diameter)")
    labels.select(col("id"), col("lbl").as("cluster"))
  }

  /** Duplicate clusters from near-dup pairs: (doc_id, cluster) membership,
    * cluster = min doc_id of the component (the canonical survivor — every
    * non-survivor row is a drop candidate). */
  def clusters(pairs: DataFrame): DataFrame =
    connectedComponents(pairs).select(col("id").as("doc_id"), col("cluster"))

  /** Quality-aware survivor selection — "keep the BEST copy", not the
    * first: per duplicate cluster, the member with the highest
    * `qualityCol` wins (ties break to the smallest doc_id, so the choice
    * is fully deterministic). Near-dup copies genuinely differ — one is
    * truncated, one is boilerplate-wrapped — and min-id survivor choice
    * throws that signal away.
    *
    * One equi-join of the (small) membership frame onto per-doc quality,
    * then per-cluster aggregations: the survivor is the min doc_id among
    * the best_q members (an equi-join back on (cluster, best_q), then
    * min) — map-side-combinable, never a row_number window that would
    * sort a hot cluster's copies into one partition. Quality stays an
    * equi-join (not broadcast-pinned): at 100 TB the quality frame is
    * corpus-sized. The join is LEFT: a member with no quality row scores
    * NULL and rides the null fallback below — an INNER join would remove
    * it from the cluster entirely, and a cluster whose EVERY member was
    * skipped by the scorer would vanish from this frame, making
    * keepBestCopy silently drop all its copies including the would-be
    * survivor. n_members therefore counts ALL members, scored or not.
    * Returns (cluster, keep_id, n_members, best_q). */
  def survivorsByQuality(members: DataFrame, quality: DataFrame,
                         qualityCol: String): DataFrame = {
    // checkpointed: feeds both the per-cluster max and the tie-break pass
    val joined = members.join(quality, Seq("doc_id"), "left").auditedCheckpoint()
    // ONE aggregation carries the member count, the best quality, AND the
    // null-quality fallback id (r17: the fallback used to be its own
    // groupBy + join over the same keyed frame — two operations keyed the
    // same way share one pass, guide §2.4)
    val best = joined.groupBy("cluster")
      .agg(count(lit(1)).as("n_members"), max(col(qualityCol)).as("best_q"),
        min(col("doc_id")).as("min_id"))
    // ties break to the smallest doc_id via min over the max-q members —
    // TYPE-AGNOSTIC (string ids order lexically; the earlier -doc_id
    // negate trick, the exact trap knnClassify's doc warns about, threw
    // under ANSI for string ids and nulled them otherwise, turning every
    // cluster member including the survivor into a drop)
    val argmax = joined
      .join(best.select(col("cluster"), col("best_q").as(qualityCol)),
        Seq("cluster", qualityCol))
      .groupBy("cluster").agg(min(col("doc_id")).as("arg_id"))
    // max() skipped nulls, so a cluster whose EVERY member has NULL
    // quality gets best_q NULL — the equi-join above matches nothing for
    // it (null keys never join), and without a fallback the cluster would
    // vanish from this frame and keepBestCopy would drop every copy.
    // Such clusters keep the min-doc_id member (the fused min_id) instead.
    best.join(argmax, Seq("cluster"), "left")
      .select(col("cluster"),
        coalesce(col("arg_id"), col("min_id")).as("keep_id"),
        col("n_members"), col("best_q"))
  }

  /** Gate form: `docs` minus every clustered non-survivor — unclustered
    * documents (no near-dup edge) pass through untouched. Anti join on
    * the drop set, which is membership-sized (edges, not corpus). */
  def keepBestCopy(docs: DataFrame, members: DataFrame, quality: DataFrame,
                   qualityCol: String): DataFrame = {
    val drops = members.join(
        survivorsByQuality(members, quality, qualityCol).select("keep_id"),
        col("doc_id") === col("keep_id"), "left_anti")
      .select("doc_id")
    docs.join(drops, Seq("doc_id"), "left_anti")
  }
}
