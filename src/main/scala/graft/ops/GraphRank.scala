package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-iteration PageRank with integer mass — the source/domain-ranking
  * primitive of web-corpus curation (CommonCrawl-style host ranking feeding
  * crawl prioritization and quality weighting). Beyond the reference, which
  * has no graph operators at all.
  *
  * Determinism design: float PageRank is unverifiable cross-engine (group
  * sums of doubles are addition-order-dependent), so mass is an integer.
  * Each node starts with `scale` units; one iteration sends every node's
  * mass along its out-edges proportionally —
  * contrib = (mass * damp% * w) DIV (100 * outWeight), exact longs — and
  * every node restarts with the teleport floor (100-damp)% of `scale`.
  * Truncated remainders (integer division dust plus all mass of dangling
  * nodes) are dropped, as in sink-discarding PageRank variants; ranks are
  * compared, not normalized, so the contract is unaffected. Overflow
  * headroom: mass*85*w per edge — at nodeScale 1e6 and 1e9-count edges
  * that is ~2.5e17 < 2^63.
  *
  * Scale shape per iteration: edges join ranks with a plain equi-join on
  * `src` — NO forced broadcast. At demo scale AQE turns the join into a
  * broadcast-hash join on its own (ranks is tiny); at web-graph scale
  * (10^8+ nodes the rank vector no longer fits an executor) the same plan
  * degrades gracefully to a shuffled hash join, which is the correct
  * 100 TB shape. Forcing `broadcast(ranks)` would remove that choice and
  * OOM every executor at node counts beyond the broadcast threshold.
  * Edges then shuffle ONCE to aggregate by dst. The edge list itself is
  * computed once and localCheckpoint-materialized so the 3-iteration plan
  * does not recompute the upstream joins (the q123 connected-components
  * idiom).
  */
object GraphRank {

  /** `iterations` rounds of integer-mass PageRank.
    *
    * @param edges    (srcCol, dstCol, wCol) weighted directed edge list
    * @param nodes    one row per node (nodeCol); keeps isolated nodes in the
    *                 ranking at the teleport floor
    * @param scale    initial integer mass per node
    * @param dampPct  damping factor in percent (85 = the canonical 0.85)
    * @return one row per node: (nodeCol, rank_mass, out_weight)
    */
  def pageRank(edges: DataFrame, nodes: DataFrame, nodeCol: String,
      srcCol: String, dstCol: String, wCol: String,
      iterations: Int = 3, scale: Long = 1000000L, dampPct: Int = 85): DataFrame = {
    require(iterations >= 0 && dampPct >= 0 && dampPct <= 100)
    val outW = edges.groupBy(col(srcCol)).agg(sum(col(wCol)).cast("long").as("out_weight"))
    // materialize the (usually join-derived) edge list once; 3 iterations
    // then re-read a local snapshot instead of re-running the joins
    val e = edges.select(col(srcCol).as("src"), col(dstCol).as("dst"),
        col(wCol).cast("long").as("w"))
      .join(outW.withColumnRenamed(srcCol, "src"), Seq("src"))
      .localCheckpoint()
    val n = nodes.select(col(nodeCol).as("node"))
    val teleport = scale * (100 - dampPct) / 100
    val init = n.withColumn("mass", lit(scale))
    val ranked = (1 to iterations).foldLeft(init) { (ranks, _) =>
      val contrib = e.join(ranks.withColumnRenamed("node", "src"), Seq("src"))
        .withColumn("contrib", expr(s"(mass * $dampPct * w) DIV (100 * out_weight)"))
        .groupBy(col("dst").as("node"))
        .agg(sum("contrib").cast("long").as("in_mass"))
      n.join(contrib, Seq("node"), "left")
        .withColumn("mass", (lit(teleport) + coalesce(col("in_mass"), lit(0L))).cast("long"))
        .select("node", "mass")
    }
    // out_weight for the final projection comes from the CHECKPOINTED edge
    // list (one value per src by construction), NOT from `outW`: outW's plan
    // hangs off the raw `edges` frame, so joining it here would re-run the
    // caller's whole edge-building join tree a second time (guide §7.2:
    // duplicated subtrees; measured as a full extra 4-table join in q156)
    val outWFromE = e.groupBy(col("src").as("node"))
      .agg(max(col("out_weight")).as("out_weight"))
    ranked.withColumnRenamed("mass", "rank_mass")
      .join(outWFromE, Seq("node"), "left")
      .na.fill(0L, Seq("out_weight"))
      .withColumnRenamed("node", nodeCol)
  }
}
