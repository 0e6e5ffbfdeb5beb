package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** [EXT] Graph centrality over edge tables — the operator family a
  * pipeline needs once corpus structure (token co-occurrence, link
  * graphs, citation webs) becomes a ranking signal. Companion to the
  * connected-components operator ([[Dedup.clusters]]): that one answers
  * "which nodes belong together", this one "which nodes matter".
  *
  * Determinism contract (the repo's cross-engine discipline): per-edge
  * contributions are single IEEE multiplies (exactly rounded), and the
  * per-node SUM goes through DECIMAL(28,12) — decimal addition is
  * associative, so the result is independent of partitioning and row
  * order, and a SQL engine replays it bit-for-bit. A raw double SUM
  * here would differ run-to-run at 32 partitions, let alone across
  * engines (the `xsum` gotcha).
  */
object Graph {

  /** Weighted PageRank, `iterations` fixed rounds (no convergence test —
    * a FIXED plan both engines can replay; 5 rounds is within 1e-3 of
    * the fixpoint on small-diameter graphs like token co-occurrence).
    *
    * pr₀(v) = 1/N;
    * prₜ₊₁(v) = (1−d)/N + d · Σ_{(u,v)∈E} prₜ(u) · w(u,v)/outW(u)
    *
    * Simplified (non-stochastic) form: dangling mass is NOT
    * redistributed — a node with no out-edges absorbs rank. Standard
    * for ranking use (relative order is what matters), documented
    * rather than hidden, and what keeps the oracle replay linear.
    *
    * 100 TB shape: the edge table with per-edge SHARES (w/outW) is
    * eagerly checkpointed ONCE (executor-local by default; pass
    * [[Checkpointing.Reliable]] for a durable cut that survives
    * executor loss on a real cluster — see [[Checkpointing]] for the
    * restart contract) — the one build-time action, same documented
    * class as [[Dedup.clusters]]' pointer-jumping rounds —
    * so the 5 rank iterations each join against materialized blocks
    * instead of re-deriving the edge aggregate per reference (the r8
    * plan-duplication lesson: 5 chained iterations over a lazy edge DF
    * re-derive it 5×). Each iteration is one shuffle keyed on the
    * high-cardinality dst node; N rides a broadcast single-row cross
    * join (the B12/corpus-N pattern), never a driver collect.
    *
    * Output: (node, pr, out_w) with pr rounded to 6dp. */
  def pageRank(
      edges: DataFrame,
      src: Column,
      dst: Column,
      weight: Column,
      iterations: Int = 5,
      damping: Double = 0.85,
      checkpoint: Checkpointing.Mode = Checkpointing.Local): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e0 = edges.select(src.as("src"), dst.as("dst"), weight.cast("double").as("w"))
    val outW = e0.groupBy("src").agg(sum(col("w").cast("decimal(28,6)")).cast("double").as("out_w"))
    // per-edge share: one exact IEEE divide, materialized once
    val shares = e0.join(outW, Seq("src"))
      .select(col("src"), col("dst"),
        (col("w") / col("out_w")).as("share"), col("out_w"))
    val sharesCut = checkpoint.cut(shares) // the one build-time action
    val nodes = checkpoint.cut(
      sharesCut.select(col("src").as("node"))
        .union(sharesCut.select(col("dst").as("node")))
        .distinct())
    val n = nodes.groupBy().agg(count(lit(1)).as("n_nodes"))
    var pr = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("n_nodes").cast("double")).as("pr"))
    (1 to iterations).foreach { _ =>
      val contrib = sharesCut
        .join(pr.select(col("node").as("src"), col("pr").as("pr_src")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum((col("pr_src") * col("share")).cast("decimal(28,12)")).as("in_sum"))
      pr = nodes.crossJoin(broadcast(n))
        .join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(1.0 - damping) / col("n_nodes").cast("double") +
            lit(damping) * coalesce(col("in_sum").cast("double"), lit(0.0))).as("pr"))
    }
    pr.join(
        sharesCut.select(col("src").as("node"), col("out_w")).dropDuplicates("node"),
        Seq("node"), "left")
      .select(col("node"), round(col("pr"), 6).as("pr"),
        coalesce(col("out_w"), lit(0.0)).as("out_w"))
  }

  /** Synchronous label-propagation community detection (Raghavan et al.
    * 2007), `iterations` fixed rounds: every node starts labeled with
    * itself; each round it adopts the label carrying the highest total
    * edge weight among its neighbors (ties → LEXICOGRAPHICALLY SMALLEST
    * label — a total order, so the whole run is deterministic), keeping
    * its previous label only when it has no neighbors. Edges are
    * treated as undirected (each input edge votes in both directions).
    *
    * Unlike [[Dedup.clusters]] (exact connected components — "is there
    * ANY path"), LPA finds densely-connected communities inside one
    * component — the structure that matters when a near-dup graph is
    * one giant hairball but quality labels should only spread through
    * STRONG ties.
    *
    * Float-free by construction: weights sum as longs, the argmax is
    * `min(struct(-Σw, label))` — so cross-engine parity needs no
    * quantization discipline at all, and synchronous fixed-round
    * updates make the SQL replay a linear unroll.
    *
    * 100 TB shape: the doubled edge list is checkpoint-cut once
    * ([[Checkpointing]] — durable mode opt-in, as in [[pageRank]]); each
    * round is one shuffle keyed on (node, label) for the vote sum and
    * one on node for the argmax — both high-cardinality. Per-round
    * state is the labels table itself, one row per node. */
  def labelPropagation(
      edges: DataFrame,
      src: Column,
      dst: Column,
      weight: Column,
      iterations: Int = 3,
      checkpoint: Checkpointing.Mode = Checkpointing.Local): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val e0 = edges.select(src.as("src"), dst.as("dst"), weight.cast("long").as("w"))
    val und = checkpoint.cut( // one build-time action, same class as pageRank
      e0.union(e0.select(col("dst").as("src"), col("src").as("dst"), col("w")))
        .groupBy("src", "dst").agg(sum("w").as("w")))
    val nodes = checkpoint.cut(und.select(col("src").as("node")).distinct())
    var labels = nodes.withColumn("label", col("node"))
    (1 to iterations).foreach { _ =>
      val votes = und
        .join(labels.select(col("node").as("src"), col("label")), Seq("src"))
        .groupBy(col("dst").as("node"), col("label"))
        .agg(sum("w").as("tw"))
      val winner = votes
        .groupBy("node")
        .agg(min(struct((lit(0L) - col("tw")).as("neg_w"), col("label").as("l")))
          .as("best"))
        .select(col("node"), col("best.l").as("new_label"))
      labels = labels
        .join(winner, Seq("node"), "left")
        .select(col("node"),
          coalesce(col("new_label"), col("label")).as("label"))
    }
    labels.select(col("node"), col("label").as("community"))
  }
}
