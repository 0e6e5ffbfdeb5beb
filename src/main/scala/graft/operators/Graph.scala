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

  /** Personalized PageRank (topic-sensitive PageRank, Haveliwala '02):
    * [[pageRank]] with the uniform teleport replaced by the SEED
    * distribution s(v) = 1/|S| on seed nodes, 0 elsewhere —
    * pprₜ₊₁(v) = (1−d)·s(v) + d·Σ pprₜ(u)·share(u,v), ppr₀ = s.
    * Relevance mass radiates from the seeds through the link structure:
    * the data-selection primitive for "find corpus regions near this
    * trusted set" (seed-expanded curation), where global PageRank only
    * says "important", not "important TO these".
    *
    * Same fixed-round, decimal-accumulated, oracle-unrollable contract
    * and the same one-checkpoint/one-shuffle-per-round shape as
    * [[pageRank]]; the seed set rides a broadcast membership join onto
    * the node table (seeds are small by definition). Seeds not present
    * in the graph are ignored; an empty effective seed set yields
    * all-zero ranks (guarded divide), not a failure. Dangling mass is
    * absorbed, as in [[pageRank]].
    *
    * Output: (node, ppr, is_seed), ppr rounded to 6dp. */
  def personalizedPageRank(
      edges: DataFrame,
      src: Column,
      dst: Column,
      weight: Column,
      seeds: DataFrame, // one column: node
      iterations: Int = 5,
      damping: Double = 0.85,
      checkpoint: Checkpointing.Mode = Checkpointing.Local): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    val e0 = edges.select(src.as("src"), dst.as("dst"), weight.cast("double").as("w"))
    val outW = e0.groupBy("src").agg(sum(col("w").cast("decimal(28,6)")).cast("double").as("out_w"))
    val sharesCut = checkpoint.cut(
      e0.join(outW, Seq("src"))
        .select(col("src"), col("dst"), (col("w") / col("out_w")).as("share")))
    val seedSet = seeds.select(col("node")).distinct()
    val nodes = checkpoint.cut(
      sharesCut.select(col("src").as("node"))
        .union(sharesCut.select(col("dst").as("node")))
        .distinct()
        .join(broadcast(seedSet.withColumn("flag", lit(1L))), Seq("node"), "left")
        .select(col("node"), coalesce(col("flag"), lit(0L)).as("flag")))
    val nSeeds = nodes.groupBy().agg(sum(col("flag")).as("n_seeds"))
    // s(v): flag/|S| — one exact IEEE divide; 0 everywhere on an empty
    // effective seed set
    val teleport = when(col("n_seeds") > 0,
      col("flag").cast("double") / col("n_seeds").cast("double"))
      .otherwise(lit(0.0))
    var pr = nodes.crossJoin(broadcast(nSeeds))
      .select(col("node"), col("flag"), teleport.as("ppr"))
    (1 to iterations).foreach { _ =>
      val contrib = sharesCut
        .join(pr.select(col("node").as("src"), col("ppr").as("pr_src")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum((col("pr_src") * col("share")).cast("decimal(28,12)")).as("in_sum"))
      pr = nodes.crossJoin(broadcast(nSeeds))
        .join(contrib, Seq("node"), "left")
        .select(col("node"), col("flag"),
          (lit(1.0 - damping) * teleport +
            lit(damping) * coalesce(col("in_sum").cast("double"), lit(0.0)))
            .as("ppr"))
    }
    pr.select(col("node"), round(col("ppr"), 6).as("ppr"),
      (col("flag") === 1L).as("is_seed"))
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

  /** k-core peeling, `rounds` fixed rounds: repeatedly drop every node
    * whose residual degree is < k, with the dropped nodes' edges.
    * Survivors approximate the k-core from above — after R rounds the
    * node set is exact for every graph whose peeling terminates within
    * R rounds, and an over-approximation otherwise (same FIXED-plan
    * contract as [[pageRank]]'s 5 rounds: both engines replay the
    * identical bounded recursion; no convergence test, no data-driven
    * plan). The corpus-curation use: the dense co-occurrence core is
    * the "establishment vocabulary", the peeled shell is rare/templated
    * periphery.
    *
    * 100 TB shape: each round is one degree aggregation (map-side
    * partial count on the edge list) plus two semi-joins keyed on the
    * node id — no wedge products, nothing quadratic; each round's
    * survivor edge list is cut via `checkpoint` (the [[pageRank]]
    * lineage discipline — without it round R re-derives rounds 1..R−1
    * per reference). Work per round is bounded by the CURRENT edge
    * count, which only shrinks.
    *
    * Output: (node, degree) — residual degree within the surviving
    * subgraph after `rounds` peels; peeled nodes are absent. */
  def kCore(
      edges: DataFrame,
      a: Column,
      b: Column,
      k: Int,
      rounds: Int = 5,
      checkpoint: Checkpointing.Mode = Checkpointing.Local): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    require(rounds >= 1, s"rounds must be >= 1, got $rounds")
    var e = checkpoint.cut(
      edges.select(a.as("a"), b.as("b"))
        .filter(col("a") =!= col("b"))
        .select(least(col("a"), col("b")).as("u"),
          greatest(col("a"), col("b")).as("v"))
        .distinct())
    def degrees(ed: DataFrame): DataFrame = ed
      .select(col("u").as("node")).union(ed.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    (1 to rounds).foreach { _ =>
      val keep = degrees(e).filter(col("degree") >= k)
        .select(col("node"))
      e = checkpoint.cut(
        e.join(keep.select(col("node").as("u")), Seq("u"), "left_semi")
          .join(keep.select(col("node").as("v")), Seq("v"), "left_semi")
          .select("u", "v"))
    }
    degrees(e)
  }

  /** Multi-source BFS hop distance, `maxHops` fixed expansion rounds:
    * every node reachable from the seed set within `maxHops` undirected
    * hops is labeled with its EXACT minimum hop count; nodes farther
    * away (or disconnected) are absent from the output — the bounded-
    * radius companion to [[personalizedPageRank]] (that one scores
    * "how much seed mass flows here", this one answers the set
    * question "is it within k links at all"), and the neighborhood-
    * expansion primitive of seed-based curation: grow a trusted corpus
    * region by exactly k co-occurrence links, no farther.
    *
    * Same FIXED-plan contract as [[pageRank]]/[[kCore]]: both engines
    * replay an identical bounded recursion (no convergence test), so
    * the oracle is a linear unroll. Within the radius the answer is
    * exact, not approximate: a node first reached in round r has true
    * distance r (BFS invariant), and synchronous rounds + the
    * already-labeled anti-join make that deterministic regardless of
    * partitioning. Seeds absent from the edge list are ignored
    * (distance is a property of the graph, not the seed request).
    *
    * 100 TB shape: the doubled edge list is checkpoint-cut once (the
    * [[pageRank]] lineage discipline); each round is one semi-join of
    * the edges against the CURRENT frontier (shrinking working set,
    * never the full labeled set), one distinct, and one anti-join
    * against the labeled table — all keyed on the node id, nothing
    * quadratic. Per-round state is (node, hops) rows only; the
    * frontier and the labeled accumulator are cut per round so round r
    * never re-derives rounds 1..r−1 (the r8 plan-duplication lesson).
    *
    * Output: (node, hops) — hops ∈ [0, maxHops], exact integers;
    * unreached nodes absent by contract. */
  def bfsHops(
      edges: DataFrame,
      a: Column,
      b: Column,
      seeds: DataFrame, // one column: node
      maxHops: Int = 4,
      checkpoint: Checkpointing.Mode = Checkpointing.Local): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val half = edges.select(a.as("src"), b.as("dst"))
      .filter(col("src") =!= col("dst"))
    val und = checkpoint.cut(
      half.union(half.select(col("dst").as("src"), col("src").as("dst")))
        .distinct())
    var labeled = checkpoint.cut(
      und.select(col("src").as("node")).distinct()
        .join(seeds.select(col("node")).distinct(), Seq("node"), "left_semi")
        .withColumn("hops", lit(0L)))
    var frontier = labeled.select("node")
    (1 to maxHops).foreach { h =>
      frontier = checkpoint.cut(
        und.join(frontier.select(col("node").as("src")), Seq("src"), "left_semi")
          .select(col("dst").as("node")).distinct()
          .join(labeled, Seq("node"), "left_anti"))
      labeled = checkpoint.cut(
        labeled.unionByName(frontier.withColumn("hops", lit(h.toLong))))
    }
    labeled
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected simple graph (self-loops dropped, parallel edges
    * collapsed). lcc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)), the fraction
    * of a node's neighbor pairs that are themselves connected — the
    * corpus-structure signal that separates hub tokens (low lcc) from
    * cliquish template vocabulary (lcc → 1).
    *
    * 100 TB shape — degree-ordered edge orientation (the standard
    * arboricity trick): each undirected edge {u,v} is directed from
    * its (deg, id)-smaller endpoint, so every node's OUT-degree is
    * O(√m) regardless of its true degree. Wedges are then a self-join
    * of the oriented list on its source (Σ outdeg² work, minimized by
    * exactly this orientation — a hub token like "the" can be a wedge
    * ENDPOINT but never a wedge CENTER), and a triangle is a wedge
    * whose far endpoints are themselves an oriented edge (left-semi
    * pair join; each triangle found exactly once). No cap is needed:
    * orientation IS the skew guard. The oriented list (m rows of two
    * ids + one long) is cut once via `checkpoint` and reused by all
    * three references — the pageRank discipline, without which the
    * doc-scan + explode + distinct prefix replays 3×.
    *
    * Determinism: counts are exact integers; the lcc divide is a
    * single correctly-rounded IEEE op on exact operands — bit-equal
    * cross-engine with no quantization discipline.
    *
    * Output: (node, degree, triangles, lcc), one row per node of the
    * simple graph; triangle-free nodes keep 0, deg-1 nodes lcc 0.0. */
  def triangles(
      edges: DataFrame,
      a: Column,
      b: Column,
      checkpoint: Checkpointing.Mode = Checkpointing.Local): DataFrame = {
    val e = edges.select(a.as("a"), b.as("b"))
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val deg = e.select(col("u").as("node"))
      .union(e.select(col("v").as("node")))
      .groupBy("node").agg(count(lit(1)).as("degree"))
    // orient from the (deg, id)-smaller endpoint; carry the head's
    // (deg, id) key so the wedge self-join can order far endpoints
    // without a third deg lookup
    val oriented = checkpoint.cut(
      e.join(deg.select(col("node").as("u"), col("degree").as("du")), Seq("u"))
        .join(deg.select(col("node").as("v"), col("degree").as("dv")), Seq("v"))
        .select(
          when(struct(col("du"), col("u")) < struct(col("dv"), col("v")),
            struct(col("u").as("src"), struct(col("dv").as("d"), col("v").as("n")).as("dst")))
            .otherwise(
              struct(col("v").as("src"), struct(col("du").as("d"), col("u").as("n")).as("dst")))
            .as("o"))
        .select(col("o.src").as("src"), col("o.dst").as("dst")))
    val w1 = oriented.select(col("src"), col("dst").as("b"))
    val w2 = oriented.select(col("src"), col("dst").as("c"))
    val wedges = w1.join(w2, Seq("src")).filter(col("b") < col("c"))
      .select(col("src").as("x"), col("b.n").as("y"), col("c"))
    // closing edge must be oriented y→c: y precedes c in the SAME
    // (deg, id) total order the orientation used
    val tri = wedges.join(
      oriented.select(col("src").as("y"), col("dst").as("c")),
      Seq("y", "c"), "left_semi")
      .select(col("x"), col("y"), col("c.n").as("z"))
    val triPerNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("triangles"))
    deg.join(triPerNode, Seq("node"), "left")
      .select(col("node"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        when(col("degree") >= 2,
          lit(2.0) * coalesce(col("triangles"), lit(0L)) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)).as("lcc"))
  }

  /** Common-neighbor LINK PREDICTION (Liben-Nowell & Kleinberg '03):
    * for non-adjacent node pairs, how strongly the graph "wants" the
    * edge — common-neighbor count, Jaccard over neighborhoods, and
    * Adamic–Adar (common neighbors weighted 1/ln(degree): a shared
    * rare neighbor is evidence, a shared hub is not). On the token
    * co-occurrence graph this surfaces near-synonym/related-term
    * pairs that never co-occur directly; on an entity graph,
    * candidate record links.
    *
    * The `degCap` prune is load-bearing twice: a hub as wedge CENTER
    * generates deg² candidate pairs (the quadratic blowup), and its
    * 1/ln(deg) weight is the signal floor anyway — dropping
    * deg > degCap centers is the [[TfIdf.allPairsCosine]] dfCap
    * argument re-applied to graphs. Hubs still appear as ENDPOINTS;
    * only their wedge-center role is pruned, and their full degree
    * still drives their own Jaccard denominator.
    *
    * Determinism: degrees and common counts exact; each Adamic–Adar
    * term 1/ln(deg) is quantized round(·,9) → DECIMAL(18,9) before
    * the pair sum (the [[Events.freshnessDecay]] transcendental
    * discipline), one divide for Jaccard, 6dp outputs. A wedge center
    * has degree ≥ 2, so ln(deg) ≥ ln 2 — no zero divisor exists.
    *
    * 100 TB shape: one undirected-edge distinct, a degree aggregate,
    * the capped wedge self-join keyed on the CENTER (fan-out ≤
    * degCap² per center), one (pair)-keyed aggregate, and two
    * degree joins AQE broadcasts when the vocabulary is small (the
    * node table is NOT bounded in general — no forced hint); existing
    * edges leave via one anti-join.
    *
    * Output: (node_a, node_b, common, jaccard 6dp, adamic_adar 6dp)
    * for non-adjacent pairs with common ≥ minCommon, node_a < node_b,
    * ordered (node_a, node_b). */
  def linkPrediction(
      edges: DataFrame,
      src: Column,
      dst: Column,
      minCommon: Long = 2L,
      degCap: Long = 64L): DataFrame = {
    require(minCommon >= 1, s"minCommon must be >= 1, got $minCommon")
    require(degCap >= 2, s"degCap must be >= 2, got $degCap")
    val und = edges
      .select(src.cast("string").as("a"), dst.cast("string").as("b"))
      .filter(col("a").isNotNull && col("b").isNotNull && col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"),
        greatest(col("a"), col("b")).as("v"))
      .distinct()
    val adj = und.select(col("u").as("z"), col("v").as("n"))
      .unionByName(und.select(col("v").as("z"), col("u").as("n")))
    val deg = adj.groupBy("z").agg(count(lit(1)).as("deg"))
    val centers = adj.join(deg.filter(col("deg") <= degCap), Seq("z"))
      .withColumn("aa_term",
        round(lit(1.0) / log(col("deg").cast("double")), 9)
          .cast("decimal(18,9)"))
    val n1 = centers.select(col("z"), col("n").as("x"), col("aa_term"))
    val n2 = centers.select(col("z"), col("n").as("y"))
    val pairs = n1.join(n2, Seq("z"))
      .filter(col("x") < col("y"))
      .groupBy(col("x"), col("y"))
      .agg(count(lit(1)).as("common"), sum("aa_term").as("aa"))
      .filter(col("common") >= minCommon)
      .join(und.select(col("u").as("x"), col("v").as("y")),
        Seq("x", "y"), "left_anti") // predict only ABSENT edges
    pairs
      .join(deg.select(col("z").as("x"), col("deg").as("deg_x")), Seq("x"))
      .join(deg.select(col("z").as("y"), col("deg").as("deg_y")), Seq("y"))
      .select(col("x").as("node_a"), col("y").as("node_b"), col("common"),
        round(col("common").cast("double") /
          (col("deg_x") + col("deg_y") - col("common")).cast("double"), 6)
          .as("jaccard"),
        round(col("aa").cast("double"), 6).as("adamic_adar"))
      .orderBy("node_a", "node_b")
  }

  /** HITS hubs-and-authorities (Kleinberg '99) — the second classical
    * link-analysis readout next to [[pageRank]]: PageRank scores
    * IMPORTANCE (random-surfer mass), HITS separates two ROLES —
    * authorities (pointed to by good hubs) and hubs (pointing to good
    * authorities) — which is exactly the curation split between
    * "canonical reference docs" and "good index/survey docs" on a
    * citation or co-occurrence graph.
    *
    * Power iteration on the weighted adjacency: per round,
    * a ← normalize(Aᵀh), h ← normalize(A·a), L1 normalization (sum=1;
    * keeps everything in exact-divide land — the L2 variant differs
    * only by a global constant per round and would drag a sqrt into
    * the normalization chain for nothing). Fixed `iterations` rounds,
    * not convergence-tested: the same fixed-round oracle-unrollable
    * contract as [[pageRank]].
    *
    * Determinism: each matvec accumulates per-edge products quantized
    * to DECIMAL(28,12) (exact, order-free sums); the round's
    * normalizer is the exact decimal sum OF those sums; every score
    * is one IEEE divide of two exact decimals. A graph whose round
    * total is 0 (no edges) yields all-zero scores, guarded, not 0/0.
    *
    * 100 TB shape: the [[pageRank]] shape — edges checkpointed once,
    * ONE key-partitioned shuffle per matvec (dst-keyed then
    * src-keyed), the normalizer rides a 1-row broadcast, node scores
    * never collect to the driver.
    *
    * Output: (node, hub 6dp, authority 6dp), ordered by authority
    * desc, hub desc, node. */
  def hits(
      edges: DataFrame,
      src: Column,
      dst: Column,
      weight: Column,
      iterations: Int = 3,
      checkpoint: Checkpointing.Mode = Checkpointing.Local): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val eCut = checkpoint.cut(
      edges.select(src.as("src"), dst.as("dst"), weight.cast("double").as("w")))
    val nodes = checkpoint.cut(
      eCut.select(col("src").as("node"))
        .union(eCut.select(col("dst").as("node")))
        .distinct())
    val n = nodes.groupBy().agg(count(lit(1)).as("n_nodes"))
    // each round's matvec is referenced TWICE (normalizer + join) and
    // feeds the next round's matvec — without a per-round cut the
    // re-evaluation doubles per round (the r8 plan-duplication
    // lesson, measured 6.9 s → the pageRank-class cost after the cut)
    def normalized(rawUncut: DataFrame): DataFrame = {
      val raw = checkpoint.cut(rawUncut)
      val tot = raw.agg(sum("raw").as("tot")) // exact decimal fold
      nodes.join(raw, Seq("node"), "left")
        .crossJoin(broadcast(tot))
        .select(col("node"),
          when(col("tot") > 0,
            coalesce(col("raw"), lit(0).cast("decimal(28,12)"))
              .cast("double") / col("tot").cast("double"))
            .otherwise(lit(0.0)).as("s"))
    }
    var hub = nodes.crossJoin(broadcast(n))
      .select(col("node"), (lit(1.0) / col("n_nodes").cast("double")).as("s"))
    var auth: DataFrame = hub
    (1 to iterations).foreach { _ =>
      auth = normalized(eCut
        .join(hub.select(col("node").as("src"), col("s").as("hs")), Seq("src"))
        .groupBy(col("dst").as("node"))
        .agg(sum((col("hs") * col("w")).cast("decimal(28,12)")).as("raw")))
      hub = normalized(eCut
        .join(auth.select(col("node").as("dst"), col("s").as("as_")),
          Seq("dst"))
        .groupBy(col("src").as("node"))
        .agg(sum((col("as_") * col("w")).cast("decimal(28,12)")).as("raw")))
    }
    hub.select(col("node"), round(col("s"), 6).as("hub"))
      .join(auth.select(col("node"), round(col("s"), 6).as("authority")),
        Seq("node"))
      .orderBy(col("authority").desc, col("hub").desc, col("node"))
  }
}
