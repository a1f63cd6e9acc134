package graft.op

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph primitives over edge-list DataFrames. Companion to
  * [[graft.ext.TextDedup.nearDupClusters]] (connected components): where
  * clustering answers "which docs form one duplicate family",
  * PageRank-style scoring answers "which docs are the most central" —
  * e.g. picking the canonical representative of a near-dup family, or
  * weighting a link graph.
  */
object Graph {

  /** Fixed-point-arithmetic PageRank.
    *
    * All arithmetic is INTEGER (ranks scaled by `scale`): sums of longs
    * are associative, so the result is bit-identical regardless of
    * partitioning or aggregation order — unlike double-based PageRank,
    * whose last bits depend on reduction order and can never be
    * hash-compared across engines. Damping is the rational
    * `dampingNum/100` applied as `(x * dampingNum) div 100`.
    *
    * `edges` is directed (src, dst); pass both directions for an
    * undirected graph. Nodes = every id appearing as src or dst.
    * Dangling mass is not redistributed (every node of a symmetrized
    * graph has out-degree ≥ 1, the intended use here).
    *
    * Scale shape: per iteration one join of ranks onto edges (both
    * keyed on the node id — one hash partitioning reused) and one
    * aggregation on dst. Lineage is cut per round with an EAGER
    * localCheckpoint — iterative plans otherwise grow multiplicatively
    * and OOM the planner long before data size matters.
    */
  def pageRank(edges: DataFrame, src: String, dst: String,
               iterations: Int = 4, dampingNum: Long = 85,
               scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingNum >= 0 && dampingNum <= 100)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(src).as("a"), col(dst).as("b")).persist(lvl)
    val nodes0 = e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node"))).distinct()
    val n = nodes0.count()
    require(n > 0, "pageRank needs a non-empty edge list")
    // size the per-round partitioning to the GRAPH, not the session
    // default (same discipline as TextDedup.starContract), and
    // pre-partition the edge list on the join key ONCE — every round's
    // rank join then reuses that partitioning instead of re-shuffling
    // the edges, and a small graph's rounds are a handful of tasks, not
    // 32+ near-empty shuffle partitions × iterations of fixed overhead
    val p = math.max(1, math.min((n / 500000L + 1).toInt, 200))
    // attach the out-degree to the edge list ONCE, before the
    // checkpoint (the degree of a is a static edge property — it never
    // changes across iterations): every round then pays a single
    // rank join instead of a deg join + a rank join. The groupBy
    // reuses the repartition(a) exchange, so the prejoin costs one
    // extra pass at build time and removes `iterations` join stages.
    val eP = e0.repartition(p, col("a"))
    val e = eP
      .join(eP.groupBy("a").agg(count(lit(1)).as("deg")), Seq("a"))
      .localCheckpoint(true)
    val nodes = nodes0.repartition(p, col("node")).localCheckpoint(true)
    e0.unpersist()
    val init = scale / n
    val base = (init * (100 - dampingNum)) / 100
    var ranks = nodes.withColumn("rank", lit(init))
    for (i <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "a"), Seq("a"))
        .select(col("b").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) + expr(s"coalesce(in_sum, 0L) * $dampingNum div 100"))
            .as("rank"))
      // ranks feeds the next round ONCE, so lineage grows linearly (not
      // the 4x/round of starContract's double-referenced input) — an
      // every-other-round checkpoint bounds plan depth at two rounds
      // while halving the materialization jobs that dominate small
      // graphs
      ranks = if (i % 2 == 0 || i == iterations)
        next.repartition(p, col("node")).localCheckpoint(true)
      else next
    }
    ranks
  }

  /** Personalized PageRank: same fixed-point INTEGER iteration as
    * [[pageRank]], but the teleport term is restricted to `seeds` —
    * rank mass repeatedly re-injects at the seed set and diffuses
    * outward, so scores measure proximity TO THE SEEDS rather than
    * global centrality (the standard seeded-relevance / related-items
    * primitive; complements [[bfsDistances]], which measures pure hop
    * distance with no volume weighting).
    *
    * Arithmetic contract and scale shape are pageRank's exactly: long
    * ranks (associative sums — bit-identical under any partitioning),
    * one edge-keyed join + one aggregation per iteration on a
    * graph-sized partitioning established once, lineage cut every
    * other round. The seed flag rides the nodes frame, so the base
    * term costs nothing extra per iteration. Like pageRank, `edges`
    * is directed — pass both directions for an undirected graph.
    * Nodes never reached by seed mass keep rank 0 (they still appear
    * in the output).
    */
  def personalizedPageRank(edges: DataFrame, src: String, dst: String,
                           seeds: DataFrame, seedCol: String,
                           iterations: Int = 4, dampingNum: Long = 85,
                           scale: Long = 1000000000000L): DataFrame = {
    require(iterations >= 1 && dampingNum >= 0 && dampingNum <= 100)
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val e0 = edges.select(col(src).as("a"), col(dst).as("b")).persist(lvl)
    val nodes0 = e0.select(col("a").as("node"))
      .union(e0.select(col("b").as("node"))).distinct()
    val sd = seeds.select(col(seedCol).as("node")).distinct()
    val nSeeds = sd.count()
    require(nSeeds > 0, "personalizedPageRank needs a non-empty seed set")
    val n = nodes0.count()
    require(n > 0, "personalizedPageRank needs a non-empty edge list")
    val p = math.max(1, math.min((n / 500000L + 1).toInt, 200))
    // deg prejoin before the checkpoint — see pageRank: one join per
    // iteration instead of two
    val eP = e0.repartition(p, col("a"))
    val e = eP
      .join(eP.groupBy("a").agg(count(lit(1)).as("deg")), Seq("a"))
      .localCheckpoint(true)
    val init = scale / nSeeds
    val base = (init * (100 - dampingNum)) / 100
    // the seed flag joins once, up front; every iteration reads it as a
    // plain column (seed sets are small — broadcast — but correctness
    // does not depend on that)
    val nodes = nodes0
      .join(broadcast(sd.withColumn("is_seed", lit(true))), Seq("node"), "left")
      .select(col("node"),
        when(col("is_seed"), lit(base)).otherwise(lit(0L)).as("base"),
        when(col("is_seed"), lit(init)).otherwise(lit(0L)).as("init"))
      .repartition(p, col("node")).localCheckpoint(true)
    e0.unpersist()
    var ranks = nodes.select(col("node"), col("init").as("rank"))
    for (i <- 1 to iterations) {
      val contrib = e
        .join(ranks.withColumnRenamed("node", "a"), Seq("a"))
        .select(col("b").as("node"), expr("rank div deg").as("c"))
        .groupBy("node").agg(sum(col("c")).as("in_sum"))
      val next = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (col("base") + expr(s"coalesce(in_sum, 0L) * $dampingNum div 100"))
            .as("rank"))
      ranks = if (i % 2 == 0 || i == iterations)
        next.repartition(p, col("node")).localCheckpoint(true)
      else next
    }
    ranks
  }

  /** Per-node triangle counts via the degree-oriented node-iterator
    * (Cohen, "Graph Twiddling in a MapReduce World", CiSE'09; the
    * standard distributed triangle algorithm). Each undirected edge is
    * oriented from its lower-(degree, id) endpoint to the higher one;
    * wedges are enumerated only at each node's out-neighborhood and
    * closed against the oriented edge set. Why this survives scale:
    * wedge volume is Σ_v C(outdeg(v), 2), and degree-orientation bounds
    * outdeg by O(√m) on any graph — a high-degree hub never fans out,
    * its wedges are charged to its (few) lower-degree neighbors. A
    * naive undirected wedge join is Σ deg² and dies on the first
    * power-law hub.
    *
    * Every triangle is found exactly once (at its minimum-(deg, id)
    * apex), then credited to all three corners. Input edges may carry
    * duplicates/self-loops/either orientation — canonicalized here.
    * Output: (node, n_triangles), only nodes in ≥1 triangle.
    */
  def triangleCounts(edges: DataFrame, src: String, dst: String): DataFrame = {
    val e0 = edges
      .select(least(col(src), col(dst)).as("x"),
        greatest(col(src), col(dst)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // the canonical edge set is referenced 3× (both degree scans + the
    // orientation join) and the oriented set 3× more (both wedge sides
    // + the closing probe) — without materialization the upstream edge
    // derivation (often an expensive pair aggregation) re-executes for
    // EVERY reference. Persist the edges, checkpoint the oriented set,
    // and size the downstream partitioning to the GRAPH, not the
    // session default (the pageRank discipline).
    val m = e0.count()
    if (m == 0L) {
      e0.unpersist()
      return e0.select(col("x").as("node"), lit(0L).as("n_triangles")).limit(0)
    }
    val p = math.max(1, math.min((m / 2000000L + 1).toInt, 200))
    val e = e0.repartition(p, col("x")).localCheckpoint(true)
    e0.unpersist()
    val deg = e.select(col("x").as("node"))
      .union(e.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("deg"))
    // orient x↔y by (deg, id) — struct comparison is lexicographic
    val oriented = e
      .join(deg.select(col("node").as("x"), col("deg").as("dx")), Seq("x"))
      .join(deg.select(col("node").as("y"), col("deg").as("dy")), Seq("y"))
      .withColumn("kx", struct(col("dx").as("d"), col("x").as("i")))
      .withColumn("ky", struct(col("dy").as("d"), col("y").as("i")))
      .select(
        when(col("kx") < col("ky"), col("x")).otherwise(col("y")).as("a"),
        when(col("kx") < col("ky"), col("ky")).otherwise(col("kx")).as("kb"))
      .select(col("a"), col("kb"), col("kb.i").as("b"))
    val or2 = oriented.repartition(p, col("a")).localCheckpoint(true)
    val w1 = or2.select(col("a"), col("kb").as("k1"), col("b").as("n1"))
    val w2 = or2.select(col("a"), col("kb").as("k2"), col("b").as("n2"))
    val closing = or2.select(col("a").as("n1"), col("b").as("n2"))
    val tris = w1.join(w2, Seq("a")).filter(col("k1") < col("k2"))
      .join(closing, Seq("n1", "n2"))
      .select(col("a"), col("n1").as("b"), col("n2").as("c"))
    tris.select(explode(array(col("a"), col("b"), col("c"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
  }

  /** Multi-source BFS hop distances, bounded depth — the reachability /
    * "blast radius" primitive (which parts are within k co-purchase hops
    * of a recalled part; which docs sit within k links of a seed set).
    *
    * Frontier-driven: round d joins the current frontier against the
    * symmetrized edge list, anti-joins the visited set, and labels the
    * survivors dist = d. BFS layers are canonical — every node's hop
    * distance is independent of partitioning or visit order — so the
    * result is deterministic and an oracle can recompute it by
    * recursive closure.
    *
    * Scale shape, per round: one semi-join of edges against the
    * frontier (size-conditionally BROADCAST — BFS frontiers on sparse
    * graphs are far smaller than the edge list) + one distinct + one
    * anti-join against visited, all keyed on the node id with the
    * partitioning sized to the graph and reused. Lineage is cut per
    * round with an eager localCheckpoint, and the loop stops as soon
    * as a frontier is empty (one O(1) driver scalar per round — the
    * kCore discipline). Rounds are bounded by `maxDepth`, so unlike an
    * unbounded transitive closure this cannot run away on a
    * small-diameter giant component.
    *
    * Input edges are undirected (canonicalized + symmetrized here; may
    * carry duplicates / self-loops / either orientation). Seeds not in
    * the edge list still appear with dist = 0. Output: (node, dist) for
    * every node within `maxDepth` hops of any seed; dist = min hops.
    */
  def bfsDistances(edges: DataFrame, src: String, dst: String,
                   seeds: DataFrame, seedCol: String,
                   maxDepth: Int): DataFrame = {
    require(maxDepth >= 0, "maxDepth must be >= 0")
    val e0 = edges
      .select(least(col(src), col(dst)).as("x"),
        greatest(col(src), col(dst)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m = e0.count()
    val p = math.max(1, math.min((m / 2000000L + 1).toInt, 200))
    val sym = e0.select(col("x").as("a"), col("y").as("b"))
      .union(e0.select(col("y").as("a"), col("x").as("b")))
      .repartition(p, col("a")).localCheckpoint(true)
    e0.unpersist()
    var visited = seeds.select(col(seedCol).as("node")).distinct()
      .withColumn("dist", lit(0))
      .repartition(p, col("node")).localCheckpoint(true)
    var frontier = visited.select("node")
    var fN = frontier.count()
    var d = 0
    while (fN > 0L && d < maxDepth && m > 0L) {
      d += 1
      val f = if (fN <= 500000L) broadcast(frontier) else frontier
      val next = sym
        .join(f.withColumnRenamed("node", "a"), Seq("a"), "left_semi")
        .select(col("b").as("node")).distinct()
        .join(visited.select("node"), Seq("node"), "left_anti")
        .withColumn("dist", lit(d))
        .repartition(p, col("node")).localCheckpoint(true)
      fN = next.count()
      if (fN > 0L) {
        visited = visited.union(next).localCheckpoint(true)
        frontier = next.select("node")
      }
    }
    visited
  }

  /** k-core decomposition membership: the maximal subgraph in which
    * every node has degree ≥ k, computed by synchronous peeling —
    * repeatedly delete all nodes of degree < k until none remain
    * (Batagelj–Zaveršnik semantics; the fixed point is unique, so the
    * synchronous rounds are deterministic under any partitioning).
    *
    * Convergence: each round either removes ≥ 1 node or is the fixed
    * point, so rounds ≤ |V|; in practice a handful. The loop stops at
    * the fixed point (edge count unchanged — one O(1) driver scalar
    * per round, the pageRank discipline) or at `maxRounds`, and an
    * unconverged exit is AUDITED loudly (log + the `converged=false`
    * flag on every row) — a truncated peel is a k-core SUPERSET, which
    * a silent exit would misrepresent. Cross-engine note: an oracle
    * unrolling R ≥ rounds-to-convergence iterations reaches the same
    * fixed point — extra rounds are no-ops on both sides.
    *
    * Scale shape, per round: one degree aggregation keyed on the node
    * and one semi-join of edges against surviving nodes (both ends) —
    * all on the node key, partitioning sized to the graph and reused.
    * Lineage is cut per round with an eager localCheckpoint (iterative
    * plans otherwise grow multiplicatively). Input edges may carry
    * duplicates / self-loops / either orientation — canonicalized here.
    *
    * Output: (node, core_deg) for members of the k-core, where
    * core_deg = the node's degree WITHIN the core subgraph (≥ k).
    */
  def kCore(edges: DataFrame, src: String, dst: String, k: Int,
            maxRounds: Int = 30): DataFrame = {
    require(k >= 1, "k must be >= 1")
    require(maxRounds >= 1, "maxRounds must be >= 1")
    val e0 = edges
      .select(least(col(src), col(dst)).as("x"),
        greatest(col(src), col(dst)).as("y"))
      .filter(col("x") =!= col("y")).distinct()
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val m0 = e0.count()
    if (m0 == 0L) {
      e0.unpersist()
      return e0.select(col("x").as("node"), lit(0L).as("core_deg"),
        lit(true).as("converged")).limit(0)
    }
    val p = math.max(1, math.min((m0 / 2000000L + 1).toInt, 200))
    var e = e0.repartition(p, col("x")).localCheckpoint(true)
    e0.unpersist()
    var m = m0
    var converged = false
    var round = 0
    while (!converged && round < maxRounds && m > 0L) {
      round += 1
      val deg = e.select(col("x").as("node"))
        .union(e.select(col("y").as("node")))
        .groupBy("node").agg(count(lit(1)).as("deg"))
      val keep0 = deg.filter(col("deg") >= k).select("node")
      // the survivor set has ≤ 2m nodes, and m (the previous round's
      // edge count) is already in hand — the size-conditional broadcast
      // discipline: a small round is two map-side semi-joins (no
      // shuffle beyond the degree aggregation), a big round keeps the
      // shuffled path. No per-round repartition: the joins re-key
      // anyway, and the eager checkpoint bounds lineage regardless.
      val keep = if (m <= 500000L) broadcast(keep0) else keep0
      val next = e
        .join(keep.withColumnRenamed("node", "x"), Seq("x"), "left_semi")
        .join(keep.withColumnRenamed("node", "y"), Seq("y"), "left_semi")
        .select("x", "y")
        .localCheckpoint(true)
      val mNext = next.count()
      converged = mNext == m
      m = mNext
      e = next
    }
    if (!converged && m > 0L)
      org.apache.log4j.Logger.getLogger(getClass)
        .warn(s"kCore: stopped at maxRounds=$maxRounds without " +
          s"converging ($m edges remain) — result is a k-core SUPERSET")
    e.select(col("x").as("node")).union(e.select(col("y").as("node")))
      .groupBy("node").agg(count(lit(1)).as("core_deg"))
      .withColumn("converged", lit(converged || m == 0L))
  }
}
