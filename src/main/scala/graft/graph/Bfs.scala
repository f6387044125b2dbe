package graft.graph

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance over an undirected edge list — the
  * graph-geodesic form of region growing: seeded at a polygon set over
  * the rook-contiguity graph it yields "rings of adjacency" (the
  * drive-time-zone / contamination-spread primitive); seeded at a page
  * set over a link graph it is the crawl-frontier depth.
  *
  * Level-synchronous frontier expansion, run as BLOCKED round fusion:
  * the per-round step is a SINGLE self-edge-augmented join + one hash
  * aggregation over the label state — self-edges carry every existing
  * label through the round while real edges expand only the
  * still-fresh frontier, so the state frame is referenced exactly once
  * per round and a block of `blockRounds` rounds chains LAZILY with a
  * linear plan. One lazy localCheckpoint + one count() action per
  * block replaces the three driver jobs per round of the unfused loop
  * (checkpoint, probe, accumulate) — on driver-latency-bound graphs
  * (every fixture here; any loaded cluster) wall clock drops by the
  * fusion factor while total shuffled bytes stay O(edges + labels ·
  * rounds), the same as the unfused accumulate-per-round loop.
  *
  * The BFS invariant is untouched: a node's label is set exactly once,
  * at its minimum hop count — the min(struct(hops, fresh)) combine
  * prefers the existing label (fresh = 0) over any arrival, and fresh
  * nodes expand exactly one round later, inside the same block.
  * Convergence is detected from the label count at block boundaries
  * (labels only ever grow; an unchanged count across ≥ 1 fused round
  * means the frontier expanded nothing — the fixpoint). `maxRounds`
  * semantics are preserved exactly: blocks are clamped to land a
  * boundary at `maxRounds`, and one extra probe round decides between
  * "converged in exactly maxRounds" (fine) and "still growing"
  * (throws) — the same contract the unfused loop had.
  *
  * Plan-growth discipline: the block boundary's localCheckpoint
  * truncates the logical plan (lazy — the count() that follows
  * materializes it in the same job), so the per-block plan is
  * `blockRounds` joins deep regardless of total rounds; a 20-hop graph
  * never re-embeds its upstream more than `blockRounds` times.
  */
object Bfs {

  private val lvl = StorageLevel.MEMORY_AND_DISK

  /** Run `body(cur, roundNo)` as lazily-chained rounds with a
    * localCheckpoint + count() at each block boundary; returns the
    * converged state. `probe` returns (row count, convergence
    * signature) in ONE action — count alone when labels are immutable;
    * count + sum when values can improve. Preserves the exact maxRounds
    * contract: converging in exactly `maxRounds` rounds succeeds,
    * needing more throws.
    */
  private[graft] def runBlocked(init: DataFrame, maxRounds: Int,
      blockRounds: Int, what: String,
      probe: DataFrame => (Long, Seq[Any]))(body: (DataFrame, Int) => DataFrame): DataFrame = {
    // AQE is scope-disabled for the fused blocks (the SnapshotTable
    // commit precedent): a block is blockRounds chained join+aggregate
    // stages whose shapes are fully known up front — tiny state, fixed
    // keys, join side already decided from measured sizes (joinSide) —
    // so adaptive re-planning has nothing to improve and charges one
    // re-optimization round trip per stage to a loop whose whole cost
    // IS stage latency. Static planning submits each stage the moment
    // its parent finishes. In its place the loop sizes its own shuffle:
    // the state row count is measured at every boundary anyway, so the
    // next block's shuffle partition count derives from it (~100k rows
    // per partition, clamped to the session setting) — the guide's
    // "derive partitioning from input size" rule, which AQE coalescing
    // would otherwise apply at per-stage replanning cost. A 128-row
    // frontier stops paying 32 reduce tasks × blockRounds stages per
    // block; a billion-row state keeps the session's full parallelism.
    val spark = init.sparkSession
    val aqeKey = "spark.sql.adaptive.enabled"
    val partsKey = "spark.sql.shuffle.partitions"
    val prevAqe = spark.conf.get(aqeKey, "true")
    val prevParts = spark.conf.get(partsKey, "200")
    spark.conf.set(aqeKey, "false")
    def tuneParts(stateRows: Long): Unit = {
      val p = math.max(1L, math.min(prevParts.toLong, stateRows / 100000L + 1L))
      spark.conf.set(partsKey, p.toString)
    }
    try {
      var state = init.localCheckpoint(false)
      var (n, sig) = probe(state) // materializes the lazy checkpoint too
      var steps = 0
      var done = false
      while (!done) {
        tuneParts(n)
        val target = if (steps >= maxRounds) steps + 1 // single probe round
          else math.min(steps + blockRounds, maxRounds)
        var cur = state
        while (steps < target) { cur = body(cur, steps + 1); steps += 1 }
        val t0 = System.nanoTime()
        val next = cur.localCheckpoint(false)
        val t1 = System.nanoTime()
        val (nextN, nextSig) = probe(next)
        if (sys.env.contains("GRAFT_LOOP_DEBUG")) System.err.println(
          f"[$what] steps=$steps cp=${(t1-t0)/1e9}%.3f probe=${(System.nanoTime()-t1)/1e9}%.3f n=$nextN")
        if (nextSig == sig) {
          done = true
          state = next
        } else if (steps > maxRounds) {
          throw new IllegalStateException(
            s"$what did not converge within $maxRounds rounds")
        } else {
          state = next
          n = nextN
          sig = nextSig
        }
      }
      state
    } finally {
      spark.conf.set(aqeKey, prevAqe)
      spark.conf.set(partsKey, prevParts)
    }
  }

  private[graft] def countProbe(df: DataFrame): (Long, Seq[Any]) = {
    val n = df.count()
    (n, Seq(n))
  }

  /** Materialize the loop-invariant edge view once (eager local
    * checkpoint — one job, plan cut to a leaf) and decide its join side
    * from the MEASURED row count against the session's own broadcast
    * threshold: a genuinely small view broadcasts (each fused round is
    * then exchange-free on the edge side and AQE never has to replan
    * the join), a big one keeps the plain shuffle join — the decision a
    * cost-based planner would make if checkpointed RDDs carried
    * accurate statistics. ~64 bytes/row is the conservative unsafe-row
    * estimate for the ≤ 4-column long views used here.
    */
  private[graft] def joinSide(edgeView: DataFrame): DataFrame = {
    val t0 = System.nanoTime()
    // lazy checkpoint + count: ONE job materializes the view and
    // measures it (an eager checkpoint would pay a second, separate job
    // for the count)
    val cp = edgeView.localCheckpoint(false)
    val threshold = cp.sparkSession.sessionState.conf.autoBroadcastJoinThreshold
    val n = cp.count()
    if (sys.env.contains("GRAFT_LOOP_DEBUG")) System.err.println(
      f"[joinSide] rows=$n sec=${(System.nanoTime()-t0)/1e9}%.3f")
    if (threshold > 0 && n * 64 <= threshold) broadcast(cp) else cp
  }

  /** Directed edge view with one self-edge per node (`self` = 1):
    * the device that lets one equi-join per round both carry existing
    * labels (via self-edges) and expand the fresh frontier (via real
    * edges), keeping the round's plan a single reference to the state.
    */
  private[graft] def withSelfEdges(dir: DataFrame,
      extraNodes: Option[DataFrame]): DataFrame = {
    val nodes0 = dir.select(col("src"))
    val nodes = extraNodes.map(e => nodes0.union(e.select(col("src"))))
      .getOrElse(nodes0).distinct()
    dir.withColumn("self", lit(0))
      .unionByName(nodes.select(col("src"), col("src").as("dst"),
        lit(1).as("self")))
  }

  /** (id, hops) for every node reachable from `seeds` (id column) over
    * the undirected `edges` (rel_a, rel_b) — the contiguity schema, so
    * [[graft.osm.BoundaryExtract.contiguity]] and
    * [[graft.geom.PointPattern.distanceBand]] outputs drop straight in.
    */
  def hops(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 256, blockRounds: Int = 8): DataFrame = {
    val und = edges.select(col("rel_a").cast("long").as("src"),
      col("rel_b").cast("long").as("dst"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
    val seedIds = seeds.select(col("id").cast("long").as("src")).distinct()
    val dirPlus = joinSide(withSelfEdges(dir, Some(seedIds)))
    val init = seedIds.select(col("src").as("id"))
      .withColumn("hops", lit(0L)).withColumn("fresh", lit(1))
    val out = runBlocked(init, maxRounds, blockRounds, "Bfs.hops",
        countProbe) { (cur, _) =>
      cur.withColumnRenamed("id", "src")
        .join(dirPlus, Seq("src"))
        .filter(col("self") === 1 || col("fresh") === 1)
        .select(col("dst"),
          when(col("self") === 1, col("hops")).otherwise(col("hops") + 1L).as("h"),
          (lit(1) - col("self")).as("f"))
        .groupBy(col("dst"))
        .agg(min(struct(col("h"), col("f"))).as("m"))
        .select(col("dst").as("id"), col("m.h").as("hops"), col("m.f").as("fresh"))
    }
    out.select(col("id"), col("hops"))
  }

  /** All-pairs hop distance — every node is its own BFS source, run as
    * ONE blocked level-synchronous loop over (origin, node) state rows
    * instead of |V| separate traversals. All-pairs state is O(V²) by
    * definition: callers cap the component size, not this loop (at
    * 100 TB you run it per bounded community, never on the raw web
    * graph). Returns (origin, id, hops) for every ordered reachable
    * pair, including (v, v, 0).
    */
  def allPairsHops(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 64, blockRounds: Int = 4): DataFrame = {
    val und = edges.select(col("rel_a").cast("long").as("src"),
      col("rel_b").cast("long").as("dst"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val dirPlus = joinSide(withSelfEdges(dir, None))
    // node universe read OFF the checkpointed view (self-edge rows are
    // exactly one per node) — the old dir.distinct() here re-evaluated
    // the whole edge upstream a second time just to seed the state
    val init = dirPlus.filter(col("self") === 1)
      .select(col("src").as("origin"), col("src").as("id"))
      .withColumn("hops", lit(0L)).withColumn("fresh", lit(1))
    val out = runBlocked(init, maxRounds, blockRounds, "Bfs.allPairsHops",
        countProbe) { (cur, _) =>
      cur.withColumnRenamed("id", "src")
        .join(dirPlus, Seq("src"))
        .filter(col("self") === 1 || col("fresh") === 1)
        .select(col("origin"), col("dst"),
          when(col("self") === 1, col("hops")).otherwise(col("hops") + 1L).as("h"),
          (lit(1) - col("self")).as("f"))
        .groupBy(col("origin"), col("dst"))
        .agg(min(struct(col("h"), col("f"))).as("m"))
        .select(col("origin"), col("dst").as("id"),
          col("m.h").as("hops"), col("m.f").as("fresh"))
    }
    out.select(col("origin"), col("id"), col("hops"))
  }

  /** All-pairs hop distance AND shortest-path counts — the forward pass
    * of Brandes' betweenness algorithm run for every origin at once.
    * The BFS invariant extends to counts: when round r first reaches
    * `id`, its σ(origin, id) is the sum of σ over ALL its
    * distance-(r−1) predecessors — which are exactly the rows fresh in
    * the previous fused round — so the per-round aggregation sums
    * arrival σ for fresh targets and carries the existing (hops, σ)
    * through the self-edge otherwise (Brandes 2001, eq. for σ). Same
    * O(V²) state caveat and blocked-fusion discipline as
    * [[allPairsHops]].
    *
    * Returns (origin, id, hops, sigma) for every ordered reachable
    * pair, with σ(v, v) = 1.
    */
  def allPairsSigma(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 64, blockRounds: Int = 4): DataFrame = {
    val und = edges.select(col("rel_a").cast("long").as("src"),
      col("rel_b").cast("long").as("dst"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
    val dirPlus = joinSide(withSelfEdges(dir, None))
    // node universe off the checkpointed view — see allPairsHops
    val init = dirPlus.filter(col("self") === 1)
      .select(col("src").as("origin"), col("src").as("id"))
      .withColumn("hops", lit(0L)).withColumn("sigma", lit(1L))
      .withColumn("fresh", lit(1))
    val out = runBlocked(init, maxRounds, blockRounds, "Bfs.allPairsSigma",
        countProbe) { (cur, _) =>
      cur.withColumnRenamed("id", "src")
        .join(dirPlus, Seq("src"))
        .filter(col("self") === 1 || col("fresh") === 1)
        .select(col("origin"), col("dst"),
          when(col("self") === 1, col("hops")).otherwise(col("hops") + 1L).as("h"),
          col("sigma"), col("self"))
        .groupBy(col("origin"), col("dst"))
        .agg(max(col("self")).as("hs"),
          min(when(col("self") === 1, col("h"))).as("h_old"),
          max(when(col("self") === 1, col("sigma"))).as("sig_old"),
          min(when(col("self") === 0, col("h"))).as("h_new"),
          sum(when(col("self") === 0, col("sigma"))).as("sig_new"))
        .select(col("origin"), col("dst").as("id"),
          when(col("hs") === 1, col("h_old")).otherwise(col("h_new")).as("hops"),
          when(col("hs") === 1, col("sig_old")).otherwise(col("sig_new")).as("sigma"),
          (lit(1) - col("hs")).as("fresh"))
    }
    out.select(col("origin"), col("id"), col("hops"), col("sigma"))
  }
}
