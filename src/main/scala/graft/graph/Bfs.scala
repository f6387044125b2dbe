package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source BFS hop distance over an undirected edge list — the
  * graph-geodesic form of region growing: seeded at a polygon set over
  * the rook-contiguity graph it yields "rings of adjacency" (the
  * drive-time-zone / contamination-spread primitive); seeded at a page
  * set over a link graph it is the crawl-frontier depth.
  *
  * Level-synchronous frontier expansion: round r joins the current
  * frontier against the directed edge view, anti-joins everything
  * already labeled, and labels the remainder r. Each node is labeled
  * exactly once with its MINIMUM hop count (BFS invariant), so total
  * work is O(edges) across all rounds — per round one hash join + one
  * distinct + one anti-join, all equi-keyed, no window, no sort.
  *
  * State management is STRICTER than the KCore.scala convention: both
  * the frontier and the accumulated labels are eagerly
  * localCheckpoint'ed EVERY round, not every 4th. Each round's plan
  * re-embeds the (potentially enormous) upstream of the edge list —
  * ring assembly, in the contiguity case — so without per-round
  * truncation the plan tree grows by one upstream copy per hop and a
  * 20-hop graph OOMs the driver on PLANS, not data (observed). The
  * checkpoint rows are frontier-sized; the superseded frame's blocks
  * are released once the successor is materialized. Unreached nodes
  * simply don't appear (the caller left-joins if it wants NULL =
  * unreachable). Non-convergence inside `maxRounds` throws loudly
  * rather than returning a silently truncated horizon.
  */
object Bfs {

  /** (id, hops) for every node reachable from `seeds` (id column) over
    * the undirected `edges` (rel_a, rel_b) — the contiguity schema, so
    * [[graft.osm.BoundaryExtract.contiguity]] and
    * [[graft.geom.PointPattern.distanceBand]] outputs drop straight in.
    */
  def hops(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 256): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val und = edges.select(col("rel_a").cast("long").as("src"),
      col("rel_b").cast("long").as("dst"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(lvl)
    var dist = seeds.select(col("id").cast("long").as("id")).distinct()
      .withColumn("hops", lit(0L))
      .localCheckpoint(true)
    var frontier = dist
    var round = 1
    var done = false
    while (!done) {
      // eager checkpoint: truncates the per-round plan to a leaf (see
      // the scaladoc — plan growth, not data, is the hazard here)
      val next = frontier.join(dir, frontier("id") === dir("src"))
        .select(col("dst").as("id")).distinct()
        .join(dist.select(col("id")), Seq("id"), "left_anti")
        .withColumn("hops", lit(round.toLong))
        .localCheckpoint(true)
      if (next.isEmpty) {
        next.unpersist()
        if (frontier ne dist) frontier.unpersist()
        done = true
      } else if (round > maxRounds) {
        // a NON-empty frontier PAST the bound is the failure — a graph
        // converging in exactly maxRounds label rounds is fine (round
        // maxRounds labels it; round maxRounds+1 probes empty, above).
        // Release round state before throwing: a caller that catches
        // and retries must not accumulate orphaned blocks.
        next.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist.unpersist()
        dir.unpersist()
        throw new IllegalStateException(
          s"Bfs.hops did not converge within $maxRounds rounds")
      } else {
        val acc = dist.unionByName(next).localCheckpoint(true)
        dist.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist = acc
        frontier = next
        round += 1
      }
    }
    dir.unpersist()
    dist
  }

  /** All-pairs hop distance — every node is its own BFS source, run as
    * ONE level-synchronous loop over (origin, node) state rows instead
    * of |V| separate traversals: round r joins the frontier against the
    * directed edge view on the current node and anti-joins the visited
    * set on the (origin, node) pair. Per round: one equi-join + one
    * distinct + one anti-join, state is origin×reached sized — the
    * closeness-centrality / average-path-length primitive. All-pairs
    * state is O(V²) by definition: callers cap the component size, not
    * this loop (at 100 TB you run it per bounded community, never on
    * the raw web graph). Same eager localCheckpoint discipline as
    * [[hops]] (plan growth is the driver hazard).
    *
    * Returns (src, id, hops) for every ordered reachable pair,
    * including (v, v, 0).
    */
  /** All-pairs hop distance AND shortest-path counts — the forward pass
    * of Brandes' betweenness algorithm run for every origin at once as
    * ONE level-synchronous loop over (origin, node) state rows. The BFS
    * invariant extends to counts: when round r first reaches `id`, its
    * σ(origin, id) is the sum of σ over ALL its distance-(r−1)
    * predecessors, and the frontier is exactly the distance-(r−1) set
    * with final σ values — so one (origin, dst) sum-aggregation per
    * round computes the counts exactly (Brandes 2001, eq. for σ).
    * Per round: one equi-join + one hash aggregation + one anti-join.
    * Same O(V²) state caveat and eager localCheckpoint discipline as
    * [[allPairsHops]] — a bounded-community operator.
    *
    * Returns (origin, id, hops, sigma) for every ordered reachable
    * pair, with σ(v, v) = 1.
    */
  def allPairsSigma(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val und = edges.select(col("rel_a").cast("long").as("src"),
      col("rel_b").cast("long").as("dst"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(lvl)
    val nodes = dir.select(col("src").as("id")).distinct()
    var dist = nodes.select(col("id").as("origin"), col("id"))
      .withColumn("hops", lit(0L))
      .withColumn("sigma", lit(1L))
      .localCheckpoint(true)
    var frontier = dist
    var round = 1
    var done = false
    while (!done) {
      // sum BEFORE the anti-join: candidates that are really at
      // distance < r get a (wrong) sum too, but the anti-join discards
      // them; survivors are exactly the distance-r nodes, whose
      // predecessors all sit in the frontier — their sum is final
      val next = frontier.join(dir.withColumnRenamed("src", "cur"),
          frontier("id") === col("cur"))
        .groupBy(col("origin"), col("dst").as("id"))
        .agg(sum(col("sigma")).as("sigma"))
        .join(dist.select(col("origin"), col("id")), Seq("origin", "id"), "left_anti")
        .withColumn("hops", lit(round.toLong))
        .select(col("origin"), col("id"), col("hops"), col("sigma"))
        .localCheckpoint(true)
      if (next.isEmpty) {
        next.unpersist()
        if (frontier ne dist) frontier.unpersist()
        done = true
      } else if (round > maxRounds) {
        next.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist.unpersist()
        dir.unpersist()
        throw new IllegalStateException(
          s"Bfs.allPairsSigma did not converge within $maxRounds rounds")
      } else {
        val acc = dist.unionByName(next).localCheckpoint(true)
        dist.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist = acc
        frontier = next
        round += 1
      }
    }
    dir.unpersist()
    dist
  }

  def allPairsHops(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val und = edges.select(col("rel_a").cast("long").as("src"),
      col("rel_b").cast("long").as("dst"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(lvl)
    val nodes = dir.select(col("src").as("id")).distinct()
    var dist = nodes.select(col("id").as("origin"), col("id"))
      .withColumn("hops", lit(0L))
      .localCheckpoint(true)
    var frontier = dist
    var round = 1
    var done = false
    while (!done) {
      val next = frontier.join(dir.withColumnRenamed("src", "cur"),
          frontier("id") === col("cur"))
        .select(col("origin"), col("dst").as("id")).distinct()
        .join(dist.select(col("origin"), col("id")), Seq("origin", "id"), "left_anti")
        .withColumn("hops", lit(round.toLong))
        .localCheckpoint(true)
      if (next.isEmpty) {
        next.unpersist()
        if (frontier ne dist) frontier.unpersist()
        done = true
      } else if (round > maxRounds) {
        next.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist.unpersist()
        dir.unpersist()
        throw new IllegalStateException(
          s"Bfs.allPairsHops did not converge within $maxRounds rounds")
      } else {
        val acc = dist.unionByName(next).localCheckpoint(true)
        dist.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist = acc
        frontier = next
        round += 1
      }
    }
    dir.unpersist()
    dist
  }
}
