package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Multi-source single-source-shortest-path over a weighted undirected
  * edge list — the weighted generalization of [[Bfs.hops]]: road-network
  * travel cost seeded at depots, weighted-hop spread over a contiguity
  * graph, link-cost crawl depth.
  *
  * Frontier-relaxation Bellman-Ford (the Pregel SSSP shape): each round
  * relaxes ONLY the nodes whose distance improved last round — one hash
  * join frontier×edges, one min-combine per touched node, one left join
  * against the accumulated labels to keep strict improvements. With
  * positive integer weights every improvement lowers a node's Long
  * distance, so the improved set empties in at most V rounds and each
  * round is equi-keyed narrow work (no window, no sort, no cartesian).
  * Negative or zero weights would unbound the loop — rejected IN-PLAN
  * by a raise_error conjunct on the edge load (the PointPattern guard
  * pattern), so a bad weight fails the job even under filter pushdown
  * rather than spinning the driver loop.
  *
  * Plan-tree state follows the [[Bfs]] lesson verbatim: frontier and
  * accumulated labels are eagerly localCheckpoint'ed EVERY round —
  * re-embedding a ring-assembly upstream once per relaxation round OOMs
  * the driver on plans long before data is a problem.
  */
object Sssp {

  /** (id, dist) for every node reachable from `seeds` (id column) over
    * undirected weighted `edges` (rel_a, rel_b, w) — contiguity schema
    * plus a positive integer weight column. Seeds start at distance 0;
    * unreached nodes don't appear.
    */
  def distances(spark: SparkSession, edges: DataFrame, seeds: DataFrame,
      maxRounds: Int = 512): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val guardedW = when(col("w") > 0, col("w"))
      .otherwise(raise_error(concat(
        lit("Sssp: non-positive weight on edge "), col("src"),
        lit("-"), col("dst"))).cast("long"))
    val und = edges.select(col("rel_a").cast("long").as("src"),
      col("rel_b").cast("long").as("dst"), col("w").cast("long").as("w"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst"),
        col("w")))
      .select(col("src"), col("dst"), guardedW.as("w"))
      .persist(lvl)
    var dist = seeds.select(col("id").cast("long").as("id")).distinct()
      .withColumn("dist", lit(0L))
      .localCheckpoint(true)
    var frontier = dist
    var round = 1
    var done = false
    while (!done) {
      val relaxed = frontier.join(dir, frontier("id") === dir("src"))
        .select(col("dst").as("id"), (col("dist") + col("w")).as("nd"))
        .groupBy(col("id")).agg(min(col("nd")).as("nd"))
      val improved = relaxed.join(dist, Seq("id"), "left")
        .filter(col("dist").isNull || col("nd") < col("dist"))
        .select(col("id"), col("nd").as("dist"))
        .localCheckpoint(true)
      if (improved.isEmpty) {
        improved.unpersist()
        if (frontier ne dist) frontier.unpersist()
        done = true
      } else if (round > maxRounds) {
        // non-empty improvement set past the bound — release round state
        // before throwing (the Bfs catch-and-retry contract)
        improved.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist.unpersist()
        dir.unpersist()
        throw new IllegalStateException(
          s"Sssp.distances did not converge within $maxRounds rounds")
      } else {
        val acc = dist.join(improved.select(col("id")), Seq("id"), "left_anti")
          .unionByName(improved)
          .localCheckpoint(true)
        dist.unpersist()
        if (frontier ne dist) frontier.unpersist()
        dist = acc
        frontier = improved
        round += 1
      }
    }
    dir.unpersist()
    dist
  }
}
