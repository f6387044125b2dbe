package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** k-core decomposition by iterative peeling (Matula & Beck 1983): drop
  * every node of degree < k, recompute degrees, repeat to fixpoint. The
  * k-core is the standard crawl-graph quality prior — pages outside a
  * small core are disproportionately spam/orphans — and the dense-cluster
  * seed for the dedup families (a near-dup cluster is a high-k core of
  * the similarity graph).
  *
  * Scale shape per round: one degree aggregation (map-side combined) and
  * two anti-join filters on the peel set — shuffle joins, not broadcasts,
  * because round 1's peel set is corpus-sized on real crawl graphs.
  * State follows the ccPropagate conventions (Dedup.scala): persist each
  * round's edge set, release the previous once materialized, and cut
  * lineage with an eager localCheckpoint every 4th round — peeling a
  * path at k=2 removes only the two endpoints per round, so rounds are
  * O(n) worst-case and untruncated lineage would overflow long before
  * the data does. Non-convergence inside `maxRounds` throws loudly: a
  * truncated peel would silently overstate the core.
  */
object KCore {

  /** Nodes of the k-core of the undirected graph `edges` (src, dst),
    * with their within-core degree. Self-loops are dropped (a self-loop
    * inflates its node's degree but adds no connectivity — the standard
    * simple-graph reading); parallel/reverse duplicates collapse.
    */
  def kCore(spark: SparkSession, edges: DataFrame, k: Int,
      maxRounds: Int = 1000): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val simple = edges.select(col("src"), col("dst"))
      .filter(col("src") =!= col("dst"))
    var und = simple
      .union(simple.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(lvl)
    var round = 0
    var stable = false
    while (!stable && round < maxRounds) {
      val deg = und.groupBy(col("src")).agg(count(lit(1)).as("deg"))
      // peel is read three times per round (isEmpty + both anti-joins);
      // persisting it makes the degree aggregation run once per round —
      // on a slow-unraveling graph (the documented O(n)-rounds path
      // case) the unpersisted form tripled the per-round cost
      val peel = deg.filter(col("deg") < k).select(col("src")).persist(lvl)
      if (peel.isEmpty) {
        stable = true
        peel.unpersist(blocking = false)
      } else {
        val next = und
          .join(peel, Seq("src"), "left_anti")
          .join(peel.withColumnRenamed("src", "dst"), Seq("dst"), "left_anti")
        val kept =
          if (round % 4 == 3) next.localCheckpoint(true)
          else next.persist(lvl)
        kept.count() // materialize before releasing the parent round
        peel.unpersist(blocking = false)
        und.unpersist(blocking = false)
        und = kept
        round += 1
      }
    }
    if (!stable)
      throw new IllegalStateException(
        s"kCore(k=$k) did not reach a fixpoint in $maxRounds rounds")
    val out = und.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("core_degree"))
    out
  }
}
