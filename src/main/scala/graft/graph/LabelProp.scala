package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Synchronous majority-vote label propagation (Raghavan, Albert,
  * Kumara 2007) — community detection, DISTINCT from connected
  * components: a min-label fixpoint merges everything reachable, while
  * the majority vote lets dense substructures keep their own label
  * across sparse bridges. Fully deterministic variant: every node
  * updates simultaneously each round (no asynchronous visit order) and
  * ties break to the SMALLEST label — the two places the published
  * algorithm leaves to randomness.
  *
  * Per round: one equi-join (edge × labels), one (node, label) count
  * aggregation, one argmax via max(struct(cnt, −label)) — two hash
  * exchanges, no window over anything unbounded. State is node-sized,
  * eagerly localCheckpoint'ed per round (iterative-plan-growth
  * discipline, see Bfs.scala). A fixed small round count is the
  * standard LPA stopping regime; callers pick it (communities stabilize
  * in a handful of rounds; oscillation, LPA's documented failure mode,
  * is bounded by the cap rather than detected).
  */
object LabelProp {

  /** (id, label) after `rounds` synchronous majority-vote rounds over
    * the undirected `edges` (src, dst), labels initialized to node ids.
    * `nodes` supplies the id universe (isolated nodes keep their own
    * label forever).
    */
  def propagate(spark: SparkSession, nodes: DataFrame, edges: DataFrame,
      rounds: Int): DataFrame = {
    val lvl = StorageLevel.MEMORY_AND_DISK
    val und = edges.select(col("src").cast("long").as("src"),
      col("dst").cast("long").as("dst"))
    val dir = und.union(und.select(col("dst").as("src"), col("src").as("dst")))
      .filter(col("src") =!= col("dst"))
      .distinct()
      .persist(lvl)
    var labels = nodes.select(col("id").cast("long").as("id"))
      .withColumn("lab", col("id"))
      .localCheckpoint(true)
    var r = 0
    while (r < rounds) {
      val nbr = dir.join(labels, dir("dst") === labels("id"))
        .select(dir("src").as("id"), col("lab"))
      val cnts = nbr.groupBy(col("id"), col("lab"))
        .agg(count(lit(1)).as("cnt"))
      val voted = cnts.groupBy(col("id"))
        .agg(max(struct(col("cnt"), (-col("lab")).as("nl"))).as("m"))
        .select(col("id"), (-col("m.nl")).as("vlab"))
      val next = labels.join(voted, Seq("id"), "left")
        .select(col("id"), coalesce(col("vlab"), col("lab")).as("lab"))
        .localCheckpoint(true)
      labels.unpersist()
      labels = next
      r += 1
    }
    dir.unpersist()
    labels.select(col("id"), col("lab").as("label"))
  }
}
