package graft.graph

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Exact path-based centralities over bounded communities — the metrics
  * a link-graph curation pipeline ranks crawl seeds and prunes
  * link-farms with. Everything here is INTEGER-exact (no floating
  * dependency accumulation), so every query is DuckDB-oracle-able.
  *
  * Scale shape: all-pairs state is O(V²) by definition — like
  * [[Bfs.allPairsHops]] these operators are for bounded components
  * (per-community after LPA / connected components), never the raw web
  * graph. Within that contract every step is an equi-join or hash
  * aggregation keyed by node or (origin, node); nothing windows over an
  * unbounded partition.
  */
object Centrality {

  /** Stress centrality (Shimbel 1953): stress(v) = number of shortest
    * paths that pass THROUGH v, i.e. Σ over unordered pairs {s,t},
    * v ∉ {s,t}, with d(s,v) + d(v,t) = d(s,t), of σ(s,v)·σ(v,t) — the
    * integer-exact sibling of betweenness (which divides each term by
    * σ(s,t) and so leaves the integers).
    *
    * ONE batched forward pass ([[Bfs.allPairsSigma]]) then a three-way
    * self-join on the (origin, node) table: legs (s→v) and (v→t) meet on
    * v, the (s→t) row supplies the distance test. All joins are
    * equi-keyed on node ids; the pair table is hull...(component)-sized.
    * Nodes on no shortest path report 0 via the left join onto the node
    * universe.
    *
    * Returns (id, stress).
    */
  def stress(spark: SparkSession, edges: DataFrame,
      maxRounds: Int = 64): DataFrame = {
    // allPairsSigma returns an eagerly localCheckpoint'ed frame — the
    // three legs below re-read materialized blocks, not the BFS loop
    val ap = Bfs.allPairsSigma(spark, edges, maxRounds)
    val a = ap.select(col("origin").as("s"), col("id").as("v"),
      col("hops").as("h_sv"), col("sigma").as("sig_sv"))
    val b = ap.select(col("origin").as("v2"), col("id").as("t"),
      col("hops").as("h_vt"), col("sigma").as("sig_vt"))
    val st = ap.select(col("origin").as("s3"), col("id").as("t3"),
      col("hops").as("h_st"))
    val contrib = a.join(b, col("v") === col("v2"))
      .filter(col("s") < col("t") && col("v") =!= col("s") && col("v") =!= col("t"))
      .join(st, col("s") === col("s3") && col("t") === col("t3") &&
        col("h_sv") + col("h_vt") === col("h_st"))
      .groupBy(col("v"))
      .agg(sum(col("sig_sv") * col("sig_vt")).as("stress"))
    val out = ap.select(col("id")).distinct()
      .join(contrib, col("id") === col("v"), "left")
      .select(col("id"), coalesce(col("stress"), lit(0L)).as("stress"))
    out
  }

  /** Newman–Girvan modularity of a community assignment, EXACT — per
    * community the sufficient statistics and its contribution to Q as
    * an integer numerator over the shared denominator 4m²:
    *
    *   Q = Σ_c ( L_c/m − (D_c/2m)² ) = Σ_c (4·m·L_c − D_c²) / 4m²
    *
    * where m = |undirected edges|, L_c = intra-community edges, D_c =
    * total degree of c's nodes. Emits one row per community:
    * (label, n_nodes, l_in, d_tot, contrib_num, q_den) with
    * contrib_num = 4·m·L_c − D_c² and q_den = 4m² constant — summing
    * contrib_num/q_den over rows gives Q exactly.
    *
    * `labels` is (id, label) (e.g. [[LabelProp.propagate]] output);
    * `edges` is (src, dst), orientation and duplicates normalized here.
    * Shape: two hash aggregations keyed by label + one broadcast of the
    * single-row m — no window, no skewed key (labels are communities).
    */
  def modularity(spark: SparkSession, labels: DataFrame,
      edges: DataFrame): DataFrame = {
    val lab = labels.select(col("id").cast("long").as("id"),
      col("label").cast("long").as("label"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val und = edges.select(col("src").cast("long").as("src"),
        col("dst").cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .persist(StorageLevel.MEMORY_AND_DISK)
    val m = und.agg(count(lit(1)).as("m"))
    val el = und
      .join(lab.select(col("id").as("a"), col("label").as("la")), Seq("a"))
      .join(lab.select(col("id").as("b"), col("label").as("lb")), Seq("b"))
    val intra = el.filter(col("la") === col("lb"))
      .groupBy(col("la").as("label"))
      .agg(count(lit(1)).as("l_in"))
    val dir = und.select(col("a").as("id"))
      .union(und.select(col("b").as("id")))
    val deg = dir.groupBy(col("id")).agg(count(lit(1)).as("deg"))
    val byLab = lab.join(deg, Seq("id"), "left")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_nodes"),
        sum(coalesce(col("deg"), lit(0L))).as("d_tot"))
    val out = byLab.join(intra, Seq("label"), "left")
      .crossJoin(broadcast(m))
      .select(col("label"), col("n_nodes"),
        coalesce(col("l_in"), lit(0L)).as("l_in"), col("d_tot"),
        (lit(4L) * col("m") * coalesce(col("l_in"), lit(0L)) -
          col("d_tot") * col("d_tot")).as("contrib_num"),
        (lit(4L) * col("m") * col("m")).as("q_den"))
    out
  }
}
