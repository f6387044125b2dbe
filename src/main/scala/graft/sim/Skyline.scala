package graft.sim

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skyline (Pareto-dominance) query over integer criteria — the
  * multi-criteria selection primitive (Börzsönyi et al., ICDE 2001):
  * keep every row no other row dominates, where b dominates a iff b is
  * ≥ on every criterion and > on at least one. Ties/duplicates survive
  * (neither dominates the other) — matching the ANSI NOT EXISTS
  * semantics an oracle replays.
  *
  * Two-phase distributed shape: (1) a LOCAL skyline per input partition
  * via the sort-filter scan (sort by criterion sum descending — a point
  * can only be dominated by one of larger-or-equal sum, so one forward
  * pass against the kept buffer suffices) — narrow, no shuffle, output
  * per partition is that partition's Pareto set; (2) the union of local
  * skylines (a superset of the global skyline, since a globally
  * undominated row is undominated in its partition) is BROADCAST and
  * the global skyline filtered from it with one dominance anti-join —
  * no all-pairs shuffle ever materializes. Memory bound: the local
  * Pareto set per partition; for anticorrelated worst cases cap input
  * partition sizes upstream.
  */
object Skyline {

  /** items: (id: string/long, c1, c2, c3) integer criteria, larger =
    * better. Returns the undominated rows with the original columns.
    */
  def skyline3(spark: SparkSession, items: DataFrame,
      idCol: String = "i", c1: String = "c1", c2: String = "c2",
      c3: String = "c3"): DataFrame = {
    import spark.implicits._
    val typed = items.select(col(idCol).cast("string").as("id"),
        col(c1).cast("long"), col(c2).cast("long"), col(c3).cast("long"))
      .as[(String, Long, Long, Long)]
    val local = typed.mapPartitions { it =>
      val arr = it.toArray.sortBy { case (_, a, b, c) => -(a + b + c) }
      val kept = collection.mutable.ArrayBuffer.empty[(String, Long, Long, Long)]
      arr.foreach { case t @ (_, a, b, c) =>
        val dominated = kept.exists { case (_, ka, kb, kc) =>
          ka >= a && kb >= b && kc >= c && (ka > a || kb > b || kc > c)
        }
        if (!dominated) kept += t
      }
      kept.iterator
    }.toDF("id", "kc1", "kc2", "kc3")
    val cand = local.select(col("kc1"), col("kc2"), col("kc3")).distinct()
    items.join(broadcast(cand),
      cand("kc1") >= col(c1) && cand("kc2") >= col(c2) &&
        cand("kc3") >= col(c3) &&
        (cand("kc1") > col(c1) || cand("kc2") > col(c2) ||
          cand("kc3") > col(c3)),
      "left_anti")
  }
}
