package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact set-similarity join with PREFIX FILTERING (Chaudhuri et al.
  * ICDE'06 SSJoin; Xiao et al. WWW'08 PPJoin): two sets with
  * Jaccard ≥ t MUST share a token among the first
  * p = |S| − ⌈t·|S|⌉ + 1 tokens of each set under any single global
  * token order — so candidates come from an equi-join over prefix
  * tokens only, and ordering tokens by ASCENDING corpus frequency puts
  * the rarest tokens in the prefix, which is what makes the candidate
  * set sparse. This is the exact-join counterpart of the capped
  * inverted-index heuristics (q104/q112): nothing is dropped, the
  * filter is a theorem, and the verify step computes true Jaccard on
  * candidates only.
  *
  * Plan: presence dedup → token frequencies (one groupBy) → per-doc
  * prefix via a doc-partitioned window ordered by the raw (f, item)
  * key — the prefix-filter theorem needs only SOME global total order
  * (Xiao et al. WWW'08 §3) and (frequency asc, item) IS one, so no
  * dense-rank materialization and no single-partition sort anywhere;
  * the vocabulary grows with the corpus in real deployments (shingle
  * items), so a global rank window here would be a scale-killer →
  * prefix equi-join → pair-distinct → intersection counts on
  * candidates → the integer threshold test
  * tDen·inter ≥ tNum·(|A|+|B|−inter), no floats anywhere.
  */
object JaccardJoin {

  /** Pairs (doc_a < doc_b) with Jaccard(A, B) ≥ tNum/tDen over `items`
    * (doc_id, item); returns (doc_a, doc_b, inter, sz_a, sz_b).
    */
  def similarPairs(spark: SparkSession, items: DataFrame,
      tNum: Int, tDen: Int): DataFrame = {
    require(tNum > 0 && tNum <= tDen, s"need 0 < tNum <= tDen, got $tNum/$tDen")
    val tok = items.select(col("doc_id"), col("item")).distinct()
    val sizes = tok.groupBy(col("doc_id")).agg(count(lit(1)).as("sz"))
    val freq = tok.groupBy(col("item")).agg(count(lit(1)).as("f"))
    // prefix length p = sz − ceil(t·sz) + 1, all integer
    val ceilT = floor((col("sz") * tNum + tDen - 1) / lit(tDen.toDouble)).cast("long")
    val prefix = tok.join(freq, Seq("item")).join(sizes, Seq("doc_id"))
      .withColumn("rn",
        row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("f"), col("item"))))
      .filter(col("rn") <= col("sz") - ceilT + 1)
      .select(col("doc_id"), col("item"))
    val cand = prefix.select(col("item"), col("doc_id").as("doc_a"))
      .join(prefix.select(col("item"), col("doc_id").as("doc_b")), Seq("item"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    val inter = cand
      .join(tok.select(col("doc_id").as("doc_a"), col("item")), Seq("doc_a"))
      .join(tok.select(col("doc_id").as("doc_b"), col("item")), Seq("doc_b", "item"))
      .groupBy(col("doc_a"), col("doc_b")).agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.select(col("doc_id").as("doc_a"), col("sz").as("sz_a")), Seq("doc_a"))
      .join(sizes.select(col("doc_id").as("doc_b"), col("sz").as("sz_b")), Seq("doc_b"))
      .filter(col("inter") * tDen >= (col("sz_a") + col("sz_b") - col("inter")) * tNum)
      .select(col("doc_a"), col("doc_b"), col("inter"), col("sz_a"), col("sz_b"))
  }
}
