package graft.dedup

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sorted-neighborhood dedup (Hernández & Stolfo, "The merge/purge
  * problem for large databases", SIGMOD 1995): sort the corpus by a
  * blocking key, slide a window of `w` records down the sorted order,
  * and verify each in-window pair with an EXACT edit distance. The
  * classic record-linkage complement to hash blocking (MinHash/SimHash
  * in [[Dedup]]): hash blocking finds high-overlap sets, the sorted
  * neighborhood finds near-identical strings whose difference is a
  * small edit — typos, suffix noise — that can still flip many
  * shingles.
  *
  * Scale shape — the global sliding window WITHOUT a global sort:
  *  1. ONE range exchange on (key, id) — Spark's sampled range
  *     partitioner, the same exchange a distributed sort-merge uses;
  *  2. global ranks from per-partition `row_number` plus driver-cumsum
  *     partition offsets (the partition-count aggregate is
  *     metadata-sized — one long per partition; the same
  *     offsets-as-literals idiom as [[graft.text.TextOps.packShards]]);
  *  3. in-window pairs as an EQUI-JOIN on rank (each row joined to
  *     ranks +1..+w−1) — cross-partition neighbor pairs fall out of the
  *     join with no boundary special-casing, because ranks are global;
  *  4. `levenshtein` (codegen'd built-in) verifies pairs only —
  *     O(w·N) verifications, never O(N²).
  *
  * The range-partitioned frame is persisted so the partition-id stamp
  * is computed ONCE (a re-evaluated sampled range exchange could place
  * boundary rows differently between the counts job and the rank job);
  * released by the ContextCleaner when the result frame goes
  * unreachable.
  */
object Snm {

  /** In-window near-pairs: (id_a, id_b, dist) where id_a precedes id_b
    * in (blocking-key, id) order by at most w−1 positions and
    * levenshtein(text_a, text_b) ≤ maxDist. Deterministic: the sort
    * order is total (id tiebreak), so the pair set is a pure function
    * of the input.
    *
    * @param key blocking-key expression evaluated over `docs` (e.g. a
    *            text prefix, a normalized name); ORDER semantics are
    *            (key ASC, id ASC)
    */
  def neighborPairs(spark: SparkSession, docs: DataFrame, key: Column,
      w: Int = 4, maxDist: Int = 16, idCol: String = "doc_id",
      textCol: String = "text", numPartitions: Int = 0): DataFrame = {
    require(w >= 2, s"w=$w must be >= 2")
    require(maxDist >= 0, s"maxDist=$maxDist")
    val np = if (numPartitions > 0) numPartitions
      else spark.sessionState.conf.numShufflePartitions
    val pidded = docs
      .select(col(idCol).cast("long").as("id"), col(textCol).as("txt"), key.as("k"))
      .repartitionByRange(np, col("k"), col("id"))
      .withColumn("pid", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val cnts = pidded.groupBy(col("pid")).count()
      .collect().map(r => (r.getInt(0), r.getLong(1))).sortBy(_._1)
    var acc = 0L
    val offsets = cnts.map { case (p, c) => val o = (p, acc); acc += c; o }
    val offDf = spark.createDataFrame(offsets.toSeq).toDF("pid", "off")
    val wLoc = Window.partitionBy(col("pid")).orderBy(col("k"), col("id"))
    val ranked = pidded.join(broadcast(offDf), Seq("pid"))
      .withColumn("rk", col("off") + row_number().over(wLoc))
      .select(col("id"), col("txt"), col("rk"))
    // each row probes the next w-1 ranks; the equi-join shuffles on the
    // (uniform, dense) rank key
    val probes = ranked.select(col("id").as("id_a"), col("txt").as("ta"),
        explode(sequence(lit(1), lit(w - 1))).as("d"), col("rk"))
      .select(col("id_a"), col("ta"), (col("rk") + col("d")).as("rk_b"))
    probes.join(
        ranked.select(col("id").as("id_b"), col("txt").as("tb"), col("rk").as("rk_b")),
        Seq("rk_b"))
      // length-band prefilter: |len(a) − len(b)| lower-bounds the edit
      // distance, so out-of-band pairs skip the O(len²) levenshtein
      // entirely — exact (loses nothing), and it removes most of the
      // quadratic verify work (the verify WAS the whole 14.3 s cost of
      // q105 at sf0.1: neighbors in sorted order mostly differ in length)
      .filter(abs(length(col("ta")) - length(col("tb"))) <= maxDist)
      // thresholded levenshtein: the banded O(len·maxDist) algorithm
      // (returns −1 above the threshold) instead of the full O(len²)
      // table — with the band ≪ len this is the other order of magnitude
      .withColumn("dist",
        levenshtein(col("ta"), col("tb"), maxDist).cast("long"))
      .filter(col("dist") >= 0 && col("dist") <= maxDist)
      .select(col("id_a"), col("id_b"), col("dist"))
  }
}
