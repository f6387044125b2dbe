package graft.dedup

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.img.ImageTable.splitmix64

/** Document deduplication for training-data pipelines (driver prompt):
  * exact (hash groupBy — SparkEntry q20), MinHash+LSH, SimHash, with exact
  * n-gram-Jaccard verification of candidates.
  *
  * Scale design: everything is (narrow signature map) → (explode B band
  * keys) → (groupBy band bucket) → (pairs within bucket) → (verify join).
  * The only shuffles are the bucket groupBy and the verify join, both keyed
  * on content hashes (uniform). Degenerate buckets (mass-duplicated
  * boilerplate) are capped at `maxBucket` candidates — at 100 TB an
  * uncapped quadratic bucket is the failure mode that matters. Over-cap
  * buckets are NOT dropped: they emit star pairs against the bucket's
  * min-id hub (O(n) pairs, keeps mass-dup clusters connected for the
  * verify stage), and every pipeline `observe`s bucket counts
  * (`graft_*_buckets`: buckets / oversized_buckets / oversized_members) so
  * the degradation is visible in query metrics rather than silent.
  */
object Dedup {

  // ——— pure kernels ———

  /** Word n-gram shingle hash set (lowercased, whitespace-split). */
  def shingles(text: String, n: Int = 3): Array[Long] = {
    val toks = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
    if (toks.length < n) {
      if (toks.isEmpty) Array.empty
      else Array(splitmix64(toks.mkString(" ").hashCode.toLong))
    } else {
      val out = new Array[Long](toks.length - n + 1)
      var i = 0
      while (i + n <= toks.length) {
        var h = 1125899906842597L
        var j = i
        while (j < i + n) {
          var k = 0
          val t = toks(j)
          while (k < t.length) { h = h * 31 + t.charAt(k); k += 1 }
          h = h * 31 + ' '
          j += 1
        }
        out(i) = splitmix64(h)
        i += 1
      }
      out.distinct
    }
  }

  /** Per-permutation multipliers/offsets (odd multipliers ⇒ bijections mod
    * 2^64), derived once from splitmix64 — the inner loop then costs one
    * multiply-add per permutation instead of a full splitmix (measured ~3×
    * on the signature kernel, the CPU bottleneck of the minhash pass).
    */
  private val PermA: Array[Long] = Array.tabulate(256)(p => splitmix64(p * 2654435761L + 1) | 1L)
  private val PermB: Array[Long] = Array.tabulate(256)(p => splitmix64(p * 40503L + 7))

  /** k-permutation MinHash signature (one pass/shingle). Shingles are
    * already splitmix-mixed (uniform), so the cheap linear permutation
    * h_p(x) = a_p·x + b_p (mod 2^64, a_p odd) preserves min-hash
    * uniformity; unsigned comparison via Long.compareUnsigned.
    */
  def minhashSig(sh: Array[Long], k: Int = 64): Array[Long] = {
    require(k <= 256, s"k=$k exceeds precomputed permutation table")
    val sig = Array.fill(k)(-1L) // unsigned max
    var i = 0
    while (i < sh.length) {
      val x = sh(i)
      var p = 0
      while (p < k) {
        val v = PermA(p) * x + PermB(p)
        if (java.lang.Long.compareUnsigned(v, sig(p)) < 0) sig(p) = v
        p += 1
      }
      i += 1
    }
    sig
  }

  def jaccard(a: Array[Long], b: Array[Long]): Double = {
    if (a.isEmpty && b.isEmpty) return 1.0
    val sa = a.toSet; val sb = b.toSet
    val inter = sa.intersect(sb).size
    inter.toDouble / (sa.size + sb.size - inter)
  }

  /** 64-bit SimHash over word hashes (unit weights). */
  def simhash(text: String): Long = {
    val votes = new Array[Int](64)
    text.toLowerCase.split("\\s+").filter(_.nonEmpty).foreach { t =>
      var h = 1125899906842597L
      var k = 0
      while (k < t.length) { h = h * 31 + t.charAt(k); k += 1 }
      val mixed = splitmix64(h)
      var b = 0
      while (b < 64) { if (((mixed >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1; b += 1 }
    }
    var out = 0L
    var b = 0
    while (b < 64) { if (votes(b) > 0) out |= (1L << b); b += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  // ——— distributed pipelines ———

  /** MinHash LSH near-dup pairs with exact Jaccard verification.
    *
    * @param docs columns (idCol: bigint, textCol: string)
    * @return (id_a, id_b, jaccard) with id_a < id_b, jaccard >= threshold
    */
  def minhashPairs(spark: SparkSession, docs: DataFrame, threshold: Double = 0.7,
      k: Int = 64, bands: Int = 16, idCol: String = "doc_id", textCol: String = "text",
      maxBucket: Int = 64): DataFrame = {
    import spark.implicits._
    val rows = k / bands
    val sigs = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)]
      .map { case (id, text) => (id, minhashSig(shingles(text), k)) }
      .toDF("id", "sig")

    val banded = sigs.select(col("id"),
      posexplode(expr(s"transform(sequence(0, ${bands - 1}), b -> " +
        s"hash(b, slice(sig, b*$rows + 1, $rows)))")).as(Seq("band", "bkey")))

    val buckets = banded.groupBy("band", "bkey")
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")) >= 2)
      .observe("graft_minhash_buckets",
        count(lit(1)).as("buckets"),
        sum(when(size(col("ids")) > maxBucket, 1L).otherwise(0L)).as("oversized_buckets"),
        sum(when(size(col("ids")) > maxBucket, size(col("ids")).cast("long"))
          .otherwise(0L)).as("oversized_members"))

    // ≤ maxBucket: all pairs (quadratic but bounded). Over the cap: star
    // pairs against the min-id hub — linear, and a true duplicate cluster
    // stays connected through its hub instead of vanishing.
    val pairs = buckets.select(explode(expr(
      s"""CASE WHEN size(ids) <= $maxBucket THEN
         |  flatten(transform(ids, (a, i) ->
         |    transform(slice(ids, i + 2, size(ids)), b ->
         |      struct(least(a, b) as id_a, greatest(a, b) as id_b))))
         |ELSE
         |  transform(slice(ids, 2, size(ids)), b ->
         |    struct(ids[0] as id_a, b as id_b))
         |END""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b")).distinct()

    // verify: exact n-gram Jaccard on the candidate pairs only
    val texts = docs.select(col(idCol).cast("long").as("tid"), col(textCol).as("t"))
    pairs
      .join(texts.withColumnRenamed("tid", "id_a").withColumnRenamed("t", "ta"), Seq("id_a"))
      .join(texts.withColumnRenamed("tid", "id_b").withColumnRenamed("t", "tb"), Seq("id_b"))
      .as[(Long, Long, String, String)]
      .map { case (b, a, ta, tb) => (a, b, jaccard(shingles(ta), shingles(tb))) }
      .toDF("id_a", "id_b", "jaccard")
      .filter(col("jaccard") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("jaccard"))
  }

  /** Connected components over a near-duplicate pair graph — the step that
    * turns verified pairs into DUPLICATE CLUSTERS (one keeper per
    * component). Iterative min-label propagation: every node adopts the
    * minimum label in its closed neighborhood until fixpoint.
    *
    * Scale shape: each round is one self-equi-join on node id + one
    * groupBy-min — both shuffles keyed on ids (uniform); state is one
    * (node, label) row per node, persisted per round with the previous
    * round released. Rounds ≤ graph diameter; near-dup graphs are
    * star/clique-like (diameter ~2-3), so planet-scale runs converge in a
    * handful of rounds. (For adversarial long-chain graphs, switch to the
    * large-star/small-star alternation — same building blocks, O(log n)
    * rounds.)
    *
    * @param edges columns (src: bigint, dst: bigint), undirected pairs
    * @return (id, component) where component = min node id reachable
    */
  def connectedComponents(spark: SparkSession, edges: DataFrame,
      maxIter: Int = 20): DataFrame = {
    val lvl = org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK
    val und = edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct()
      .persist(lvl)
    // State management: each round persists its output and releases the
    // previous round's cache once materialized. Every 4th round ALSO cuts
    // lineage with an eager localCheckpoint — the plan references the
    // previous round twice (self join + neighbor agg), so untruncated
    // lineage doubles per round and overflows the stack by ~iteration 10;
    // bounded 2^4 plan growth between cuts keeps recompute-on-eviction
    // cheap. (On a cluster with unreliable executors, swap for reliable
    // checkpoint() + a checkpoint dir.)
    var labels = und.select(col("src").as("id")).distinct()
      .withColumn("component", col("id"))
      .persist(lvl)
    var cachedPrev: Option[DataFrame] = Some(labels)
    var changed = 1L
    var it = 0
    while (changed > 0 && it < maxIter) {
      // min over self-label and every neighbor's label
      val viaNeighbors = und
        .join(labels.withColumnRenamed("id", "dst"), Seq("dst"))
        .groupBy(col("src").as("id"))
        .agg(min(col("component")).as("nbr"))
      val next = labels.join(viaNeighbors, Seq("id"), "left")
        .select(col("id"),
          least(col("component"), coalesce(col("nbr"), col("component"))).as("component"),
          (col("nbr") < col("component")).as("moved"))
        .persist(lvl)
      changed = next.filter(col("moved")).count() // materializes next
      cachedPrev.foreach(_.unpersist(blocking = false))
      if (it % 4 == 3) {
        labels = next.drop("moved").localCheckpoint(true)
        next.unpersist(blocking = false)
        cachedPrev = None
      } else {
        labels = next.drop("moved") // backed by next's cache
        cachedPrev = Some(next)
      }
      it += 1
    }
    und.unpersist(blocking = false)
    if (changed > 0)
      // wrong-but-silent labels are worse than a visible warning: a chain
      // longer than maxIter rounds leaves one true component split
      System.err.println(s"[graft.Dedup] connectedComponents did NOT converge " +
        s"after $maxIter rounds ($changed labels still moving) — raise maxIter " +
        s"or use log-round star contraction for long-chain graphs")
    labels
  }

  /** SimHash near-dup pairs: 4×16-bit band LSH + Hamming-distance verify. */
  def simhashPairs(spark: SparkSession, docs: DataFrame, maxHamming: Int = 3,
      idCol: String = "doc_id", textCol: String = "text", maxBucket: Int = 64): DataFrame = {
    import spark.implicits._
    val fps = docs.select(col(idCol).cast("long"), col(textCol))
      .as[(Long, String)].map { case (id, t) => (id, simhash(t)) }
      .toDF("id", "fp")
    val banded = fps.select(col("id"), col("fp"),
      explode(expr("transform(sequence(0, 3), b -> " +
        "struct(b as band, shiftright(fp, b*16) & 65535 as bkey))")).as("bb"))
      .select(col("id"), col("fp"), col("bb.band"), col("bb.bkey"))
    val buckets = banded.groupBy("band", "bkey")
      .agg(array_sort(collect_list(struct(col("id"), col("fp")))).as("xs"))
      .filter(size(col("xs")) >= 2)
      .observe("graft_simhash_buckets",
        count(lit(1)).as("buckets"),
        sum(when(size(col("xs")) > maxBucket, 1L).otherwise(0L)).as("oversized_buckets"),
        sum(when(size(col("xs")) > maxBucket, size(col("xs")).cast("long"))
          .otherwise(0L)).as("oversized_members"))
    // same cap policy as minhashPairs: bounded all-pairs, star hub above cap
    buckets.select(explode(expr(
      s"""CASE WHEN size(xs) <= $maxBucket THEN
         |  flatten(transform(xs, (a, i) ->
         |    transform(slice(xs, i + 2, size(xs)), b -> struct(
         |      least(a.id, b.id) as id_a, greatest(a.id, b.id) as id_b,
         |      a.fp as fp_a, b.fp as fp_b))))
         |ELSE
         |  transform(slice(xs, 2, size(xs)), b -> struct(
         |    xs[0].id as id_a, b.id as id_b, xs[0].fp as fp_a, b.fp as fp_b))
         |END""".stripMargin)).as("p"))
      .select(col("p.id_a"), col("p.id_b"),
        bit_count(col("p.fp_a").bitwiseXOR(col("p.fp_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }
}
