package graft.text

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items sketch (Misra & Gries, Sci. Comput. Program.
  * 1982) with the mergeable-summaries combine rule (Agarwal, Cormode et al.,
  * PODS'12 §3): at most `k` counters, one pass, and for every item
  *
  *   true − N/(k+1)  ≤  estimate  ≤  true
  *
  * where N is the total items seen — so any item with frequency above
  * N/(k+1) is GUARANTEED to hold a counter. This is the bounded-memory
  * answer to [[TextOps.topTerms]] when the term universe doesn't fit an
  * executor: per-partition sketches merge associatively (sum counters, then
  * subtract the (k+1)-st largest count from all and drop the non-positive),
  * and the merged bound is the sum of the parts' bounds — the property
  * SketchSpec pins.
  *
  * Deliberately a plain serializable value (not a Spark UDAF): the
  * distributed form is a `mapPartitions` → driver `reduce` over ≤
  * numPartitions sketch objects of size ≤ k — metadata-sized by
  * construction, the same shape Spark's own `countMinSketch` helper uses.
  */
final class MisraGries(val k: Int) extends Serializable {
  require(k >= 1, s"k=$k must be >= 1")
  private val counters = scala.collection.mutable.HashMap.empty[String, Long]
  private var total = 0L

  /** Items seen (for the N/(k+1) error bound). */
  def n: Long = total

  def add(x: String): this.type = {
    total += 1
    counters.get(x) match {
      case Some(c) => counters.update(x, c + 1)
      case None if counters.size < k => counters.update(x, 1L)
      case None =>
        // decrement-all: every counter loses 1, zeros evicted. O(k), and
        // each decrement "pays for" k+1 items — the source of the bound.
        val dead = scala.collection.mutable.ArrayBuffer.empty[String]
        counters.mapValuesInPlace((_, c) => c - 1)
        counters.foreach { case (t, c) => if (c <= 0) dead += t }
        dead.foreach(counters.remove)
    }
    this
  }

  /** Lower-bound estimate of x's frequency (within N/(k+1) of truth). */
  def estimate(x: String): Long = counters.getOrElse(x, 0L)

  /** Surviving counters, largest first, ties on the term. */
  def items: Seq[(String, Long)] =
    counters.toSeq.sortBy { case (t, c) => (-c, t) }

  /** Mergeable-summaries combine: sum counters, then if more than k
    * survive, subtract the (k+1)-st largest count from every counter and
    * evict the non-positive — exactly the PODS'12 rule that keeps the
    * additive error bounds additive.
    */
  def merge(other: MisraGries): MisraGries = {
    require(other.k == k, s"cannot merge k=$k with k=${other.k}")
    val out = new MisraGries(k)
    out.total = total + other.total
    counters.foreach { case (t, c) => out.counters.update(t, c) }
    other.counters.foreach { case (t, c) =>
      out.counters.update(t, out.counters.getOrElse(t, 0L) + c)
    }
    if (out.counters.size > k) {
      val kth = out.counters.values.toArray.sorted(Ordering.Long.reverse).apply(k)
      val dead = scala.collection.mutable.ArrayBuffer.empty[String]
      out.counters.mapValuesInPlace((_, c) => c - kth)
      out.counters.foreach { case (t, c) => if (c <= 0) dead += t }
      dead.foreach(out.counters.remove)
    }
    out
  }
}

/** Mergeable quantile sketch in the KLL compactor style (Karnin, Lang,
  * Liberty, FOCS'16), made DETERMINISTIC: each level keeps a buffer of up
  * to `k` items at weight 2^level; a full level sorts and keeps every
  * second item (per-level alternating start parity instead of KLL's coin
  * flip), promoting survivors one level up at doubled weight. Rank error
  * grows by at most 2^level per level-i compaction; with capacity k per
  * level the total is O(N/k · log) — SketchSpec pins the empirical bound
  * on adversarial stream orders. Deterministic compaction trades KLL's
  * unbiasedness for bit-reproducibility — the same stream in the same
  * partition order always yields the same sketch, which is what a
  * verifiable pipeline wants.
  *
  * Same deployment shape as [[MisraGries]]: per-partition sketches, one
  * driver-side merge of ≤ numPartitions × (k·levels) doubles.
  */
final class KllSketch(val k: Int) extends Serializable {
  require(k >= 8, s"k=$k must be >= 8")
  private val levels = scala.collection.mutable.ArrayBuffer(
    scala.collection.mutable.ArrayBuffer.empty[Double])
  private val parity = scala.collection.mutable.ArrayBuffer(false)
  private var total = 0L

  def n: Long = total

  def add(x: Double): this.type = {
    total += 1
    levels(0) += x
    var lvl = 0
    while (lvl < levels.length && levels(lvl).length >= k) { compact(lvl); lvl += 1 }
    this
  }

  private def ensureLevel(l: Int): Unit =
    while (levels.length <= l) {
      levels += scala.collection.mutable.ArrayBuffer.empty[Double]
      parity += false
    }

  /** Sort the level, promote every second item at doubled weight; an odd
    * leftover stays at this level so total weight is exactly preserved.
    */
  private def compact(lvl: Int): Unit = {
    ensureLevel(lvl + 1)
    val buf = levels(lvl)
    val sorted = buf.toArray
    java.util.Arrays.sort(sorted)
    val nEven = sorted.length - (sorted.length % 2)
    val start = if (parity(lvl)) 1 else 0
    parity(lvl) = !parity(lvl)
    buf.clear()
    if (sorted.length > nEven) buf += sorted(nEven) // leftover keeps weight
    var i = start
    while (i < nEven) { levels(lvl + 1) += sorted(i); i += 2 }
  }

  def merge(other: KllSketch): KllSketch = {
    require(other.k == k, s"cannot merge k=$k with k=${other.k}")
    val out = new KllSketch(k)
    out.total = total + other.total
    out.ensureLevel(math.max(levels.length, other.levels.length) - 1)
    for (l <- levels.indices) out.levels(l) ++= levels(l)
    for (l <- other.levels.indices) out.levels(l) ++= other.levels(l)
    var lvl = 0
    while (lvl < out.levels.length) {
      while (out.levels(lvl).length >= k) out.compact(lvl)
      lvl += 1
    }
    out
  }

  /** Estimated number of stream items ≤ x. */
  def rank(x: Double): Long = {
    var r = 0L
    for (l <- levels.indices; v <- levels(l)) if (v <= x) r += (1L << l)
    r
  }

  /** Smallest retained value whose estimated rank reaches q·n. */
  def quantile(q: Double): Double = {
    require(q >= 0.0 && q <= 1.0, s"q=$q")
    val items = (for (l <- levels.indices; v <- levels(l)) yield (v, 1L << l)).sortBy(_._1)
    require(items.nonEmpty, "empty sketch")
    val target = math.max(1L, math.ceil(q * total).toLong)
    var cum = 0L
    for ((v, w) <- items) {
      cum += w
      if (cum >= target) return v
    }
    items.last._1
  }
}

object KllSketch {

  /** Distributed quantile sketch of a numeric column: one sketch per
    * partition (narrow, bounded memory), merged on the driver.
    */
  def ofColumn(spark: SparkSession, df: DataFrame, valueCol: String, k: Int = 200): KllSketch = {
    import spark.implicits._
    df.select(col(valueCol).cast("double")).as[Double]
      .mapPartitions { it =>
        val s = new KllSketch(k)
        it.foreach(s.add)
        Iterator.single(s)
      }(org.apache.spark.sql.Encoders.javaSerialization[KllSketch])
      .reduce(_ merge _)
  }
}

object MisraGries {

  /** Distributed frequent terms over a documents table: one Misra–Gries
    * sketch per partition (narrow, bounded memory), merged on the driver —
    * ≤ numPartitions sketches of ≤ k counters cross the wire, never a
    * term-universe-sized shuffle. Returns (term, est_count) for the
    * surviving counters with the guarantee documented on the class.
    */
  def ofTerms(spark: SparkSession, docs: DataFrame, k: Int,
      textCol: String = "text"): MisraGries = {
    import spark.implicits._
    docs.select(col(textCol)).as[String]
      .mapPartitions { it =>
        val mg = new MisraGries(k)
        it.foreach(t => TextOps.tokenize(t).foreach(mg.add))
        Iterator.single(mg)
      }(org.apache.spark.sql.Encoders.javaSerialization[MisraGries])
      .reduce(_ merge _)
  }
}

/** Count–Min sketch (Cormode & Muthukrishnan, J. Algorithms 2005) in its
  * DataFrame-native form: the sketch IS a bounded (row, cell) → count
  * table. Each key updates one cell per row via h_i(k) = splitmix64(k ⊕ i)
  * masked to the table width, so building it is a narrow explode(depth) +
  * ONE groupBy on at most depth·width cells — no term-universe shuffle,
  * no driver state — and two sketches merge by adding counts (linearity,
  * pinned in SketchSpec). Estimates are UPPER bounds (min over rows never
  * undercounts — the dual of Misra–Gries' lower bound), with the standard
  * guarantee err ≤ e·N/width at probability 1 − e^−depth per query.
  * Every hash is the codegen'd splitmix64 expression, so counters and
  * estimates replay bit-exactly in the ANSI oracle (q93).
  */
object CountMin {
  import org.apache.spark.sql.{Column, SparkSession}

  /** Row-i cell of `key` (non-negative long): low bits of splitmix64(k ⊕ i).
    * `width` must be a power of two so the signed mask equals the unsigned
    * modulus the oracle computes.
    */
  def cellCol(spark: SparkSession, key: Column, i: Column, width: Int): Column = {
    require(width >= 2 && (width & (width - 1)) == 0, s"width=$width not a power of 2")
    graft.functions.GraftFunctions
      .splitmixCol(spark, key.bitwiseXOR(i.cast("long")))
      .bitwiseAND(lit((width - 1).toLong))
  }

  /** Build the sketch: (i, cell, cnt) with i < depth, cell < width. */
  def counters(spark: SparkSession, df: DataFrame, keyCol: String,
      depth: Int, width: Int): DataFrame = {
    require(depth >= 1 && depth <= 16, s"depth=$depth")
    df.select(col(keyCol).cast("long").as("k"))
      .withColumn("i", explode(array((0 until depth).map(d => lit(d.toLong)): _*)))
      .withColumn("cell", cellCol(spark, col("k"), col("i"), width))
      .groupBy("i", "cell").agg(count(lit(1)).as("cnt"))
  }

  /** Point estimates for `probes`' distinct keys: min over rows of the
    * key's cells, 0 for never-seen keys. The sketch is depth·width rows —
    * broadcast — so estimation is map-side over the probe set.
    */
  def estimate(spark: SparkSession, sketch: DataFrame, probes: DataFrame,
      keyCol: String, depth: Int, width: Int): DataFrame =
    probes.select(col(keyCol).cast("long").as("k")).distinct()
      .withColumn("i", explode(array((0 until depth).map(d => lit(d.toLong)): _*)))
      .withColumn("cell", cellCol(spark, col("k"), col("i"), width))
      .join(broadcast(sketch), Seq("i", "cell"), "left")
      .groupBy("k")
      .agg(min(coalesce(col("cnt"), lit(0L))).as("est"))
}
