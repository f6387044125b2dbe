package graft.join

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Backward as-of join — for every probe row, the build row with the
  * greatest `time` ≤ the probe's `time`, per key. Spark has no ASOF
  * operator; the naive formulations are a theta join (quadratic) or a
  * per-key collect (driver-bound). This is the scalable classic instead:
  * tag the two streams, union them, ONE hash shuffle on the key, ONE
  * per-key sort on (time, side), and a running `last(_, ignoreNulls)`
  * window carries the latest build payload forward into each probe row.
  * Cost is sort-shuffle of |probe| + |build| — no pair blowup, no driver
  * state, AQE-coalescible. Build rows sort BEFORE probe rows at an equal
  * timestamp, so ties match (as-of ≤ semantics, same as DuckDB's
  * `ASOF JOIN ... ON p.t >= b.t`, which q85 uses as the oracle).
  *
  * The caller must make build rows unique per (key, time) first (e.g.
  * aggregate) — otherwise "the" matched payload is not well defined in any
  * engine. Skew note: one key's whole history lands in one task; per-key
  * histories are user-scale (bounded), not corpus-scale, and a pathological
  * key would surface in the shuffle metrics long before it OOMs.
  */
object AsofJoin {

  /** @param probe     left side; all its columns survive
    * @param build     right side; must be unique per (key, time)
    * @param key       equality column present on both sides
    * @param time      ordering column present on both sides
    * @param buildCols build payload columns to carry (time excluded — it is
    *                  always emitted as `asof_<time>`)
    * @return probe columns + `asof_<time>` + `asof_<c>` per payload column,
    *         all null when no build row precedes the probe row
    */
  def backward(probe: DataFrame, build: DataFrame, key: String, time: String,
      buildCols: Seq[String]): DataFrame = {
    val probeCols = probe.columns.toSeq
    val payloadType = StructType((time +: buildCols).map(c => build.schema(c)))
    val probeType = StructType(probeCols.map(c => probe.schema(c)))
    val b = build.select(col(key), col(time), lit(0).as("__side"),
      struct((col(time) +: buildCols.map(col)): _*).as("__payload"),
      lit(null).cast(probeType).as("__probe"))
    val p = probe.select(col(key), col(time), lit(1).as("__side"),
      lit(null).cast(payloadType).as("__payload"),
      struct(probeCols.map(col): _*).as("__probe"))
    val w = Window.partitionBy(key).orderBy(col(time), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = b.unionByName(p)
      .withColumn("__asof", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
    val out = probeCols.map(c => col(s"__probe.$c").as(c)) ++
      (col(s"__asof.$time").as(s"asof_$time") +:
        buildCols.map(c => col(s"__asof.$c").as(s"asof_$c")))
    carried.select(out: _*)
  }
}
