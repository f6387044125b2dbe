package graft.naming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Safe-name + case-insensitive duplicate suffixing — operator N1
  * (`/root/reference/src/output/output_handler.rs:101-129`).
  */
object Naming {

  /** Forbidden filename chars stripped by `make_safe`
    * (output_handler.rs:127-129): the raw set `\ / & : < > | *`.
    */
  final val ForbiddenChars: Set[Char] = Set('\\', '/', '&', ':', '<', '>', '|', '*')

  /** Pure kernel — exact `make_safe` port. */
  def makeSafe(name: String): String = name.filterNot(ForbiddenChars.contains)

  /** Column form of makeSafe (codegen'd regexp, no UDF). */
  def makeSafeCol(name: Column): Column =
    regexp_replace(name, "[\\\\/&:<>|*]", "")

  /** Distributed N1: add an `out_name` column. Names whose lowercase SAFE
    * form occurs more than once get a `_{relation_id}` suffix — ALL
    * duplicates suffixed, order-independent (output_handler.rs:101-125).
    * One narrow window shuffle on lower(safe); at 100 TB the name cardinality
    * is tiny relative to data, and the partition key is the lowercased name
    * itself, so skew equals true duplicate density (bounded).
    */
  def withDedupedNames(
      df: DataFrame,
      nameCol: String = "name",
      idCol: String = "relation_id",
      outCol: String = "out_name"): DataFrame = {
    val safe = makeSafeCol(col(nameCol))
    val w = Window.partitionBy(lower(col("__safe")))
    df.withColumn("__safe", safe)
      .withColumn("__cnt", count(lit(1)).over(w))
      .withColumn(outCol,
        when(col("__cnt") > 1, concat(col("__safe"), lit("_"), col(idCol)))
          .otherwise(col("__safe")))
      .drop("__safe", "__cnt")
  }

  /** Pure-Scala N1 for kernel tests: mirrors pair_safe_filenames_and_polygons. */
  def dedupNames(namesAndIds: Seq[(String, Long)]): Seq[String] = {
    val safe = namesAndIds.map { case (n, _) => makeSafe(n) }
    val dups = safe.groupBy(_.toLowerCase).collect { case (k, v) if v.size > 1 => k }.toSet
    safe.zip(namesAndIds).map { case (s, (_, id)) =>
      if (dups.contains(s.toLowerCase)) s"${s}_$id" else s
    }
  }
}
