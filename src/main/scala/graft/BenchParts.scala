package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev harness: decompose the headline spatial-join+tile job into its
  * phases and time each with a noop-style count — the guide §1.4
  * isolation step for the north metric. Not part of the bench contract.
  * Usage: `runMain graft.BenchParts [nImages] [reps]`.
  */
object BenchParts {
  def main(args: Array[String]): Unit = {
    val nImages = if (args.nonEmpty) args(0).toLong else 150000L
    val reps = if (args.length > 1) args(1).toInt else 2
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.PipJoinRewrite.install(spark)
    def time[A](label: String)(body: => A): A = {
      val t0 = System.nanoTime()
      val a = body
      println(f"[parts] $label%-22s ${(System.nanoTime() - t0) / 1e9}%.3f s")
      a
    }
    // warmup
    Bench.spatialTileJob(spark, 500, cpus)
    for (_ <- 1 to reps) {
      val polys = time("buildPolys")(Bench.buildPolys(spark))
      time("polys.count")(polys.count())
      val imgs = graft.img.ImageTable.generate(spark, nImages, cpus).toDF()
        .withColumn("idx", substring(col("image_id"), 5, 9).cast("long"))
        .withColumn("lat", graft.functions.GraftFunctions.latOfKey(col("idx")))
        .withColumn("lon", graft.functions.GraftFunctions.lonOfKey(col("idx")))
      time("generate.count")(imgs.count())
      time("generate.noop")(imgs.write.format("noop").mode("overwrite").save())
      val assigned = graft.join.SpatialJoin.assign(spark, imgs, polys, res = 7)
      time("assign.count")(assigned.count())
      val tiled = graft.tile.Tiling.tile(spark, assigned)
      time("tile.count")(tiled.count())
      time("fulljob")(Bench.spatialTileJob(spark, nImages, cpus))
    }
    spark.stop()
  }
}
