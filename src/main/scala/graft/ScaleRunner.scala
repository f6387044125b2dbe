package graft

import org.apache.spark.sql.SparkSession

/** One "cluster" of the scaling experiment: a fresh JVM pinned (by the
  * parent, via taskset) to `cores` CPUs, running the north-rule spatial-join
  * + tile job. Separate JVMs per cluster size keep GC/JIT/thread-pool
  * ergonomics sized to the core count — flipping affinity inside one JVM
  * leaves 32-CPU-sized GC thrashing an 8-CPU mask (measured 10x slowdowns).
  *
  * args: <cores> <nImages> [reps]; prints one JSON line.
  */
object ScaleRunner {

  /** Pure-register arithmetic throughput across `threads` threads — the
    * host's parallel-CPU ceiling, free of memory/GC effects. Reported next
    * to the job number so the scaling efficiency can be read against what
    * this (shared, virtualized) host physically delivers.
    */
  def spinThroughput(threads: Int): Double = {
    val perThread = 2000000000L / threads
    def work(iters: Long): Long = {
      var x = 1469598103934665603L; var i = 0L
      while (i < iters) { x = x * 1099511628211L + i; i += 1 }
      x
    }
    work(100000000L) // JIT warmup
    val pool = java.util.concurrent.Executors.newFixedThreadPool(threads)
    val t0 = System.nanoTime()
    val fs = (0 until threads).map(_ => pool.submit(
      new java.util.concurrent.Callable[Long] { def call(): Long = work(perThread) }))
    fs.foreach(_.get())
    pool.shutdown()
    2.0e9 / ((System.nanoTime() - t0) / 1e9)
  }

  def main(args: Array[String]): Unit = {
    val cores = args(0).toInt
    val n = args(1).toLong
    val reps = if (args.length > 2) args(2).toInt else 3
    val spin = spinThroughput(cores)
    val spark = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"graft-scale-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.spatialTileJob(spark, 2000, cores) // warmup: JIT + codegen paths
    val times = (1 to reps).map { _ =>
      val t0 = System.nanoTime()
      Bench.spatialTileJob(spark, n, 32)
      (System.nanoTime() - t0) / 1e9
    }
    val best = times.min
    println(f"""{"cores":$cores,"images":$n,"sec":$best%.3f,"images_per_sec":${n / best}%.1f,"spin_ops_per_sec":$spin%.3e,"runs":[${times.map(t => f"$t%.3f").mkString(",")}]}""")
    spark.stop()
  }
}
