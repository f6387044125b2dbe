package graft

import org.apache.spark.sql.SparkSession

/** Dev harness: dump `.explain("formatted")` for named SparkEntry
  * queries into a directory — the evidence files the optimization
  * rounds commit under plans/rNN/. Iterative queries execute their
  * driver loop during construction, so their file pins the FINAL stage
  * plan (the localCheckpoint-truncated frame), same convention as
  * PlanAuditSpec. Usage:
  * `runMain graft.PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]`.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    if (args.length < 3) {
      System.err.println("usage: PlanDump <outDir> <suffix> <q1,q2,...> [sfDir]")
      sys.exit(2)
    }
    val outDir = java.nio.file.Paths.get(args(0))
    val suffix = args(1)
    val names = args(2).split(',').toSeq
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.01"
    java.nio.file.Files.createDirectories(outDir)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.plans.PipJoinRewrite.install(spark)
    for (n <- names) {
      try {
        val df = SparkEntry.queries(n)(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        java.nio.file.Files.writeString(outDir.resolve(s"${n}_$suffix.txt"), plan)
        println(s"[plandump] wrote $n")
      } catch {
        case e: Throwable => System.err.println(s"[plandump] $n FAILED: $e")
      }
    }
    spark.stop()
  }
}
