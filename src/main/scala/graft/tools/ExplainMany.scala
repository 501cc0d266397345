package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: write `explain("formatted")` of many registered queries to
  * `<outDir>/<query-short-name>_<suffix>.txt` in ONE session — the plan
  * evidence files the optimization rounds commit (plans/r12/...).
  * Session posture matches [[graft.Bench]] (extensions, shuffle
  * partitions = cpus, AQE on) so the captured plans are the benched ones.
  * Usage: tools/run.sh graft.tools.ExplainMany <outDir> <suffix> <sfDir> <q1,q2,...>
  */
object ExplainMany {
  def main(args: Array[String]): Unit = {
    if (args.length < 4) {
      System.err.println(
        "usage: tools/run.sh graft.tools.ExplainMany <outDir> <suffix> " +
          "<sfDir> <q1,q2,...>")
      sys.exit(2)
    }
    val (outDir, suffix, sfDir) = (args(0), args(1), args(2))
    val names = args(3).split(",").toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val short = "q(\\d+)".r.findFirstMatchIn(name)
        .map("q" + _.group(1)).getOrElse(name)
      try {
        val df = graft.SparkEntry.queries(name)(spark, sfDir)
        // queryExecution.explainString — the same text explain() prints,
        // captured instead of dumped to stdout
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        Files.writeString(Paths.get(outDir, s"${short}_$suffix.txt"),
          s"== $name (sf=$sfDir, cpus=$cpus) ==\n" + txt)
        println(s"[explain] wrote $short"  + s"_$suffix.txt")
      } catch {
        case e: Throwable =>
          println(s"[explain] $name FAILED: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
