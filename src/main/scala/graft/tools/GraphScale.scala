package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale rehearsal for the iterative graph family: synthetic power-law-ish
  * link graph (each of `n` pages emits 1-8 outlinks to xxhash-scattered
  * targets, plus a hub that everyone links — the web's shape), then
  * `iters` PageRank rounds with wall + shuffle measured per run.
  *
  * Usage: tools/run.sh graft.tools.GraphScale [nEdges] [iters]
  */
object GraphScale {
  def main(args: Array[String]): Unit = {
    val nEdges = if (args.length > 0) args(0).toLong else 5000000L
    val iters = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .withExtensions(new graft.functions.expressions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val telemetry = new graft.ShuffleTelemetry
    telemetry.install(spark.sparkContext)

    // ~nEdges edges over ~nEdges/4 nodes; 10% of edges point at node 0
    // (the mega-hub), targets otherwise xxhash-scattered
    val nNodes = math.max(nEdges / 4, 10L)
    val edges = spark.range(nEdges).select(
        pmod(xxhash64(col("id")), lit(nNodes)).as("src"),
        when(pmod(col("id"), lit(10)) === 0, lit(0L))
          .otherwise(pmod(xxhash64(col("id") + 1), lit(nNodes))).as("dst"))
      .where(col("src") =!= col("dst"))
      .localCheckpoint(true)
    println(s"[graph-scale] edges=${edges.count()} nodes~$nNodes iters=$iters")
    val (r0, w0) = telemetry.now()
    val t0 = System.nanoTime()
    val ranks = graft.operators.GraphRank.pageRank(
      edges, "src", "dst", iters)
    val top = ranks.orderBy(col("rank_ppm").desc).limit(3)
      .collect().map(r => s"${r.getLong(0)}:${r.getLong(1)}").mkString(" ")
    val n = ranks.count()
    val dt = (System.nanoTime() - t0) / 1e9
    val (r1, w1) = telemetry.now()
    println(f"[graph-scale] pageRank($iters): $dt%.2f s  nodes=$n  " +
      f"shuffleW=${(w1 - w0) / 1e6}%.1f MB  shuffleR=${(r1 - r0) / 1e6}%.1f MB  top3=$top")
    spark.stop()
  }
}
