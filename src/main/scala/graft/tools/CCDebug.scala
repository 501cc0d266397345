package graft.tools

import org.apache.spark.sql.SparkSession

object CCDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L)).toDF("id_1", "id_2")
    val t0 = System.nanoTime()
    val out = graft.operators.Dedup.clusterPairs(pairs).collect()
    println(s"done in ${(System.nanoTime() - t0) / 1e9}s: ${out.mkString(",")}")
    spark.stop()
  }
}
