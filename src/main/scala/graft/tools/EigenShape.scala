package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev-only: print the partition widths feeding the eigenvector ladder. */
object EigenShape {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val g = graft.model.DerivedGraph(spark, sfDir)
    val sym = graft.model.DerivedGraph.undirected(g.edges)
      .select(col("a").as("src"), col("b").as("dst"))
    println(s"[shape] vertices parts=${g.vertices.rdd.getNumPartitions} rows=${g.vertices.count()}")
    println(s"[shape] edges    parts=${g.edges.rdd.getNumPartitions} rows=${g.edges.count()}")
    println(s"[shape] sym      parts=${sym.rdd.getNumPartitions} rows=${sym.count()}")
    val symCk = sym.localCheckpoint()
    println(s"[shape] sym ckpt parts=${symCk.rdd.getNumPartitions}")
    val prEd = g.edges.select("src", "dst")
    val prJoin = prEd.join(prEd.groupBy("src").agg(count(lit(1)).as("__outdeg")), "src").localCheckpoint()
    println(s"[shape] pr ed    parts=${prJoin.rdd.getNumPartitions}")
    spark.stop()
  }
}
