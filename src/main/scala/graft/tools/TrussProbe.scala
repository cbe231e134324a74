package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col
import graft.ops.{Graph, Wallet}

/** Dev-only stage timer for the k-truss peel: times the truss at a given
  * round budget so enumeration cost vs per-round maintenance cost can be
  * separated (rounds=0 ≈ enumerate+initial support; deltas are per-round).
  * Not part of the catalog; run by hand while tuning. */
object TrussProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val edges = graft.Tables.transfers(spark, sfDir)
      .select(col("from_address").as("src"), col("to_address").as("dst"))
    edges.count() // pay the scan once
    import org.apache.spark.sql.functions._
    val t0 = System.nanoTime()
    val und = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b")).distinct()
    println(f"und=${und.count()}%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    val t1 = System.nanoTime()
    val deg = und.select(col("a").as("v"))
      .unionByName(und.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("d"))
    val aFirst = col("da") < col("db") ||
      (col("da") === col("db") && col("a") < col("b"))
    val oriented = und
      .join(deg.select(col("v").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("v").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(aFirst, col("a")).otherwise(col("b")).as("src"),
        when(aFirst, col("b")).otherwise(col("a")).as("dst"))
    val tri = oriented.select(col("src").as("u"), col("dst").as("v"))
      .join(oriented.select(col("src").as("u"), col("dst").as("w")), Seq("u"))
      .filter(col("v") =!= col("w"))
      .join(oriented.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    println(f"tri=${tri.count()}%d sec=${(System.nanoTime() - t1) / 1e9}%.2f")
    val t2 = System.nanoTime()
    val orientedC = oriented.localCheckpoint(true)
    println(f"orientedCut sec=${(System.nanoTime() - t2) / 1e9}%.2f")
    val t3 = System.nanoTime()
    val wedges = orientedC.select(col("src").as("u"), col("dst").as("v"))
      .join(orientedC.select(col("src").as("u"), col("dst").as("w")), Seq("u"))
      .filter(col("v") < col("w"))
    println(f"wedges=${wedges.count()}%d sec=${(System.nanoTime() - t3) / 1e9}%.2f")
    val t4 = System.nanoTime()
    val tri2 = wedges.join(orientedC.select(col("src").as("v"), col("dst").as("w")), Seq("v", "w"))
    println(f"tri2=${tri2.count()}%d sec=${(System.nanoTime() - t4) / 1e9}%.2f")
    for (r <- Seq(0, 1, 2, 4, 4)) {
      val t0 = System.nanoTime()
      val n = Graph.kTruss(edges, Wallet.KTrussK, r).count()
      println(f"rounds=$r%d rows=$n%d sec=${(System.nanoTime() - t0) / 1e9}%.2f")
    }
    spark.stop()
  }
}
