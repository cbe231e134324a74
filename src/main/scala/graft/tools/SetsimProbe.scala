package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.{Dedup, TextAnalysis}

/** Dev-only stage timer for the PPJoin set-similarity join: separates the
  * per-document frame build, the prefix candidate generation, and the
  * verification join so tuning targets the real cost. Not in the catalog. */
object SetsimProbe {
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
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%s sec=${(System.nanoTime() - t0) / 1e9}%.2f")
      r
    }
    timed("shingles")(TextAnalysis.shingles(spark, sfDir).count())
    val sh = TextAnalysis.shingles(spark, sfDir)
    timed("dfCounts")(sh.groupBy("sh").agg(count(lit(1)).as("df")).count())
    val dfCounts = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    val byRank = sh.join(dfCounts, "sh")
      .groupBy("doc_id")
      .agg(sort_array(collect_list(struct(col("df"), col("sh")))).as("arr"))
      .select(col("doc_id"),
        expr("transform(arr, x -> x.sh)").as("ss"),
        size(col("arr")).cast("long").as("n"))
      .withColumn("p", col("n") -
        expr(s"(n * ${Dedup.SetSimTauNum} + ${Dedup.SetSimTauDen} - 1) div ${Dedup.SetSimTauDen}") + 1)
    val byRankC = timed("byRank+cut")(byRank.localCheckpoint(true))
    // the shipped pipeline's pair expansion WITH the PPJoin length filter
    // folded in (min·(den+num) ≥ num·(n_a+n_b)); the unfiltered count is
    // printed alongside to show the filter's kill rate
    val candsNoLen = byRankC
      .select(col("doc_id"), explode(expr("slice(ss, 1, p)")).as("sh"))
      .groupBy("sh")
      .agg(sort_array(collect_list(col("doc_id"))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        """flatten(transform(ds,
          |  (x, i) -> transform(slice(ds, i + 2, size(ds)),
          |            y -> struct(x AS doc_a, y AS doc_b))))""".stripMargin))
        .as("p"))
      .select("p.doc_a", "p.doc_b")
    timed("cands-raw-nolen")(println("  raw_nolen=" + candsNoLen.count()))
    val cands = byRankC
      .select(col("doc_id"), col("n"), explode(expr("slice(ss, 1, p)")).as("sh"))
      .groupBy("sh")
      .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
      .filter(size(col("ds")) > 1)
      .select(explode(expr(
        s"""flatten(transform(ds,
           |  (x, i) -> filter(
           |    transform(slice(ds, i + 2, size(ds)),
           |      y -> struct(x.doc_id AS doc_a, x.n AS n_a,
           |                  y.doc_id AS doc_b, y.n AS n_b)),
           |    s -> least(s.n_a, s.n_b) * ${Dedup.SetSimTauDen + Dedup.SetSimTauNum}
           |           >= ${Dedup.SetSimTauNum} * (s.n_a + s.n_b))))""".stripMargin))
        .as("p"))
      .select("p.doc_a", "p.n_a", "p.doc_b", "p.n_b")
    timed("cands-raw")(println("  raw=" + cands.count()))
    val candsD = cands.distinct()
    val candsC = timed("cands-distinct+cut")(candsD.localCheckpoint(true))
    println("  distinct=" + candsC.count())
    timed("verify") {
      candsC
        .join(byRankC.select(col("doc_id").as("doc_a"), col("ss").as("sa")),
          "doc_a")
        .join(byRankC.select(col("doc_id").as("doc_b"), col("ss").as("sb")),
          "doc_b")
        .withColumn("inter",
          size(array_intersect(col("sa"), col("sb"))).cast("long"))
        .filter(col("inter") * Dedup.SetSimTauDen >=
          lit(Dedup.SetSimTauNum) * (col("n_a") + col("n_b") - col("inter")))
        .count()
    }
    timed("full-setSimJoin")(Dedup.setSimJoin(spark, sfDir).count())
    timed("full-setSimJoin2")(Dedup.setSimJoin(spark, sfDir).count())
    spark.stop()
  }
}
