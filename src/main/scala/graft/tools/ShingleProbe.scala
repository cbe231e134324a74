package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Micro A/B for the `shingles_arr` spine layer (round-14): which part of
  * tokenize → 3-shingle transform → array_distinct costs the 5-6 s at
  * sf0.1? Each variant runs over the same documents scan with a noop-ish
  * aggregate so the shape difference is the expression work alone.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=... \
  *   sbt "runMain graft.tools.ShingleProbe"
  */
object ShingleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.shuffle.sort.bypassMergeThreshold", "4")
      .config("spark.sql.codegen.cache.maxEntries", "10000")
      .config("spark.sql.extensions", "graft.plans.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.Tables.documentsWide(spark, sfDir)
      .select(col("doc_id"), col("text"))
    base.persist().count() // pin the scan so variants time expressions only

    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      // warm once for codegen, then time 2 passes, report min
      df.write.format("noop").mode("overwrite").save()
      val secs = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[shingle] $label%-28s ${secs.min}%7.2f s")
    }

    val toks = "split(trim(text), '\\\\s+')"
    t("tokenize_only")(base.select(col("doc_id"),
      expr(s"size($toks)").as("n")))
    t("tok_materialized")(base.select(col("doc_id"),
      expr(toks).as("toks")))
    t("shingle_no_distinct")(base
      .withColumn("toks", expr(toks))
      .filter(expr("size(toks) >= 3"))
      .select(col("doc_id"), expr(
        """transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))""".stripMargin)
        .as("shs")))
    t("shingle_distinct(current)")(base
      .withColumn("toks", expr(toks))
      .filter(expr("size(toks) >= 3"))
      .select(col("doc_id"), expr(
        """array_distinct(transform(sequence(0, size(toks) - 3),
          |  i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))""".stripMargin)
        .as("shs")))
    // text stats for context
    base.select(count(lit(1)).as("docs"),
      sum(length(col("text"))).as("chars"),
      sum(size(split(trim(col("text")), "\\s+"))).as("toks")).show()
    spark.stop()
  }
}
