package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.ops.Dedup

/** Posture evidence for the bands-from-log(corpus) rule
  * ([[Dedup.simhash64BandLayout]]): for an sfDir (normally ScaleGen
  * documents-only corpora bracketing the ~524 k-doc switchover), print
  * the doc count, the layout the rule selects, and — for BOTH 64-bit
  * certificate layouts — the exact candidate-pair count the banded join
  * would generate (Σ C(occupancy, 2) over buckets, the same quantity
  * [[Dedup.simhashBandCost]] certifies). Then time the auto-selected
  * pair join itself with the stage-listener shuffle tally.
  *
  * The claim this makes falsifiable: past the switchover the pinned 4×16
  * layout's candidates grow ~quadratically while the selected 2×32
  * layout's stay ~linear in the corpus — i.e. the rule picks the row the
  * certificate says it should.
  *
  * Usage: runMain graft.tools.SimhashBandProbe <sfDir> [skipJoin]
  */
object SimhashBandProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val skipJoin = args.length > 1 && args(1) == "skipJoin"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val tally = new PostureCheck.ShuffleTally
    spark.sparkContext.addSparkListener(tally)

    val nDocs = graft.Tables.documents(spark, sfDir).count()
    val sel = Dedup.simhash64BandLayout(nDocs)
    println(s"[bandprobe] sfDir=$sfDir n_docs=$nDocs " +
      s"selected=(bands=${sel._1},bits=${sel._2},radius=${sel._3})")

    // one WIDEST signature frame prices every layout (the 64-bit
    // fingerprint is the 128-bit prefix, band substrings are
    // layout-independent)
    val sigs = Dedup.simhash128(spark, sfDir)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // stage-audited: the signature build is the dominant linear cost of
    // the family — its task layout (is the tokenize+md5 map parallel?)
    // is the first thing to check when this number moves
    new StageAudit(spark).timed("sig_build")(sigs.count())
    for ((nb, bb) <- Seq((4, 16), (2, 32), (4, 32))) {
      val t0 = System.nanoTime()
      val cands = sigs
        .select(col("doc_id"),
          explode(sequence(lit(0), lit(nb - 1))).as("band"),
          col("simhash"))
        .withColumn("bits", expr(s"substr(simhash, band * $bb + 1, $bb)"))
        .groupBy("band", "bits").agg(count(lit(1)).as("n"))
        .agg(sum(expr("n * (n - 1) div 2")).as("c"))
        .head().getLong(0)
      println(f"[bandprobe] layout=${nb}x$bb(fp=${nb * bb}) " +
        f"candidates=$cands%d cand_per_doc=${cands.toDouble / nDocs}%.2f " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f")
    }

    if (!skipJoin) {
      tally.reset()
      val t0 = System.nanoTime()
      val pairs = Dedup.simhashPairs64(spark, sfDir).count()
      println(f"[bandprobe] auto pair join (64-bit rule): rows=$pairs%d " +
        f"sec=${(System.nanoTime() - t0) / 1e9}%.1f " +
        f"shuffle_rw_mb=${(tally.shuffleRead + tally.shuffleWrite) / 1e6}%.0f")
      tally.reset()
      val t1 = System.nanoTime()
      val pairs128 = Dedup.simhashPairs128(spark, sfDir).count()
      println(f"[bandprobe] radius-3 128-bit pair join: rows=$pairs128%d " +
        f"sec=${(System.nanoTime() - t1) / 1e9}%.1f " +
        f"shuffle_rw_mb=${(tally.shuffleRead + tally.shuffleWrite) / 1e6}%.0f")
    }
    spark.stop()
  }
}
