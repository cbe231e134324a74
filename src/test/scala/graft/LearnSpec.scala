package graft

import graft.ops.{Behavior, Dedup, Learn}
import org.scalatest.funsuite.AnyFunSuite

/** Oracle-independent brute-force recomputation of the learner/winnowing/
  * sequence-mining wave at sf0.001: each test re-derives the answer from
  * collected raw rows with plain Scala (independent md5, independent fold)
  * and demands exact agreement — the same style of first-principles check
  * the catalog's DuckDB gate does at sf0.01, minus the shared SQL dialect. */
class LearnSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def toks(text: String): Array[String] = text.trim.split("\\s+", -1)

  // ── decision stump ──

  test("decision stump: exact Gini argmin vs brute force over raw docs") {
    val docs = spark.read.parquet(s"${GraftSpark.Sf}/documents.parquet")
      .select("doc_id", "text", "lang", "n_chars")
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getLong(3)))
    val b = Learn.StumpBuckets
    val rows = docs.map { case (_, text, lang, nChars) =>
      val t = toks(text)
      val y = if (lang == Learn.StumpLang) 1L else 0L
      (y, Map(
        "n_toks" -> t.length.toLong,
        "n_chars" -> nChars,
        "max_tok" -> t.map(_.length.toLong).max,
        "n_uniq" -> t.distinct.length.toLong))
    }
    val expect = Seq("n_toks", "n_chars", "max_tok", "n_uniq").map { f =>
      val vs = rows.map { case (y, m) => (m(f), y) }
      val mn = vs.map(_._1).min
      val mx = vs.map(_._1).max
      val d = math.max(mx - mn + 1, 1L)
      val hist = vs.groupBy { case (v, _) => (v - mn) * b / d }
        .map { case (bk, g) => (bk, g.length.toLong, g.map(_._2).sum) }
        .toSeq.sortBy(_._1)
      val nn = hist.map(_._2).sum
      val nn1 = hist.map(_._3).sum
      var l = 0L; var l1 = 0L
      val splits = hist.flatMap { case (bk, n, n1) =>
        l += n; l1 += n1
        if (l < nn) {
          val r = nn - l; val r1 = nn1 - l1
          val gini = BigInt(l - l1) * l1 * 1000000 / l +
            BigInt(r - r1) * r1 * 1000000 / r
          Some((gini.toLong, bk, l, l1, r, r1))
        } else None
      }
      val best = splits.minBy(s => (s._1, s._2))
      val cut = mn + ((best._2 + 1) * d + b - 1) / b
      (f, cut, best._1, best._3, best._4, best._5, best._6,
        if (best._4 * 2 >= best._3) 1L else 0L,
        if (best._6 * 2 >= best._5) 1L else 0L)
    }.sortBy(s => (s._3, s._1))
    val got = Learn.decisionStump(spark, GraftSpark.Sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long, Long)]
      .collect().toSeq
    assert(got == expect)
  }

  // ── winnowing ──

  test("winnowing: fingerprint sets match a direct Scala recomputation") {
    val docs = spark.read.parquet(s"${GraftSpark.Sf}/documents.parquet")
      .select("doc_id", "text").as[(Long, String)].collect()
    val w = Dedup.WinnowW
    val expect = docs.flatMap { case (id, text) =>
      val t = toks(text)
      if (t.length < 3) Nil
      else {
        val grams = (0 to t.length - 3)
          .map(i => md5hex(s"${t(i)} ${t(i + 1)} ${t(i + 2)}"))
        val nWin = math.max(grams.length - (w - 1), 1)
        (0 until nWin).map(p => (id, grams.slice(p, p + w).min)).distinct
      }
    }.toSet
    val got = Dedup.winnowFingerprints(spark, GraftSpark.Sf)
      .as[(Long, String)].collect().toSet
    assert(got == expect)
  }

  test("winnowing guarantee: a shared W+2-word run yields a shared " +
    "fingerprint, and pair overlap is bounded by the smaller set") {
    val pairs = Dedup.winnowPairs(spark, GraftSpark.Sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    pairs.foreach { case (a, bId, shared, fa, fb, ppm) =>
      assert(a < bId)
      assert(shared <= math.min(fa, fb), s"pair ($a,$bId)")
      assert(ppm == shared * 1000000L / math.min(fa, fb))
    }
  }

  // ── sequential patterns ──

  test("gapped length-3 patterns: support matches brute-force enumeration") {
    val ev = graft.Tables.events(spark, GraftSpark.Sf)
      .select("user_id", "event_type", "ts", "event_id")
      .as[(Long, String, Long, Long)].collect()
    val byUser = ev.groupBy(_._1).map { case (u, g) =>
      u -> g.sortBy(e => (e._3, e._4)).take(Behavior.SeqPrefixLen)
        .map(_._2).toIndexedSeq
    }
    val support = byUser.values.flatMap { seq =>
      val n = seq.length
      (for {
        i <- 0 until n; j <- i + 1 until n; k <- j + 1 until n
      } yield s"${seq(i)}>${seq(j)}>${seq(k)}").distinct
    }.groupBy(identity).map { case (p, g) => (p, g.size.toLong) }
    val nUsers = byUser.size.toLong
    val expect = support.toSeq
      .map { case (p, s) => (p, s, s * 1000000L / nUsers) }
      .sortBy { case (p, s, _) => (-s, p) }
      .take(Behavior.SeqTopPatterns)
    val got = Behavior.seqPatterns(spark, GraftSpark.Sf)
      .as[(String, Long, Long)].collect().toSeq
    assert(got == expect)
  }

  // ── grid DBSCAN ──

  test("grid DBSCAN: cluster partition matches a sequential reference run") {
    val emb = spark.read.parquet(s"${GraftSpark.Sf}/embeddings.parquet")
      .select("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    def axis(v: Array[Float], j: Int): Long = {
      var acc = 0.0
      var i = 0
      while (i < v.length) {
        val sgn =
          if ("02468ace".contains(md5hex(s"${i}_$j").charAt(0))) 1.0 else -1.0
        acc += v(i).toDouble * sgn
        i += 1
      }
      math.floor(acc / Learn.DbscanEps).toLong
    }
    val pts = emb.map { case (id, v) => (id, (axis(v, 8), axis(v, 9))) }
    val cellN = pts.groupBy(_._2).map { case (c, g) => c -> g.length.toLong }
    def nbrs(c: (Long, Long)): Seq[(Long, Long)] =
      for (dx <- -1L to 1L; dy <- -1L to 1L) yield (c._1 + dx, c._2 + dy)
    val core = cellN.keySet.filter(c =>
      nbrs(c).map(n => cellN.getOrElse(n, 0L)).sum >= Learn.DbscanMinPts)
    // sequential union-find over core-cell adjacency
    val parent = scala.collection.mutable.Map(core.toSeq.map(c => c -> c): _*)
    def find(c: (Long, Long)): (Long, Long) =
      if (parent(c) == c) c else { val r = find(parent(c)); parent(c) = r; r }
    for (c <- core; n <- nbrs(c) if n != c && core(n)) {
      val (ra, rb) = (find(c), find(n))
      if (ra != rb) parent(if (ra._1 < rb._1 || (ra._1 == rb._1 && ra._2 < rb._2)) rb else ra) =
        if (ra._1 < rb._1 || (ra._1 == rb._1 && ra._2 < rb._2)) ra else rb
    }
    val assign = pts.map { case (id, c) =>
      val own = if (core(c)) Some(find(c)) else None
      val border = nbrs(c).filter(n => n != c && core(n))
        .map(find).sortBy(identity).headOption
      (id, own.orElse(border).isDefined, own.isDefined,
        own.orElse(border))
    }
    // expected partition: vec_ids grouped by component root (None = noise)
    val expectGroups = assign.groupBy(_._4)
      .map { case (root, g) => (root.isEmpty, g.map(_._1).toSet) }
    val expectNoise = expectGroups.collectFirst {
      case (true, s) => s
    }.getOrElse(Set.empty[Long])
    val expectClusters = assign.filter(_._4.isDefined)
      .groupBy(_._4.get).values.map(_.map(_._1).toSet).toSet
    val nCorePts = assign.count(_._3)

    val got = Learn.dbscanGrid(spark, GraftSpark.Sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == emb.length, "every point classified once")
    assert(got.map(_._3).sum == nCorePts)
    val gotNoise = got.filter(_._1 == -1L)
    assert(gotNoise.map(_._2).sum == expectNoise.size.toLong)
    // cluster sizes as a multiset must match the reference partition
    val gotSizes = got.filter(_._1 != -1L).map(_._2).sorted.toSeq
    val expSizes = expectClusters.toSeq.map(_.size.toLong).sorted
    assert(gotSizes == expSizes)
  }
}
