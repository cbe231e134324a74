package graft

import graft.sources.CsvIntake
import org.scalatest.funsuite.AnyFunSuite

/** CSV intake: clean rows round-trip exactly, bad rows quarantine, and the
  * quarantine captures each failure class without poisoning clean files. */
class CsvIntakeSpec extends AnyFunSuite {
  private lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("clean rows round-trip the parquet table exactly") {
    val back = CsvIntake.docsRoundTrip(spark, GraftSpark.Sf)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val orig = Tables.documents(spark, GraftSpark.Sf).orderBy("doc_id")
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(back == orig)
  }

  test("quarantine captures type, arity, and quoting failures") {
    val drop = CsvIntake.stage(spark, GraftSpark.Sf)
    val quar = CsvIntake.quarantine(spark, drop)
      .as[String].collect().toSeq
    // type-fail doc_id, type-fail n_chars, arity-low, broken-quote = 4
    // raw lines (the broken quote swallows only itself — it is last in its
    // file, so clean rows are never absorbed)
    assert(quar.size == 4, quar.mkString("\n"))
    assert(quar.exists(_.startsWith("not_a_number,")), quar.toString)
    assert(quar.exists(_.startsWith("456,")), quar.toString)
    assert(quar.exists(_.startsWith("12,13")), quar.toString)
    assert(quar.exists(_.contains("unterminated")), quar.toString)
    // quarantine and clean split the parse exactly: no row lost
    val total = CsvIntake.parsed(spark, drop).count()
    val clean = CsvIntake.cleaned(spark, drop).count()
    assert(total == clean + quar.size)
  }
}
