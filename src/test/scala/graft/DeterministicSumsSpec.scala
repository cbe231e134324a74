package graft

import graft.plans.DeterministicSums
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class DeterministicSumsSpec extends AnyFunSuite {
  lazy val spark = GraftSpark.spark
  import spark.implicits._

  test("plain double sums rewrite to decimal accumulation in the plan") {
    DeterministicSums.register(spark)
    val plan = Tables.transfers(spark, GraftSpark.Sf)
      .groupBy("contract_address").agg(sum("value").as("s"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("decimal(27,6)"), plan)
  }

  test("distinct double sums are NOT rewritten") {
    DeterministicSums.register(spark)
    val plan = Tables.transfers(spark, GraftSpark.Sf)
      .groupBy("contract_address").agg(sum_distinct(col("value")).as("s"))
      .queryExecution.optimizedPlan.toString
    assert(!plan.contains("decimal(27,6)"), plan)
  }

  test("rewritten sums are partition-count independent") {
    DeterministicSums.register(spark)
    val df = (1 to 20000).map(i => (i % 7, i * 0.0001 + 1e9)).toDF("k", "v")
    val a = df.repartition(1).groupBy("k").agg(sum("v").as("s"))
      .orderBy("k").as[(Int, Double)].collect().toSeq
    val b = df.repartition(17).groupBy("k").agg(sum("v").as("s"))
      .orderBy("k").as[(Int, Double)].collect().toSeq
    assert(a == b) // raw double accumulation would differ in the last ulp
  }

  test("GraftExtensions injects the rule at session build (no register call)") {
    // newSession() inherits the parent's spark.sql.extensions but starts
    // with an EMPTY experimental.extraOptimizations — if the rewrite still
    // fires, it came from the SparkSessionExtensions injection point.
    val fresh = spark.newSession()
    assert(fresh.experimental.extraOptimizations.isEmpty)
    val plan = Tables.transfers(fresh, GraftSpark.Sf)
      .groupBy("contract_address").agg(sum("value").as("s"))
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("decimal(27,6)"), plan)
    // and the injected function surface resolves in plain SQL
    assert(fresh.sql(
      s"SELECT ${graft.functions.HammingDistance.Name}('1010', '1001') AS d")
      .head().getInt(0) == 2)
    // wrong arity fails analysis, not with an index error from the builder
    intercept[org.apache.spark.sql.AnalysisException] {
      fresh.sql(s"SELECT ${graft.functions.HammingDistance.Name}('1010')")
        .collect()
    }
  }

  test("registration is idempotent") {
    DeterministicSums.register(spark)
    DeterministicSums.register(spark)
    assert(spark.experimental.extraOptimizations
      .count(_ eq DeterministicSums) == 1)
  }
}
