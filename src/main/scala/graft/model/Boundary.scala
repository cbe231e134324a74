package graft.model

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** Schema boundary for every source table: each loader asserts-and-coerces
  * its frame to a pinned `StructType` at read time, so a testdata re-encode
  * degrades to either a lossless cast or ONE clear error naming the table and
  * column — never a silent semantic change deep inside 80 downstream queries
  * (which is exactly what the TIMESTAMP(NANOS)→TIMESTAMP(MICROS,NTZ)
  * re-encode of `events.ts` caused before this guard existed).
  *
  * The reference engine gets the same protection implicitly from its
  * hand-written row decoders (reference: databases/Arango.scala:27-39 binds
  * each field by name and type); here the contract is explicit and the
  * enforcement is a single projected `select`, which Catalyst collapses into
  * the scan (identity projection when nothing drifted, so pushdown and
  * pruning are unaffected).
  *
  * `events.ts` is deliberately NOT pinned: its encoding legitimately varies
  * (epoch-nanos long vs TIMESTAMP vs TIMESTAMP_NTZ) and
  * [[graft.Tables.normalizeEventTime]] is its dedicated boundary — it
  * branches on the loaded type and fails loudly on anything unrecognized.
  */
object Boundary {

  /** Columns exempt from type pinning (still required to exist). */
  private val Flexible: Set[(String, String)] = Set(("events", "ts"))

  val Pinned: Map[String, StructType] = Map(
    "region" -> StructType(Seq(
      StructField("r_regionkey", IntegerType),
      StructField("r_name", StringType))),
    "nation" -> StructType(Seq(
      StructField("n_nationkey", IntegerType),
      StructField("n_name", StringType),
      StructField("n_regionkey", IntegerType))),
    "customer" -> StructType(Seq(
      StructField("c_custkey", LongType),
      StructField("c_name", StringType),
      StructField("c_nationkey", IntegerType),
      StructField("c_acctbal", DoubleType),
      StructField("c_mktsegment", StringType))),
    "supplier" -> StructType(Seq(
      StructField("s_suppkey", LongType),
      StructField("s_name", StringType),
      StructField("s_nationkey", IntegerType),
      StructField("s_acctbal", DoubleType))),
    "part" -> StructType(Seq(
      StructField("p_partkey", LongType),
      StructField("p_name", StringType),
      StructField("p_brand", StringType),
      StructField("p_type", StringType),
      StructField("p_size", IntegerType),
      StructField("p_retailprice", DoubleType))),
    "orders" -> StructType(Seq(
      StructField("o_orderkey", LongType),
      StructField("o_custkey", LongType),
      StructField("o_orderstatus", StringType),
      StructField("o_totalprice", DoubleType),
      StructField("o_orderdate", TimestampNTZType),
      StructField("o_orderpriority", StringType))),
    "lineitem" -> StructType(Seq(
      StructField("l_orderkey", LongType),
      StructField("l_partkey", LongType),
      StructField("l_suppkey", LongType),
      StructField("l_linenumber", IntegerType),
      StructField("l_quantity", DoubleType),
      StructField("l_extendedprice", DoubleType),
      StructField("l_discount", DoubleType),
      StructField("l_tax", DoubleType),
      StructField("l_returnflag", StringType),
      StructField("l_linestatus", StringType),
      StructField("l_shipdate", TimestampNTZType))),
    "events" -> StructType(Seq(
      StructField("event_id", LongType),
      StructField("ts", NullType), // placeholder; flexible — see Scaladoc
      StructField("user_id", LongType),
      StructField("event_type", StringType),
      StructField("value", DoubleType),
      StructField("props", StringType))),
    "documents" -> StructType(Seq(
      StructField("doc_id", LongType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("source", StringType),
      StructField("n_chars", LongType))),
    "embeddings" -> StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("label", IntegerType))))

  /** Assert-and-coerce `df` to the pinned schema of `name`. Unknown table
    * names pass through untouched (scratch reads). Missing columns and
    * un-castable drifts throw with the table+column named; castable drifts
    * coerce. Pinned column order is imposed, surplus columns are dropped —
    * the contract is the whole point. */
  def conform(name: String, df: DataFrame): DataFrame =
    Pinned.get(name) match {
      case None => df
      case Some(want) =>
        val have = df.schema.map(f => f.name -> f.dataType).toMap
        val missing = want.map(_.name).filterNot(have.contains)
        if (missing.nonEmpty)
          throw new IllegalStateException(
            s"schema boundary: table '$name' is missing column(s) " +
              s"${missing.mkString(", ")}; found ${df.schema.map(_.name).mkString(", ")}")
        val cols: Seq[Column] = want.map { f =>
          val actual = have(f.name)
          if (Flexible((name, f.name)) || actual == f.dataType) col(f.name)
          else if (org.apache.spark.sql.catalyst.expressions.Cast
              .canCast(actual, f.dataType))
            col(f.name).cast(f.dataType).as(f.name)
          else
            throw new IllegalStateException(
              s"schema boundary: table '$name' column '${f.name}' arrived as " +
                s"$actual which cannot cast to pinned ${f.dataType}")
        }
        df.select(cols: _*)
    }
}
