package graft

/** DuckDB oracle SQL fragments shared by [[SparkEntry.oracleSql]].
  *
  * Every fragment mirrors, in ANSI-ish DuckDB SQL, a deterministic view the
  * Spark side builds in code, so both engines compute byte-identical results
  * on the same parquet inputs. Two portability rules applied throughout:
  *
  *  - double aggregation goes through DECIMAL so the sum is exact and
  *    independent of partial-aggregation order (Spark sums per partition,
  *    DuckDB in scan order; raw double sums would differ in the last ulp):
  *    `CAST(SUM(CAST(x AS DECIMAL(p,s))) AS DOUBLE)`.
  *  - epoch math uses `floor(epoch(ts))` (DuckDB `epoch` keeps fractional
  *    seconds; Spark's `unix_timestamp` truncates).
  */
object Oracle {

  /** The transfers view over `events` — same arithmetic as
    * [[Tables.transfers]]. */
  val transfersCte: String =
    """transfers AS (
      |  SELECT
      |    CAST(user_id AS VARCHAR) AS from_address,
      |    CAST((user_id * 7 + event_id) % 1000 AS VARCHAR) AS to_address,
      |    event_type AS contract_address,
      |    event_id AS block_number,
      |    event_id % 100 AS log_index,
      |    value,
      |    epoch_ns(ts) // 1000000000 AS transact_at
      |  FROM events
      |)""".stripMargin

  /** The literal dapp registry — same rows as [[Tables.DappRegistry]]. */
  val dappsCte: String = {
    val rows = Tables.DappRegistry.map { case (id, name, addrs) =>
      s"('$id', '$name', [${addrs.map(a => s"'$a'").mkString(", ")}])"
    }.mkString(",\n    ")
    s"""dapps AS (
       |  SELECT * FROM (VALUES
       |    $rows
       |  ) AS t(dapp_id, dapp_name, addresses)
       |)""".stripMargin
  }

  /** Prefix a query with the shared transfers CTE. */
  def withTransfers(sql: String): String =
    s"WITH $transfersCte\n$sql"

  def withTransfersAndDapps(sql: String): String =
    s"WITH $transfersCte,\n$dappsCte\n$sql"

  /** Double-entry legs + hourly net deltas for one token — mirror of
    * [[graft.ops.Balances.hourlyDeltas]]. Prepend after [[transfersCte]]. */
  def balanceCtes(token: String): String =
    s"""legs AS (
       |  SELECT from_address AS address, ${hourBucket("transact_at")} AS t,
       |         -value AS delta
       |  FROM transfers WHERE contract_address = '$token'
       |  UNION ALL
       |  SELECT to_address AS address, ${hourBucket("transact_at")} AS t,
       |         value AS delta
       |  FROM transfers WHERE contract_address = '$token'
       |),
       |hourly AS (
       |  SELECT address, t, SUM(CAST(delta AS DECIMAL(25,2))) AS ddelta
       |  FROM legs GROUP BY 1, 2
       |),
       |bal AS (
       |  SELECT address, t, CAST(ddelta AS DOUBLE) AS delta,
       |         CAST(SUM(ddelta) OVER (PARTITION BY address ORDER BY t
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
       |           AS balance
       |  FROM hourly
       |)""".stripMargin

  def withBalances(token: String, sql: String): String =
    s"WITH $transfersCte,\n${balanceCtes(token)}\n$sql"

  /** Exact decimal sum rendered back as DOUBLE — mirror of
    * [[graft.ops.Num.dsum]]. */
  def dsum(expr: String, scale: Int = 2): String =
    s"CAST(SUM(CAST($expr AS DECIMAL(25,$scale))) AS DOUBLE)"

  /** Tokenized documents — mirror of [[graft.ops.TextAnalysis]]'s `toks`. */
  val docsCte: String =
    """docs AS (
      |  SELECT doc_id, text, lang, source,
      |         string_split_regex(trim(text), '\s+') AS toks
      |  FROM documents
      |)""".stripMargin

  /** Distinct 3-word shingles — mirror of
    * [[graft.ops.TextAnalysis.shingles]] (DuckDB lists are 1-based; Spark
    * arrays 0-based — both enumerate len-2 windows). */
  val shinglesCte: String =
    """shingles AS (
      |  SELECT doc_id, unnest(list_distinct(list_transform(
      |    range(1, len(toks) - 1),
      |    i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2])))) AS sh
      |  FROM docs WHERE len(toks) >= 3
      |)""".stripMargin

  def withDocs(sql: String): String = s"WITH $docsCte\n$sql"
  def withShingles(sql: String): String = s"WITH $docsCte,\n$shinglesCte\n$sql"

  /** Marker-hit count for one language — mirror of
    * [[graft.ops.TextAnalysis.LangMarkers]]. */
  def markerCount(lang: String): String = {
    val list = graft.ops.TextAnalysis.LangMarkers.toMap.apply(lang)
      .map(w => s"'$w'").mkString(", ")
    s"CAST(len(list_filter(toks, x -> x IN ($list))) AS BIGINT)"
  }

  /** Embedding components with 0-based dim index, as doubles — mirror of the
    * Spark `posexplode` over the double-cast embedding array. */
  val embIdxCte: String =
    """idx AS (
      |  SELECT e.vec_id, t.i - 1 AS i, CAST(e.embedding[t.i] AS DOUBLE) AS x
      |  FROM embeddings e, unnest(range(1, len(e.embedding) + 1)) AS t(i)
      |)""".stripMargin

  /** DuckDB mirror of Spark's `CAST(conv(substr(<hex>, 1, 12), 16, 10) AS
    * BIGINT)` — the 48-bit numeric prefix of an md5 hex string, spelled as
    * a 12-nibble positional sum (DuckDB has no base-conversion builtin). */
  def hex48(e: String): String =
    (1 to 12).map { i =>
      val w = math.pow(16, 12 - i).toLong
      s"(instr('0123456789abcdef', substr($e, $i, 1)) - 1) * $w"
    }.mkString("(", " + ", ")")

  /** Hour bucket on epoch seconds — mirror of [[graft.ops.Num.hourBucket]]. */
  def hourBucket(expr: String): String =
    s"CAST(floor($expr / 3600) AS BIGINT) * 3600"

  def dayBucket(expr: String): String =
    s"CAST(floor($expr / 86400) AS BIGINT) * 86400"
}
