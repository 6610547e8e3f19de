package graft.ops

import org.apache.spark.sql.functions._
import Tables.{Q, t}

/** §2.1 Scans, sources, sinks — the identity-Mapper / counting-job
  * surface of the reference (SURVEY §2.1).
  *
  * Scale notes: both queries are scan-shaped. `q_scan_project` selects
  * 4 of lineitem's 11 columns behind a key predicate, so at 100 TB the
  * parquet reader prunes ~2/3 of the bytes (ReadSchema) and skips row
  * groups via min/max on l_orderkey (PushedFilters). `q_scan_count`
  * is pure parquet-footer metadata per table — no data bytes move.
  */
object Scans {

  val queries: Map[String, Q] = Map(
    // Projection + derived column + pushable key filter. The filter
    // and the 4-column ReadSchema both reach the parquet scan (plan-
    // shape asserted in ScansSpec). Per-row rounding of a 2-decimal
    // product lands on exact .xx5 ties, where Spark (shortest-repr
    // HALF_UP) and DuckDB (binary round) disagree — so round via
    // floor(x*100+0.5)/100, which is bit-identical IEEE math in both.
    "q_scan_project" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_orderkey" < 100)
        .select(
          $"l_orderkey", $"l_linenumber", $"l_quantity",
          (floor($"l_extendedprice" * (lit(1) - $"l_discount") * 100
            + 0.5) / 100).as("disc_price"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Row counts of all ten fixture tables in ONE lazy job: a global
    // count aggregate per table, unioned. count(*) resolves from
    // parquet footers; nothing is shuffled but ten 1-row partials.
    "q_scan_count" -> ((s, d) => {
      import s.implicits._
      Tables.names
        .map(n => t(s, d, n).agg(count(lit(1)).as("n"))
          .select(lit(n).as("tbl"), $"n"))
        .reduce(_.unionByName(_))
        .orderBy($"tbl")
    }),

    // The SQL front door: the TPC-H-Q3-shaped shipping-priority query
    // submitted as SQL TEXT through spark.sql over registered views —
    // every other declared query drives the DataFrame API; a user
    // porting a SQL workload needs this entry point to produce the
    // SAME Catalyst plans (it does: identical logical plan, same
    // broadcast-dim join strategy). The SQL text is shared with the
    // DuckDB oracle; on the Spark side only the table names are
    // rewritten to DIR-SCOPED temp-view names — temp views are
    // session-global mutable state, and plain names would let two
    // concurrent runs against different fixture dirs race.
    "q_sql_q3" -> ((s, d) => {
      // The tag is the SANITIZED FULL dir, not a 32-bit hash — hash
      // collisions would silently point two dirs' runs at one view.
      val tag = d.replaceAll("[^A-Za-z0-9_]", "_")
      val sql = Seq("customer", "orders", "lineitem").foldLeft(sqlQ3) {
        (acc, n) =>
          t(s, d, n).createOrReplaceTempView(s"graft_${n}_$tag")
          acc.replaceAll(s"\\b$n\\b", s"graft_${n}_$tag")
      }
      s.sql(sql)
    }),
  )

  /** Shared by the Spark query (modulo dir-scoped view names) and the
    * DuckDB oracle, which runs this text verbatim — both engines parse
    * the same query, so equivalence of the SQL surface is by
    * construction. Revenue uses the repo's tie-proof floor rounding
    * (SURVEY §2 determinism rules). */
  private val sqlQ3 = """
      SELECT o_orderkey,
             FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5) / 100
               AS revenue,
             o_orderdate
      FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-06-30 00:00:00'
        AND l_shipdate > TIMESTAMP '1996-06-30 00:00:00'
      GROUP BY o_orderkey, o_orderdate
      ORDER BY revenue DESC, o_orderkey
      LIMIT 10"""

  val oracle: Map[String, String] = Map(
    "q_scan_project" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
             FLOOR(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100
               AS disc_price
      FROM lineitem
      WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber""",

    "q_scan_count" -> Tables.names
      .map(n => s"SELECT '$n' AS tbl, count(*) AS n FROM $n")
      .mkString("SELECT tbl, n FROM (", " UNION ALL ", ") ORDER BY tbl"),

    "q_sql_q3" -> sqlQ3,
  )
}
