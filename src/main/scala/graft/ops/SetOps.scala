package graft.ops

import org.apache.spark.sql.functions._
import Tables.{Q, t}

/** §2.6 Sort / limit / top-k / set operations — the reference's
  * total-order-sort (TeraSort pattern), single-reducer top-k, and
  * multi-input job surface (SURVEY §2.6).
  *
  * Scale notes: global sort+limit plans as TakeOrderedAndProject —
  * per-partition top-k then a k-row merge on the driver, never a full
  * RangePartitioning sort (plan-shape asserted in tests). Set ops
  * shuffle once on the full row as key, same as a distinct.
  */
object SetOps {

  val queries: Map[String, Q] = Map(
    "q_sort_multi" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .select($"o_orderkey", $"o_orderpriority", $"o_totalprice")
        .orderBy($"o_orderpriority".asc, $"o_totalprice".desc,
                 $"o_orderkey".asc)
        .limit(100)
    }),

    "q_topk_global" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_extendedprice")
        .orderBy($"l_extendedprice".desc, $"l_orderkey", $"l_linenumber")
        .limit(10)
    }),

    // UNION ALL then UNION DISTINCT of (nationkey, kind) pairs from
    // two different sides — kind disambiguates provenance so the
    // distinct actually has work to do.
    "q_set_union" -> ((s, d) => {
      import s.implicits._
      val sup = t(s, d, "supplier")
        .select($"s_nationkey".cast("int").as("nationkey"),
                lit("sup").as("kind"))
      val cust = t(s, d, "customer")
        .select($"c_nationkey".cast("int").as("nationkey"),
                lit("cust").as("kind"))
      sup.unionByName(cust).distinct()
        .orderBy($"nationkey", $"kind")
    }),

    "q_set_intersect" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".cast("int").as("nationkey"))
        .intersect(
          t(s, d, "supplier").select($"s_nationkey".cast("int").as("nationkey")))
        .orderBy($"nationkey")
    }),

    "q_set_except" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select($"c_nationkey".cast("int").as("nationkey"))
        .except(
          t(s, d, "supplier").select($"s_nationkey".cast("int").as("nationkey")))
        .orderBy($"nationkey")
    }),

    // BAG-semantics set ops (EXCEPT ALL / INTERSECT ALL) — the
    // multiplicity-aware variants the DISTINCT forms above can't
    // express: per value, except-all keeps max(n_a − n_b, 0) copies
    // and intersect-all min(n_a, n_b) — the reconciliation algebra for
    // "which rows of feed A are NOT covered by feed B, counting
    // duplicates". Both plan as a keyed count-diff aggregate (one
    // shuffle on the value), not a join; rolled up per priority so the
    // multiset is observable as exact counts.
    "q_set_bag" -> ((s, d) => {
      import s.implicits._
      val a = t(s, d, "orders").where($"o_totalprice" > 200000)
        .select($"o_orderpriority".as("priority"))
      val b = t(s, d, "orders").where($"o_orderstatus" === "F")
        .select($"o_orderpriority".as("priority"))
      val ex = a.exceptAll(b).groupBy($"priority")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("except_all"))
      val in = a.intersectAll(b).groupBy($"priority")
        .agg(count(lit(1)).as("n")).withColumn("op", lit("intersect_all"))
      ex.unionByName(in).select($"op", $"priority", $"n")
        .orderBy($"op", $"priority")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_sort_multi" -> """
      SELECT o_orderkey, o_orderpriority, o_totalprice
      FROM orders
      ORDER BY o_orderpriority ASC, o_totalprice DESC, o_orderkey ASC
      LIMIT 100""",

    "q_topk_global" -> """
      SELECT l_orderkey, l_linenumber, l_extendedprice
      FROM lineitem
      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber
      LIMIT 10""",

    "q_set_union" -> """
      SELECT nationkey, kind FROM (
        SELECT s_nationkey AS nationkey, 'sup' AS kind FROM supplier
        UNION
        SELECT c_nationkey AS nationkey, 'cust' AS kind FROM customer
      ) ORDER BY nationkey, kind""",

    "q_set_intersect" -> """
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT
      SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey""",

    "q_set_bag" -> """
      WITH a AS (SELECT o_orderpriority AS priority FROM orders
                 WHERE o_totalprice > 200000),
           b AS (SELECT o_orderpriority AS priority FROM orders
                 WHERE o_orderstatus = 'F')
      SELECT 'except_all' AS op, priority, count(*) AS n
      FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
      GROUP BY priority
      UNION ALL
      SELECT 'intersect_all' AS op, priority, count(*) AS n
      FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
      GROUP BY priority
      ORDER BY op, priority""",

    "q_set_except" -> """
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey""",
  )
}
