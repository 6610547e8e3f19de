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

    "q_set_except" -> """
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT
      SELECT s_nationkey AS nationkey FROM supplier
      ORDER BY nationkey""",
  )
}
