package graft.ops

import org.apache.spark.sql.functions._
import Tables.{Q, t}

/** §2.2 Projection, filter, scalar expressions — the Mapper-side
  * record-munging surface of the reference (SURVEY §2.2).
  *
  * Everything here is a built-in Catalyst expression (codegen'd,
  * whole-stage fused); the one Scala UDF (`q_udf_scalar`) is the
  * contract's custom-Mapper row, kept trivially simple so the oracle
  * can re-express it in SQL. All queries are embarrassingly parallel
  * scan→project→sort pipelines — no shuffle except the final order.
  */
object Exprs {

  val queries: Map[String, Q] = Map(
    // The MAP-typed column surface: per-user event-type histogram AS A
    // MAP (map_from_entries over a sorted entry list, so key order is
    // deterministic), then map accessors — size, element_at (NULL on a
    // missing key, the map's point lookup), map_keys. Maps are how
    // sparse per-entity features ship to training (feature name →
    // value) without a column per feature; building one is a plain
    // partial-aggregable count + one collect per entity, and the map
    // functions are all codegen'd row-local expressions — nothing here
    // shuffles beyond the two keyed aggs. The oracle reproduces the
    // lookups relationally (MAX over CASE), proving the map semantics,
    // not the representation.
    "q_expr_map" -> ((s, d) => {
      import s.implicits._
      t(s, d, "events")
        .groupBy($"user_id", $"event_type").agg(count(lit(1)).as("n"))
        .groupBy($"user_id")
        .agg(map_from_entries(
          sort_array(collect_list(struct($"event_type", $"n")))).as("m"))
        .select($"user_id",
          size($"m").as("n_types"),
          element_at($"m", "click").as("clicks"),
          element_at($"m", "purchase").as("purchases"),
          array_join(map_keys($"m"), ",").as("types"))
        .orderBy($"user_id")
    }),

    // Conjunctive pushable predicates: timestamp range + IN + numeric
    // + prefix LIKE, all of which reach the parquet reader as
    // PushedFilters (row-group min/max + dictionary skipping at scale).
    "q_filter_pred" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter(
          $"l_shipdate".between(
            lit("1996-01-01").cast("timestamp"),
            lit("1997-12-31").cast("timestamp"))
            && $"l_returnflag".isin("A", "R")
            && $"l_quantity" > 25
            && $"l_linestatus".like("F%"))
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
                $"l_returnflag", $"l_linestatus", $"l_shipdate")
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // Regex grep (distributed-grep pattern). rlike is partial-match,
    // same as DuckDB regexp_matches.
    "q_filter_regex" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .filter($"p_name".rlike("(?i)(ring|widget)"))
        .select($"p_partkey", $"p_name", $"p_type")
        .orderBy($"p_partkey")
    }),

    "q_expr_string" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").select(
        $"c_custkey",
        lower($"c_name").as("lo"),
        upper($"c_mktsegment").as("up"),
        substring($"c_name", 1, 8).as("sub8"),
        length($"c_name").cast("long").as("len"),
        concat_ws("-", $"c_mktsegment", $"c_name").as("cat"),
        regexp_replace($"c_name", "Customer#", "C").as("repl"),
        lpad($"c_custkey".cast("string"), 12, "0").as("pad"))
        .orderBy($"c_custkey")
    }),

    // Spark dayofweek is 1=Sunday; DuckDB's is 0=Sunday — oracle adds 1.
    "q_expr_date" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders").select(
        $"o_orderkey",
        year($"o_orderdate").as("y"),
        month($"o_orderdate").as("m"),
        dayofmonth($"o_orderdate").as("dom"),
        date_trunc("month", $"o_orderdate").as("mon_start"),
        datediff(lit("2000-01-01").cast("date"), $"o_orderdate")
          .as("days_to_y2k"),
        last_day($"o_orderdate").as("eom"),
        dayofweek($"o_orderdate").as("dow"))
        .orderBy($"o_orderkey")
    }),

    // sqrt/ln args are strictly positive (prices >= 900); l_quantity is
    // integral 1..50 so the mod is computed on BIGINT in both engines.
    "q_expr_math" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .filter($"l_orderkey" < 500)
        .select(
          $"l_orderkey", $"l_linenumber",
          round(abs($"l_discount" - 0.05), 2).as("abs_d"),
          ceil($"l_quantity").as("ceil_q"),
          floor($"l_quantity").as("floor_q"),
          round(sqrt($"l_extendedprice"), 4).as("sqrt_p"),
          round(log(lit(1) + $"l_extendedprice"), 4).as("ln_p"),
          round(pow($"l_quantity", 2), 2).as("pow_q"),
          ($"l_quantity".cast("long") % 7).as("mod_q"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    "q_expr_case" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders").select(
        $"o_orderkey",
        when($"o_totalprice" < 100000, "low")
          .when($"o_totalprice" < 300000, "mid")
          .otherwise("high").as("bucket"),
        coalesce(nullif($"o_orderstatus", lit("P")), lit("X")).as("st"))
        .orderBy($"o_orderkey")
    }),

    "q_expr_json" -> ((s, d) => {
      import s.implicits._
      t(s, d, "events")
        .select($"event_id",
                get_json_object($"props", "$.k").cast("long").as("k"))
        .filter($"k" >= 50)
        .orderBy($"event_id")
    }),

    // Float components are widened to DOUBLE before any arithmetic in
    // BOTH engines (exact widening) — SURVEY §2 determinism rule 5.
    "q_expr_array" -> ((s, d) => {
      import s.implicits._
      t(s, d, "embeddings").select(
        $"vec_id",
        size($"embedding").as("dim"),
        // floor form, not ROUND: embedding components sit exactly on
        // .xxxx5 ties at larger SFs, where Spark's HALF_UP and
        // DuckDB's rounding disagree; identical double arithmetic on
        // both sides is tie-proof (same trick as q_win_frame_rows).
        (floor(element_at($"embedding", 1).cast("double") * 10000 + 0.5)
          / 10000).as("first_val"),
        round(sqrt(aggregate($"embedding", lit(0.0),
          (acc, x) => acc + x.cast("double") * x.cast("double"))), 4)
          .as("l2norm"))
        .orderBy($"vec_id")
    }),

    // The custom-Mapper surface: a Scala UDF registered with the
    // Bitwise surface: and/or/xor, shifts, popcount — the bit-packing
    // toolkit flag fields and bloom/bitmap structures are built from.
    // All codegen'd integer ops, embarrassingly parallel.
    "q_expr_bitwise" -> ((s, d) => {
      import s.implicits._
      t(s, d, "events").where($"event_id" < 500)
        .select($"event_id",
          $"event_id".bitwiseAND(255).as("lo"),
          $"event_id".bitwiseOR(16).as("or16"),
          $"event_id".bitwiseXOR($"user_id").as("x"),
          shiftleft($"event_id", 3).as("shl"),
          shiftright($"event_id", 2).as("shr"),
          bit_count($"event_id").as("bits"))
        .orderBy($"event_id")
    }),

    // Semi-structured VARIANT type (Spark 4): JSON parsed once into
    // the binary variant encoding, then typed path extraction — the
    // columnar-friendly way to carry ragged metadata at 100 TB (vs
    // get_json_object re-parsing the string per access, which
    // q_expr_json covers). A missing path is NULL, not an error.
    "q_expr_variant" -> ((s, d) => {
      import s.implicits._
      t(s, d, "events").where($"event_id" < 500)
        .select($"event_id",
          expr("variant_get(parse_json(props), '$.k', 'long')").as("k"),
          expr("variant_get(parse_json(props), '$.missing', 'string')")
            .as("miss"))
        .orderBy($"event_id")
    }),

    // XML ingestion: from_xml with an explicit schema — the third
    // semi-structured path next to get_json_object (q_expr_json) and
    // VARIANT (q_expr_variant). The document is synthesized from
    // fixture columns (the corpus has no raw XML) and the parse is
    // the surface under test; the oracle reconstructs the fields.
    "q_expr_xml" -> ((s, d) => {
      import s.implicits._
      val xml = concat(lit("<doc><id>"), $"doc_id", lit("</id><lang>"),
        $"lang", lit("</lang><n>"), $"n_chars", lit("</n></doc>"))
      t(s, d, "documents").where($"doc_id" < 200)
        .withColumn("xml", xml)
        .withColumn("x",
          expr("from_xml(xml, 'id BIGINT, lang STRING, n BIGINT')"))
        .select($"doc_id", $"x.id".as("xid"), $"x.lang".as("xlang"),
          $"x.n".as("xn"))
        .orderBy($"doc_id")
    }),

    // Error-safe (ANSI try_*) arithmetic: a 100-TB job must not die on
    // one malformed row, and try_divide/try_element_at give NULL-on-
    // error without disabling ANSI mode globally. Division hits a real
    // zero (floor(qty)-25) and the array probe a real out-of-range
    // index, so the NULL surface is non-vacuous; DuckDB's native
    // semantics (x/0 → NULL, list[oob] → NULL) mirror try_* exactly.
    "q_expr_try" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem").where($"l_orderkey" < 300)
        .select($"l_orderkey", $"l_linenumber",
          (floor(expr("try_divide(l_extendedprice, floor(l_quantity) - 25)")
            * 1e4 + 0.5) / 1e4).as("ratio"),
          expr("try_element_at(array(l_returnflag, l_linestatus), l_linenumber)")
            .as("flag_at"))
        .orderBy($"l_orderkey", $"l_linenumber")
    }),

    // URL parsing surface (web-corpus ingestion needs host/path/param
    // extraction before any domain-level filtering or dedup). The URL
    // is synthesized deterministically from fixture columns — the
    // corpus has no raw URLs — then taken apart with `parse_url`
    // (codegen'd), which is the part under test; the oracle
    // reconstructs each component from the same inputs.
    "q_expr_url" -> ((s, d) => {
      import s.implicits._
      val url = concat(lit("https://"), $"source", lit(".example.org/"),
        $"lang", lit("/doc?id="), $"doc_id", lit("&ref="), $"source")
      t(s, d, "documents").where($"doc_id" < 200)
        .withColumn("url", url)
        .select($"doc_id",
          parse_url($"url", lit("HOST")).as("host"),
          parse_url($"url", lit("PATH")).as("path"),
          parse_url($"url", lit("QUERY"), lit("id")).cast("long").as("qid"),
          parse_url($"url", lit("QUERY"), lit("ref")).as("ref"))
        .orderBy($"doc_id")
    }),

    // session. Body is deliberately trivial (lowercase, strip
    // non-alpha, collapse spaces) so the oracle can reconstruct it in
    // SQL. Token count of the normalized text per doc.
    "q_udf_scalar" -> ((s, d) => {
      import s.implicits._
      val tokNorm = udf((text: String) =>
        text.toLowerCase.replaceAll("[^a-z ]", " ")
          .replaceAll(" +", " ").trim)
      // Registration IS the surface under test (SURVEY §2.2 mandates
      // both call forms), so the query calls the REGISTERED name —
      // re-registering the same pure function is idempotent.
      s.udf.register("tok_norm", tokNorm)
      val norm = call_udf("tok_norm", $"text")
      t(s, d, "documents")
        .select($"doc_id",
          when(length(norm) === 0, 0L)
            .otherwise(size(split(norm, " ")).cast("long"))
            .as("n_tokens"))
        .orderBy($"doc_id")
    }),
  )

  val oracle: Map[String, String] = Map(
    "q_expr_map" -> """
      WITH c AS (
        SELECT user_id, event_type, count(*) AS n
        FROM events GROUP BY user_id, event_type)
      SELECT user_id,
             CAST(count(*) AS INT) AS n_types,
             MAX(CASE WHEN event_type = 'click' THEN n END) AS clicks,
             MAX(CASE WHEN event_type = 'purchase' THEN n END) AS purchases,
             string_agg(event_type, ',' ORDER BY event_type) AS types
      FROM c
      GROUP BY user_id
      ORDER BY user_id""",

    "q_expr_variant" -> """
      SELECT event_id,
             CAST(props->>'$.k' AS BIGINT) AS k,
             props->>'$.missing' AS miss
      FROM events
      WHERE event_id < 500
      ORDER BY event_id""",

    "q_expr_xml" -> """
      SELECT doc_id, doc_id AS xid, lang AS xlang, n_chars AS xn
      FROM documents
      WHERE doc_id < 200
      ORDER BY doc_id""",

    // NULL-on-zero written explicitly: DuckDB 1.0 returns NULL for
    // double x/0 but 1.1+ returns IEEE inf, so the oracle must not
    // lean on division-by-zero behavior.
    "q_expr_try" -> """
      SELECT l_orderkey, l_linenumber,
             CASE WHEN FLOOR(l_quantity) - 25 = 0 THEN NULL
                  ELSE FLOOR(l_extendedprice / (FLOOR(l_quantity) - 25)
                         * 1e4 + 0.5) / 1e4 END AS ratio,
             ([l_returnflag, l_linestatus])[l_linenumber] AS flag_at
      FROM lineitem
      WHERE l_orderkey < 300
      ORDER BY l_orderkey, l_linenumber""",

    "q_expr_url" -> """
      SELECT doc_id,
             source || '.example.org' AS host,
             '/' || lang || '/doc' AS path,
             doc_id AS qid,
             source AS ref
      FROM documents
      WHERE doc_id < 200
      ORDER BY doc_id""",

    "q_filter_pred" -> """
      SELECT l_orderkey, l_linenumber, l_quantity,
             l_returnflag, l_linestatus, l_shipdate
      FROM lineitem
      WHERE l_shipdate BETWEEN TIMESTAMP '1996-01-01 00:00:00'
                           AND TIMESTAMP '1997-12-31 00:00:00'
        AND l_returnflag IN ('A', 'R')
        AND l_quantity > 25
        AND l_linestatus LIKE 'F%'
      ORDER BY l_orderkey, l_linenumber""",

    "q_filter_regex" -> """
      SELECT p_partkey, p_name, p_type
      FROM part
      WHERE regexp_matches(p_name, '(?i)(ring|widget)')
      ORDER BY p_partkey""",

    "q_expr_string" -> """
      SELECT c_custkey,
             lower(c_name) AS lo,
             upper(c_mktsegment) AS up,
             substring(c_name, 1, 8) AS sub8,
             length(c_name) AS len,
             concat_ws('-', c_mktsegment, c_name) AS cat,
             replace(c_name, 'Customer#', 'C') AS repl,
             lpad(CAST(c_custkey AS VARCHAR), 12, '0') AS pad
      FROM customer
      ORDER BY c_custkey""",

    "q_expr_date" -> """
      SELECT o_orderkey,
             CAST(year(o_orderdate) AS INT) AS y,
             CAST(month(o_orderdate) AS INT) AS m,
             CAST(day(o_orderdate) AS INT) AS dom,
             CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS mon_start,
             CAST(datediff('day', o_orderdate, DATE '2000-01-01') AS INT)
               AS days_to_y2k,
             last_day(o_orderdate) AS eom,
             CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
      FROM orders
      ORDER BY o_orderkey""",

    "q_expr_math" -> """
      SELECT l_orderkey, l_linenumber,
             ROUND(ABS(l_discount - 0.05), 2) AS abs_d,
             CAST(CEIL(l_quantity) AS BIGINT) AS ceil_q,
             CAST(FLOOR(l_quantity) AS BIGINT) AS floor_q,
             ROUND(SQRT(l_extendedprice), 4) AS sqrt_p,
             ROUND(LN(1 + l_extendedprice), 4) AS ln_p,
             ROUND(POWER(l_quantity, 2), 2) AS pow_q,
             CAST(l_quantity AS BIGINT) % 7 AS mod_q
      FROM lineitem
      WHERE l_orderkey < 500
      ORDER BY l_orderkey, l_linenumber""",

    "q_expr_case" -> """
      SELECT o_orderkey,
             CASE WHEN o_totalprice < 100000 THEN 'low'
                  WHEN o_totalprice < 300000 THEN 'mid'
                  ELSE 'high' END AS bucket,
             COALESCE(NULLIF(o_orderstatus, 'P'), 'X') AS st
      FROM orders
      ORDER BY o_orderkey""",

    "q_expr_json" -> """
      SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
      FROM events
      WHERE CAST(props->>'$.k' AS BIGINT) >= 50
      ORDER BY event_id""",

    "q_expr_array" -> """
      SELECT vec_id,
             CAST(len(embedding) AS INT) AS dim,
             FLOOR(CAST(embedding[1] AS DOUBLE) * 10000 + 0.5) / 10000 AS first_val,
             ROUND(SQRT(list_sum(list_transform(embedding,
               x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))), 4) AS l2norm
      FROM embeddings
      ORDER BY vec_id""",

    // DuckDB bit_count returns TINYINT — cast to INT to match Spark.
    "q_expr_bitwise" -> """
      SELECT event_id,
             event_id & 255 AS lo,
             event_id | 16 AS or16,
             xor(event_id, user_id) AS x,
             event_id << 3 AS shl,
             event_id >> 2 AS shr,
             CAST(bit_count(event_id) AS INT) AS bits
      FROM events
      WHERE event_id < 500
      ORDER BY event_id""",

    "q_udf_scalar" -> """
      SELECT doc_id,
             CASE WHEN length(norm) = 0 THEN 0
                  ELSE len(string_split(norm, ' ')) END AS n_tokens
      FROM (
        SELECT doc_id,
               trim(regexp_replace(regexp_replace(lower(text),
                 '[^a-z ]', ' ', 'g'), ' +', ' ', 'g')) AS norm
        FROM documents)
      ORDER BY doc_id""",
  )
}
