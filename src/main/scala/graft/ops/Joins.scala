package graft.ops

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import Tables.{Q, t}

/** §2.3 Joins — the reference's repartition-join / replicated-join /
  * semi-join / theta-join vocabulary re-expressed declaratively
  * (SURVEY §2.3). Spark picks the physical strategy; we only hint
  * where the contract demands it (`q_join_broadcast`).
  *
  * Scale notes: dims (region/nation/part/supplier/customer) broadcast
  * at real scale, so the fact-side scan never shuffles for those.
  * Fact-fact joins (range/asof over events) key their shuffle on
  * user_id; AQE's skew-join splitting covers hot users. The as-of
  * join is a single window pass — one shuffle on (user), no
  * per-row probing.
  */
object Joins {

  /** q_join_interval's grid cell width in days — ≥ the max synthetic
    * interval length (29), so every interval covers ≤ 2 cells and the
    * explode is bounded at 2×. */
  private[graft] val IntervalCellDays = 32

  /** The interval-overlap candidate pairs of q_join_interval, at ALL
    * shared grid cells (an overlapping pair appears once per cell
    * both sides cover): distinct (supplier, order, line, start, end)
    * tuples with the synthesized transit window held as integer day
    * offsets, exploded to their [[IntervalCellDays]]-wide cells,
    * self-joined on (supplier, cell) with the overlap predicate and
    * the lexicographic tuple ordering. ONE definition used by the
    * declared query (which adds the first-cell residual) AND the
    * first-cell ≡ distinct law in OpsSpec — so the pinned law always
    * covers the shipped grid, not a copy of it. */
  private[graft] def intervalCandidates(s: org.apache.spark.sql.SparkSession,
      d: String): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val li = t(s, d, "lineitem").select(
        $"l_suppkey".as("sk"), $"l_orderkey".as("ok"),
        $"l_linenumber".as("ln"),
        datediff($"l_shipdate", lit("1992-01-01")).as("st"),
        (datediff($"l_shipdate", lit("1992-01-01")) + lit(1)
          + floor($"l_quantity").cast("long") % 28).as("en"))
      .distinct()
      .withColumn("c0", floor($"st" / IntervalCellDays))
      .withColumn("c1", floor($"en" / IntervalCellDays))
      // Both self-join sides explode THIS table; the lazy checkpoint
      // materializes the distinct once instead of letting each side
      // replay the lineitem scan + dedup exchange.
      .transform(Tables.ck)
    val a = li.select($"sk",
      struct($"ok", $"ln", $"st", $"en").as("ida"), $"st".as("sa"),
      $"en".as("ea"), $"c0".as("ca0"),
      explode(sequence($"c0", $"c1")).as("cell"))
    val b = li.select($"sk".as("skb"),
      struct($"ok", $"ln", $"st", $"en").as("idb"), $"st".as("sb"),
      $"en".as("eb"), $"c0".as("cb0"),
      explode(sequence($"c0", $"c1")).as("cellb"))
    a.join(b, $"sk" === $"skb" && $"cell" === $"cellb"
      && $"ida" < $"idb"
      && $"sa" <= $"eb" && $"sb" <= $"ea")
  }

  val queries: Map[String, Q] = Map(
    // Reduce-side repartition join → Spark picks broadcast-hash here
    // (customer is small); at 100 TB with a huge build side it
    // degrades gracefully to sort-merge on the equi key.
    "q_join_inner" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(t(s, d, "customer"), $"o_custkey" === $"c_custkey", "inner")
        .select($"o_orderkey", $"c_name", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    // Map-side replicated join: explicit broadcast() hint (the
    // reference ships the small table in the distributed cache).
    "q_join_broadcast" -> ((s, d) => {
      import s.implicits._
      t(s, d, "lineitem")
        .join(broadcast(t(s, d, "part")), $"l_partkey" === $"p_partkey")
        .groupBy($"p_type")
        .agg(round(sum($"l_extendedprice" * (lit(1) - $"l_discount")), 2)
          .as("revenue"))
        .orderBy($"p_type")
    }),

    // TPC-H-Q3-shaped chained join. Small per-order groups sum exact
    // 4-decimal values, so round via the tie-proof floor form.
    "q_join_multiway" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer").filter($"c_mktsegment" === "BUILDING")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .join(t(s, d, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .groupBy($"l_orderkey", $"o_orderdate")
        .agg((floor(sum($"l_extendedprice" * (lit(1) - $"l_discount"))
          * 100 + 0.5) / 100).as("revenue"))
        .orderBy($"revenue".desc, $"l_orderkey")
        .limit(10)
    }),

    "q_join_left" -> ((s, d) => {
      import s.implicits._
      t(s, d, "customer")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey", "left")
        .groupBy($"c_custkey")
        .agg(count($"o_orderkey").as("n_orders"))
        .orderBy($"c_custkey")
    }),

    // Outer join manufacturing nulls on both sides (events has user 0
    // and beyond-customer users at larger SFs; customers without
    // events null out the right side).
    "q_join_outer_full" -> ((s, d) => {
      import s.implicits._
      val perUser = t(s, d, "events")
        .groupBy($"user_id").agg(count(lit(1)).as("n_events"))
      t(s, d, "customer")
        .join(perUser, $"c_custkey" === $"user_id", "full_outer")
        .select(coalesce($"c_custkey", $"user_id").as("key"),
                $"c_name", $"n_events")
        .orderBy($"key".asc_nulls_first)
    }),

    "q_join_semi" -> ((s, d) => {
      import s.implicits._
      t(s, d, "orders")
        .join(t(s, d, "lineitem").filter($"l_quantity" > 45),
          $"o_orderkey" === $"l_orderkey", "left_semi")
        .select($"o_orderkey", $"o_totalprice")
        .orderBy($"o_orderkey")
    }),

    "q_join_anti" -> ((s, d) => {
      import s.implicits._
      t(s, d, "part")
        .join(t(s, d, "lineitem"), $"p_partkey" === $"l_partkey",
          "left_anti")
        .select($"p_partkey", $"p_name")
        .orderBy($"p_partkey")
    }),

    // Equi key + theta residual: Spark hashes on the nationkey and
    // applies the acctbal inequality as a post-join filter — the
    // declarative form of the reference's 1-Bucket-Theta scheme.
    "q_join_theta" -> ((s, d) => {
      import s.implicits._
      t(s, d, "supplier")
        .join(t(s, d, "customer"),
          $"s_nationkey" === $"c_nationkey" && $"s_acctbal" > $"c_acctbal")
        .groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_pairs"),
             round(avg($"s_acctbal" - $"c_acctbal"), 2).as("avg_gap"))
        .select($"s_nationkey".as("nationkey"), $"n_pairs", $"avg_gap")
        .orderBy($"nationkey")
    }),

    // 1-BUCKET-THETA grid join (Okcan & Riedewald, SIGMOD 2011 —
    // PAPERS.md): the scalable plan for an inequality join with NO
    // equi key at all (q_join_theta leans on its nationkey block; here
    // the predicate is a pure global s_acctbal > c_acctbal). The
    // |A|×|B| comparison grid is tiled r×c: each supplier owns one
    // hash-assigned ROW and replicates across the c columns, each
    // customer one COLUMN replicated across the r rows — every pair
    // meets in EXACTLY ONE cell, the join key is the CELL id (a plain
    // equi shuffle, no cartesian node, no broadcast), and per-task
    // work is balanced at (|A|/r)·(|B|/c) regardless of skew. At
    // 100 TB r·c tracks the cluster's task count and replication cost
    // is |A|·c + |B|·r — the paper's memory/replication trade, chosen
    // so neither side broadcasts. JoinsSpec proves grid invariance:
    // (1,1) ≡ (4,4) ≡ (8,2).
    "q_join_theta_grid" -> ((s, d) => thetaGrid(s, d, 4, 4)),

    // Band self-join: equi on user_id, residual 5-minute window.
    // Timestamps are µs-truncated identically in both engines, so the
    // interval arithmetic is exact.
    //
    // The equi key is (user_id, 5-min time bucket), not user_id alone:
    // keyed only on user, every event pair of a user meets in one
    // sort-merge group — O(per-user²) comparisons and at most
    // |users| shuffle keys. Bucketing bounds each group to a 5-minute
    // slice; the left side probes its own bucket and the next one
    // (a window can span a boundary), so every qualifying pair is seen
    // exactly once and key cardinality scales with the time span.
    // The SAME banded range join computed by the native sliding-buffer
    // merge operator (plans/RangeJoin.scala): no bucket explode (which
    // doubles one side), no bucket false-positives to filter — both
    // sides stream once per co-partition with O(band density) state.
    // Same per-user pair-count rollup, same oracle as q_join_range;
    // PlanShapeSpec pins row-for-row equality between the forms.
    "q_join_range_native" -> ((s, d) => {
      import s.implicits._
      val e1 = t(s, d, "events").select($"user_id", $"ts", $"event_id")
      val e2 = Tables.fresh(s, d, "events")
        .select($"user_id".as("u2"), $"ts".as("ts2"), $"event_id".as("id2"))
      graft.plans.RangeJoin(e1, e2,
          "user_id", "ts", "event_id", "u2", "ts2", "id2",
          5L * 60 * 1000000)
        .groupBy($"user_id")
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"user_id")
    }),

    // INTERVAL-OVERLAP self-join on a GRID: count, per supplier, the
    // pairs of its shipments whose transit windows overlap in time —
    // the interval×interval shape (temporal concurrency, genomics
    // range intersection, booking conflicts) that q_join_range's
    // point-vs-point band join cannot express. The fixture has no
    // receipt date, so the window is SYNTHESIZED deterministically in
    // BOTH engines: [ship, ship + 1 + floor(quantity) % 28 days],
    // held as integer day offsets from a fixed epoch so all interval
    // arithmetic after one datediff is exact integer math.
    //
    // Scale mechanics: each interval explodes to the 32-day grid
    // cells it covers (cell width ≥ max interval length ⇒ ≤ 2 cells
    // per row, bounding the explode at 2×), the join key is
    // (supplier, cell) — so comparisons are Σ per-cell density², the
    // cell width is the knob, and no pair of distant-in-time
    // shipments ever meets. Overlapping intervals share every cell in
    // their overlap, so a naive grid join double-counts; the
    // FIRST-CELL rule — count (a,b) only in cell
    // max(startCell(a), startCell(b)), which overlap guarantees both
    // cover — makes each pair meet exactly once WITHOUT the
    // de-duplicating distinct (and its shuffle) the naive form needs.
    // The rule ≡ distinct is pinned as a law in OpsSpec.
    // Pair identity: the fixture's (l_orderkey, l_linenumber) is NOT
    // unique, so rows are collapsed to DISTINCT (supplier, order,
    // line, start, end) tuples — identically in both engines — and
    // pairs are ordered by the tuple itself (struct comparison here,
    // row comparison in DuckDB: both lexicographic), which is a total
    // order on distinct tuples with no synthetic id to keep unique.
    "q_join_interval" -> ((s, d) => {
      import s.implicits._
      intervalCandidates(s, d)
        .where($"cell" === greatest($"ca0", $"cb0"))
        .groupBy($"sk")
        .agg(count(lit(1)).as("n_pairs"))
        .select($"sk".as("suppkey"), $"n_pairs")
        .orderBy($"suppkey")
    }),

    "q_join_range" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events").select($"user_id", $"ts")
        .withColumn("bk", floor(unix_timestamp($"ts") / 300))
      val e1 = ev.select($"user_id".as("u1"), $"ts".as("ts1"),
          explode(array($"bk", $"bk" + 1)).as("bk"))
      val e2 = ev.select($"user_id".as("u2"), $"ts".as("ts2"), $"bk")
      e1.join(e2,
          $"u1" === $"u2" && e1("bk") === e2("bk")
            && $"ts2" > $"ts1"
            && $"ts2" <= $"ts1" + expr("INTERVAL 5 MINUTES"))
        .groupBy($"u1".as("user_id"))
        .agg(count(lit(1)).as("n_pairs"))
        .orderBy($"user_id")
    }),

    // As-of join emulated with one window pass: union-tag purchases
    // and signups, carry the last signup id forward within each user's
    // time-ordered stream (signup sorts before purchase at equal ts so
    // "prior-or-equal" is inclusive), keep purchases. One shuffle on
    // user_id — the scalable shape; cross-checked against DuckDB's
    // native ASOF LEFT JOIN.
    // The SAME as-of semantics computed by the engine's native
    // sort-merge as-of operator (plans/AsofJoin.scala: custom
    // BinaryNode → SparkStrategy → BinaryExecNode): one keyed exchange
    // per side, then a streaming two-pointer merge with O(1) state —
    // no union-tagging, no window frame. Right side reads through
    // Tables.fresh for attribute-disjoint sides (self-join). Oracle is
    // the same DuckDB ASOF LEFT JOIN as q_join_asof; PlanShapeSpec
    // pins row-for-row equality between the two forms.
    "q_join_asof_native" -> ((s, d) => {
      import s.implicits._
      val p = t(s, d, "events").where($"event_type" === "purchase")
        .select($"event_id", $"user_id", $"ts")
      val sg = Tables.fresh(s, d, "events").where($"event_type" === "signup")
        .select($"event_id".as("signup_event_id"), $"user_id".as("s_user"),
          $"ts".as("s_ts"))
      graft.plans.AsofJoin(p, sg,
          "user_id", "ts", "event_id",
          "s_user", "s_ts", "signup_event_id")
        .select($"event_id", $"signup_event_id")
        .orderBy($"event_id")
    }),

    "q_join_asof" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .filter($"event_type".isin("purchase", "signup"))
        .select($"event_id", $"ts", $"user_id", $"event_type")
        .withColumn("tag", when($"event_type" === "signup", 0).otherwise(1))
        .withColumn("sid", when($"event_type" === "signup", $"event_id"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"tag", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("signup_event_id", last($"sid", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .select($"event_id", $"signup_event_id")
        .orderBy($"event_id")
    }),

    // NEAREST-DIRECTION AS-OF — pandas merge_asof(direction=
    // 'nearest'): each purchase takes whichever signup is CLOSER in
    // time, before or after (the attribution-window semantics: which
    // campaign touch does a conversion belong to), within the same
    // 1-day tolerance as q_join_asof_tol; ties at equal distance go
    // to the earlier signup (deterministic). Both candidates come
    // from the SAME sorted frame pass — backward via
    // last(ignoreNulls) over the preceding frame, forward via
    // first(ignoreNulls) over the following frame (same-ts signups
    // sort before the purchase, so they land in the backward frame
    // exactly once, never both) — one shuffle on the entity key, two
    // frames over one sort, no join fan-out. Distances compare in
    // exact epoch MICROSECONDS (integers both engines; the fixture
    // has no (user, ts) signup collisions at any SF, spec-pinned).
    "q_join_asof_near" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .filter($"event_type".isin("purchase", "signup"))
        .select($"event_id", $"ts", unix_micros($"ts").as("us"),
          $"user_id", $"event_type")
        .withColumn("tag", when($"event_type" === "signup", 0).otherwise(1))
        .withColumn("sid", when($"event_type" === "signup", $"event_id"))
        .withColumn("sus", when($"event_type" === "signup", $"us"))
      val ord = Window.partitionBy($"user_id")
        .orderBy($"ts", $"tag", $"event_id")
      val wb = ord.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wf = ord.rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val tol = 86400L * 1000000L
      ev
        .withColumn("pid", last($"sid", ignoreNulls = true).over(wb))
        .withColumn("pus", last($"sus", ignoreNulls = true).over(wb))
        .withColumn("nid", first($"sid", ignoreNulls = true).over(wf))
        .withColumn("nus", first($"sus", ignoreNulls = true).over(wf))
        .filter($"event_type" === "purchase")
        .withColumn("da", $"us" - $"pus")
        .withColumn("db", $"nus" - $"us")
        .withColumn("takeprev",
          $"pus".isNotNull && ($"nus".isNull || $"da" <= $"db"))
        .withColumn("cid", when($"takeprev", $"pid").otherwise($"nid"))
        .withColumn("dist", when($"takeprev", $"da").otherwise($"db"))
        .withColumn("ok", $"cid".isNotNull && $"dist" <= tol)
        .select($"event_id",
          when($"ok", $"cid").as("signup_event_id"),
          when($"ok", when($"takeprev", lit("prev")).otherwise(lit("next")))
            .as("direction"),
          when($"ok", $"dist").as("dist_us"))
        .orderBy($"event_id")
    }),

    // AS-OF JOIN WITH MATCH TOLERANCE — the pandas merge_asof
    // (tolerance=...) / kdb wj semantics and the feature-store
    // staleness rule: a purchase takes its most recent preceding
    // signup ONLY if that signup is at most 1 day old, else the match
    // is NULL — serving a feature older than its freshness SLA is
    // treated as serving no feature at all (measured sf0.01: 708
    // fresh / 1083 stale-nulled / 190 never-matched — the tolerance
    // genuinely bites). Same single sort-based window pass as
    // q_join_asof (the shape that scales: one shuffle on user_id,
    // one ordered frame, no join fan-out); the carried signup ts
    // rides the SAME last(ignoreNulls) frame as the id — both
    // non-null exactly on signup rows, so they always come from the
    // same row — and the tolerance is one filter on the carried
    // column. age_s reports the served feature's age in whole
    // seconds (epoch-difference, exact integers both engines).
    "q_join_asof_tol" -> ((s, d) => {
      import s.implicits._
      val ev = t(s, d, "events")
        .filter($"event_type".isin("purchase", "signup"))
        .select($"event_id", $"ts", $"user_id", $"event_type")
        .withColumn("tag", when($"event_type" === "signup", 0).otherwise(1))
        .withColumn("sid", when($"event_type" === "signup", $"event_id"))
        .withColumn("sts", when($"event_type" === "signup", $"ts"))
      val w = Window.partitionBy($"user_id")
        .orderBy($"ts", $"tag", $"event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      ev.withColumn("sid0", last($"sid", ignoreNulls = true).over(w))
        .withColumn("sts0", last($"sts", ignoreNulls = true).over(w))
        .filter($"event_type" === "purchase")
        .withColumn("fresh", $"sts0".isNotNull &&
          $"sts0" >= $"ts" - expr("INTERVAL 1 DAY"))
        .select($"event_id",
          when($"fresh", $"sid0").as("signup_event_id"),
          when($"fresh", $"ts".cast("long") - $"sts0".cast("long"))
            .as("age_s"))
        .orderBy($"event_id")
    }),

    "q_join_cross" -> ((s, d) => {
      import s.implicits._
      t(s, d, "region").select($"r_name")
        .crossJoin(t(s, d, "part").select($"p_type").distinct())
        .orderBy($"r_name", $"p_type")
    }),

    // Point-in-time feature join — the feature-store correctness
    // shape: for each (sampled) purchase event, aggregate ONLY the
    // orders that existed at the event's timestamp. Leaking future
    // rows here is the classic train-time/serve-time skew bug; the
    // `o_orderdate <= ts` bound inside the join condition is what a
    // PIT-correct backfill enforces. Equi key on the customer, time
    // bound as residual; per-entity history is bounded so the fan-out
    // is |events|·|orders-per-customer|, never a cross join.
    "q_join_pit" -> ((s, d) => {
      import s.implicits._
      val p = t(s, d, "events")
        .filter($"event_type" === "purchase" && $"event_id" % 7 === 0)
        .select($"event_id", $"ts", $"user_id")
      p.join(t(s, d, "orders"),
          $"o_custkey" === $"user_id" && $"o_orderdate" <= $"ts", "left")
        .groupBy($"event_id")
        .agg(count($"o_orderkey").as("n_prior_orders"),
          round(coalesce(sum($"o_totalprice"), lit(0)), 2)
            .as("prior_value"))
        .orderBy($"event_id")
    }),

    // Null-safe equality join (<=>): NULL keys MATCH each other, where
    // a plain equi join silently drops them — the semantics gap that
    // loses rows when a fact's dimension key is nullable. Nulls are
    // manufactured with nullif ('P' → NULL) and the 3-row dim carries
    // an explicit NULL key; every order must survive the join.
    "q_join_nullsafe" -> ((s, d) => {
      import s.implicits._
      val o = t(s, d, "orders")
        .select($"o_orderkey", expr("nullif(o_orderstatus, 'P')").as("st"))
      val dim = Seq(("F", "finished"), ("O", "open"),
          (null.asInstanceOf[String], "pending-unknown"))
        .toDF("dst", "label")
      o.join(broadcast(dim), $"st" <=> $"dst")
        .groupBy($"label").agg(count($"o_orderkey").as("n"))
        .orderBy($"label")
    }),

    // TPC-H-Q5-shaped star join: one fact (lineitem) against four dims
    // plus the local-supplier residual (s_nationkey = c_nationkey).
    // All dims broadcast — at 100 TB the fact table is scanned once
    // and never shuffles for the dim joins; the only shuffle is the
    // final 25-key aggregate. The supplier join hashes on the suppkey
    // equi pair and applies the nation equality as a residual filter.
    "q_join_star" -> ((s, d) => {
      import s.implicits._
      val nations = t(s, d, "nation")
        .join(broadcast(t(s, d, "region")
          .filter($"r_name".isin("ASIA", "EUROPE"))),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey", $"n_name")
      t(s, d, "customer")
        .join(broadcast(nations), $"c_nationkey" === $"n_nationkey")
        .join(t(s, d, "orders"), $"c_custkey" === $"o_custkey")
        .filter($"o_orderdate" < lit("1998-01-01").cast("timestamp"))
        .join(t(s, d, "lineitem"), $"o_orderkey" === $"l_orderkey")
        .join(broadcast(t(s, d, "supplier")),
          $"l_suppkey" === $"s_suppkey" && $"s_nationkey" === $"c_nationkey")
        .groupBy($"n_name")
        .agg((floor(sum($"l_extendedprice" * (lit(1) - $"l_discount"))
          * 100 + 0.5) / 100).as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy($"revenue".desc, $"n_name")
    }),

    // Fuzzy (edit-distance) join — entity-resolution / source-name
    // dedup: pairs of distinct sources within levenshtein 1, blocked
    // by a length band so candidates never include pairs the metric
    // can't accept (|len(a)-len(b)| ≤ 1 is a levenshtein lower bound).
    // The distinct-source dim is tiny here and broadcasts; at 100 TB
    // the band (plus a prefix block) IS the join key — edit distance
    // only ever runs inside a block, never all-pairs.
    "q_join_fuzzy" -> ((s, d) => {
      import s.implicits._
      val src = t(s, d, "documents").select($"source").distinct()
      val a = src.select($"source".as("src_a"))
      val b = src.select($"source".as("src_b"))
      a.join(b, $"src_a" < $"src_b" &&
          abs(length($"src_a") - length($"src_b")) <= 1 &&
          levenshtein($"src_a", $"src_b") <= 1)
        .select($"src_a", $"src_b",
          levenshtein($"src_a", $"src_b").cast("long").as("dist"))
        .orderBy($"src_a", $"src_b")
    }),
  )

  /** q_join_theta_grid body, parameterized by the grid shape so the
    * spec can prove PARTITION-INVARIANCE — the algorithm's defining
    * property: every (supplier, customer) pair meets in EXACTLY ONE
    * cell (the supplier's fixed row × the customer's fixed column),
    * so any r×c grid computes the identical aggregate; (1,1)
    * degenerates to the plain cross product. Money snaps to exact
    * cent BIGINTs so the 150k-pair sum is order-free. */
  private[graft] def thetaGrid(s: org.apache.spark.sql.SparkSession,
      d: String, r: Int, c: Int): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val sup = t(s, d, "supplier")
      .select(floor($"s_acctbal" * 100 + 0.5).cast("long").as("sa"),
        pmod(Tables.h60(concat(lit("tg_s:"), $"s_suppkey".cast("string"))),
          lit(r)).as("gi"))
      .withColumn("gj", explode(expr(s"sequence(0, ${c - 1})")))
    val cust = t(s, d, "customer")
      .select(floor($"c_acctbal" * 100 + 0.5).cast("long").as("ca"),
        pmod(Tables.h60(concat(lit("tg_c:"), $"c_custkey".cast("string"))),
          lit(c)).as("gj"))
      .withColumn("gi", explode(expr(s"sequence(0, ${r - 1})")))
    sup.join(cust, Seq("gi", "gj"))
      .where($"sa" > $"ca")
      .agg(count(lit(1)).as("n_pairs"),
        (floor(sum($"sa" - $"ca") / count(lit(1)) / 100.0 * 1e4 + 0.5)
          / 1e4).as("avg_gap"))
  }

  val oracle: Map[String, String] = Map(
    "q_join_fuzzy" -> """
      WITH src AS (SELECT DISTINCT source FROM documents)
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(levenshtein(a.source, b.source) AS BIGINT) AS dist
      FROM src a JOIN src b
        ON a.source < b.source
       AND abs(length(a.source) - length(b.source)) <= 1
       AND levenshtein(a.source, b.source) <= 1
      ORDER BY src_a, src_b""",

    "q_join_pit" -> """
      WITH p AS (SELECT event_id, ts, user_id FROM events
                 WHERE event_type = 'purchase' AND event_id % 7 = 0)
      SELECT p.event_id,
             CAST(count(o.o_orderkey) AS BIGINT) AS n_prior_orders,
             ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS prior_value
      FROM p LEFT JOIN orders o
        ON o.o_custkey = p.user_id AND o.o_orderdate <= p.ts
      GROUP BY p.event_id
      ORDER BY p.event_id""",

    "q_join_nullsafe" -> """
      WITH o AS (SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st
                 FROM orders),
      d AS (SELECT * FROM (VALUES ('F', 'finished'), ('O', 'open'),
                                  (NULL, 'pending-unknown')) AS t(st, label))
      SELECT d.label, count(o.o_orderkey) AS n
      FROM o JOIN d ON o.st IS NOT DISTINCT FROM d.st
      GROUP BY d.label
      ORDER BY d.label""",

    "q_join_star" -> """
      SELECT n_name,
             FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
               / 100 AS revenue,
             count(*) AS n_lines
      FROM region
        JOIN nation   ON n_regionkey = r_regionkey
        JOIN customer ON c_nationkey = n_nationkey
        JOIN orders   ON o_custkey   = c_custkey
        JOIN lineitem ON l_orderkey  = o_orderkey
        JOIN supplier ON l_suppkey   = s_suppkey AND s_nationkey = c_nationkey
      WHERE r_name IN ('ASIA', 'EUROPE')
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY n_name
      ORDER BY revenue DESC, n_name""",

    "q_join_inner" -> """
      SELECT o_orderkey, c_name, o_totalprice
      FROM orders JOIN customer ON o_custkey = c_custkey
      ORDER BY o_orderkey""",

    "q_join_broadcast" -> """
      SELECT p_type,
             ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_type
      ORDER BY p_type""",

    "q_join_multiway" -> """
      SELECT l_orderkey, o_orderdate,
             FLOOR(SUM(l_extendedprice * (1 - l_discount)) * 100 + 0.5)
               / 100 AS revenue
      FROM customer
        JOIN orders ON c_custkey = o_custkey
        JOIN lineitem ON o_orderkey = l_orderkey
      WHERE c_mktsegment = 'BUILDING'
        AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      GROUP BY l_orderkey, o_orderdate
      ORDER BY revenue DESC, l_orderkey
      LIMIT 10""",

    "q_join_left" -> """
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      GROUP BY c_custkey
      ORDER BY c_custkey""",

    "q_join_outer_full" -> """
      SELECT COALESCE(c_custkey, user_id) AS key, c_name, n_events
      FROM customer
        FULL OUTER JOIN (
          SELECT user_id, count(*) AS n_events FROM events GROUP BY user_id
        ) e ON c_custkey = user_id
      ORDER BY key NULLS FIRST""",

    "q_join_semi" -> """
      SELECT o_orderkey, o_totalprice
      FROM orders
      WHERE EXISTS (SELECT 1 FROM lineitem
                    WHERE l_orderkey = o_orderkey AND l_quantity > 45)
      ORDER BY o_orderkey""",

    "q_join_anti" -> """
      SELECT p_partkey, p_name
      FROM part
      WHERE NOT EXISTS (SELECT 1 FROM lineitem WHERE l_partkey = p_partkey)
      ORDER BY p_partkey""",

    // The grid decomposition must be invisible in the result: plain
    // inequality cross join over exact cents.
    "q_join_theta_grid" -> """
      WITH s AS (SELECT CAST(FLOOR(s_acctbal * 100 + 0.5) AS BIGINT) AS sa
                 FROM supplier),
           c AS (SELECT CAST(FLOOR(c_acctbal * 100 + 0.5) AS BIGINT) AS ca
                 FROM customer)
      SELECT count(*) AS n_pairs,
             FLOOR(CAST(SUM(sa - ca) AS DOUBLE) / count(*) / 100.0
               * 1e4 + 0.5) / 1e4 AS avg_gap
      FROM s JOIN c ON sa > ca""",

    "q_join_theta" -> """
      SELECT s_nationkey AS nationkey, count(*) AS n_pairs,
             ROUND(AVG(s_acctbal - c_acctbal), 2) AS avg_gap
      FROM supplier JOIN customer
        ON s_nationkey = c_nationkey AND s_acctbal > c_acctbal
      GROUP BY s_nationkey
      ORDER BY nationkey""",

    // The grid + first-cell machinery is pure execution strategy: the
    // oracle is the plain interval-overlap theta join.
    "q_join_interval" -> """
      WITH li AS (
        SELECT DISTINCT l_suppkey AS sk, l_orderkey AS ok,
               l_linenumber AS ln,
               datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
                 AS st,
               datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE))
                 + 1 + CAST(FLOOR(l_quantity) AS BIGINT) % 28 AS en
        FROM lineitem)
      SELECT a.sk AS suppkey, CAST(count(*) AS BIGINT) AS n_pairs
      FROM li a JOIN li b
        ON a.sk = b.sk
       AND (a.ok, a.ln, a.st, a.en) < (b.ok, b.ln, b.st, b.en)
       AND a.st <= b.en AND b.st <= a.en
      GROUP BY a.sk
      ORDER BY suppkey""",

    "q_join_range" -> """
      SELECT e1.user_id AS user_id, count(*) AS n_pairs
      FROM events e1 JOIN events e2
        ON e1.user_id = e2.user_id
       AND e2.ts > e1.ts
       AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
      GROUP BY e1.user_id
      ORDER BY user_id""",

    // identical semantics via the native operator — same oracle text
    "q_join_range_native" -> """
      SELECT e1.user_id AS user_id, count(*) AS n_pairs
      FROM events e1 JOIN events e2
        ON e1.user_id = e2.user_id
       AND e2.ts > e1.ts
       AND e2.ts <= e1.ts + INTERVAL 5 MINUTE
      GROUP BY e1.user_id
      ORDER BY user_id""",

    "q_join_asof" -> """
      SELECT p.event_id, s.event_id AS signup_event_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    // backward + forward native ASOF, nearest pick in exact epoch µs
    "q_join_asof_near" -> """
      WITH p AS (SELECT * FROM events WHERE event_type = 'purchase'),
      s AS (SELECT * FROM events WHERE event_type = 'signup'),
      j AS (
        SELECT p.event_id, epoch_us(p.ts) AS us,
               b.event_id AS pid, epoch_us(b.ts) AS pus,
               f.event_id AS nid, epoch_us(f.ts) AS nus
        FROM p
        ASOF LEFT JOIN s b ON p.user_id = b.user_id AND p.ts >= b.ts
        ASOF LEFT JOIN s f ON p.user_id = f.user_id AND p.ts < f.ts),
      k AS (
        SELECT event_id,
               (pus IS NOT NULL AND (nus IS NULL OR us - pus <= nus - us))
                 AS takeprev,
               pid, nid, us - pus AS da, nus - us AS db
        FROM j),
      m AS (
        SELECT event_id,
               CASE WHEN takeprev THEN pid ELSE nid END AS cid,
               CASE WHEN takeprev THEN da ELSE db END AS dist,
               CASE WHEN takeprev THEN 'prev' ELSE 'next' END AS dir
        FROM k)
      SELECT event_id,
             CASE WHEN cid IS NOT NULL AND dist <= 86400000000
                  THEN cid END AS signup_event_id,
             CASE WHEN cid IS NOT NULL AND dist <= 86400000000
                  THEN dir END AS direction,
             CASE WHEN cid IS NOT NULL AND dist <= 86400000000
                  THEN CAST(dist AS BIGINT) END AS dist_us
      FROM m ORDER BY event_id""",

    // the native ASOF match, then the staleness CASE on the matched ts
    "q_join_asof_tol" -> """
      SELECT p.event_id,
             CASE WHEN s.ts >= p.ts - INTERVAL 1 DAY
                  THEN s.event_id END AS signup_event_id,
             CASE WHEN s.ts >= p.ts - INTERVAL 1 DAY
                  THEN CAST(date_diff('second', s.ts, p.ts) AS BIGINT)
                  END AS age_s
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    // identical semantics via the native operator — same oracle text
    "q_join_asof_native" -> """
      SELECT p.event_id, s.event_id AS signup_event_id
      FROM (SELECT * FROM events WHERE event_type = 'purchase') p
      ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'signup') s
        ON p.user_id = s.user_id AND p.ts >= s.ts
      ORDER BY p.event_id""",

    "q_join_cross" -> """
      SELECT r_name, p_type
      FROM region CROSS JOIN (SELECT DISTINCT p_type FROM part)
      ORDER BY r_name, p_type""",
  )
}
