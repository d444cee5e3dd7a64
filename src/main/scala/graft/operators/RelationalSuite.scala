package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.api.{Q, Suite}
import graft.model.Tables

/** A-suite: the relational substrate every MIE-style operation sits on
  * (scan/filter/project, broadcast + shuffle joins, aggregation,
  * window, rollup, top-k). Spark-first: DataFrame API only, so
  * Catalyst gets full pushdown/pruning/AQE freedom.
  *
  * Oracle-determinism: money sums go through decimal(25,6) then back
  * to double — exact, order-independent, bit-identical to DuckDB
  * (SURVEY.md §4). Every query ends in a total-order sort mirrored in
  * its oracle SQL.
  */
object RelationalSuite extends Suite {

  private def dec(c: Column): Column = c.cast("decimal(25,6)")
  /** Exact decimal revenue term: extendedprice * (1 - discount).
    * Inputs have 2 decimal digits, so the 6-digit decimal casts are
    * exact and the decimal multiply is exact on both engines. */
  private def revenue(ep: Column, disc: Column): Column =
    ep.cast("decimal(18,6)") * (lit(1.0) - disc).cast("decimal(12,6)")
  private val revenueSql =
    "CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(12,6))"

  val a1 = Q(
    "a1_pricing_agg",
    (s, d) => {
      val l = Tables.lineitem(s, d).where(col("l_shipdate") <= lit("1998-09-02"))
      l.groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
          sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
          sum(revenue(col("l_extendedprice"), col("l_discount")))
            .cast("decimal(30,6)").cast("double").as("sum_disc_price"),
          sum(col("l_extendedprice").cast("decimal(18,6)") *
              ((lit(1.0) - col("l_discount")) * (lit(1.0) + col("l_tax")))
                .cast("decimal(12,6)"))
            .cast("decimal(30,6)").cast("double").as("sum_charge"),
          (sum(dec(col("l_quantity"))).cast("double") / count(lit(1))).as("avg_qty"),
          (sum(dec(col("l_extendedprice"))).cast("double") / count(lit(1))).as("avg_price"),
          (sum(dec(col("l_discount"))).cast("double") / count(lit(1))).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""
      SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) AS sum_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_base_price,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST(1.0 - l_discount AS DECIMAL(12,6))) AS DECIMAL(30,6)) AS DOUBLE) AS sum_disc_price,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,6)) * CAST((1.0 - l_discount) * (1.0 + l_tax) AS DECIMAL(12,6))) AS DECIMAL(30,6)) AS DOUBLE) AS sum_charge,
        CAST(SUM(CAST(l_quantity AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_qty,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_price,
        CAST(SUM(CAST(l_discount AS DECIMAL(25,6))) AS DOUBLE) / COUNT(*) AS avg_disc,
        COUNT(*) AS count_order
      FROM lineitem
      WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus
      ORDER BY l_returnflag, l_linestatus"""))

  val a2 = Q(
    "a2_filter_project",
    (s, d) =>
      Tables.lineitem(s, d)
        .where(col("l_quantity") >= 48 && col("l_discount") <= 0.02)
        .select(col("l_orderkey"), col("l_linenumber"),
          col("l_quantity"), col("l_extendedprice"))
        .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""
      SELECT l_orderkey, l_linenumber, l_quantity, l_extendedprice
      FROM lineitem
      WHERE l_quantity >= 48 AND l_discount <= 0.02
      ORDER BY l_orderkey, l_linenumber"""))

  val a3 = Q(
    "a3_broadcast_join",
    (s, d) => {
      // part is a dimension: broadcast it so the fact side never shuffles.
      val l = Tables.lineitem(s, d)
      val p = broadcast(Tables.part(s, d))
      l.join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(col("p_brand"))
        .agg(
          sum(revenue(col("l_extendedprice"), col("l_discount")))
            .cast("decimal(30,6)").cast("double").as("brand_revenue"),
          count(lit(1)).as("line_count"))
        .orderBy(col("p_brand"))
    },
    Some(s"""
      SELECT p_brand,
        CAST(CAST(SUM($revenueSql) AS DECIMAL(30,6)) AS DOUBLE) AS brand_revenue,
        COUNT(*) AS line_count
      FROM lineitem JOIN part ON l_partkey = p_partkey
      GROUP BY p_brand
      ORDER BY p_brand"""))

  val a4 = Q(
    "a4_star_join",
    (s, d) => {
      // Star join: all dims broadcast; the single shuffle is the final
      // groupBy on (r_name, n_name).
      val l = Tables.lineitem(s, d)
      val o = Tables.orders(s, d)
      val c = broadcast(Tables.customer(s, d))
      val n = broadcast(Tables.nation(s, d))
      val r = broadcast(Tables.region(s, d))
      l.join(o, col("l_orderkey") === col("o_orderkey"))
        .join(c, col("o_custkey") === col("c_custkey"))
        .join(n, col("c_nationkey") === col("n_nationkey"))
        .join(r, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          sum(revenue(col("l_extendedprice"), col("l_discount")))
            .cast("decimal(30,6)").cast("double").as("revenue"),
          count(lit(1)).as("line_count"))
        .orderBy(col("r_name"), col("n_name"))
    },
    Some(s"""
      SELECT r_name, n_name,
        CAST(CAST(SUM($revenueSql) AS DECIMAL(30,6)) AS DOUBLE) AS revenue,
        COUNT(*) AS line_count
      FROM lineitem
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
      GROUP BY r_name, n_name
      ORDER BY r_name, n_name"""))

  val a5 = Q(
    "a5_topk_orders",
    (s, d) =>
      // orderBy+limit compiles to TakeOrderedAndProject: per-partition
      // top-k then a driver-side merge of k*partitions rows — no full sort.
      Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
          date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date")),
    Some("""
      SELECT o_orderkey, o_custkey, o_totalprice,
        strftime(o_orderdate, '%Y-%m-%d') AS order_date
      FROM orders
      ORDER BY o_totalprice DESC, o_orderkey
      LIMIT 10"""))

  val a6 = Q(
    "a6_window_rank",
    (s, d) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      Tables.orders(s, d)
        .withColumn("rk", row_number().over(w))
        .where(col("rk") <= 3)
        .select(col("o_custkey"), col("rk"), col("o_orderkey"), col("o_totalprice"))
        .orderBy(col("o_custkey"), col("rk"))
    },
    Some("""
      SELECT o_custkey, rk, o_orderkey, o_totalprice FROM (
        SELECT o_custkey, o_orderkey, o_totalprice,
          ROW_NUMBER() OVER (PARTITION BY o_custkey
            ORDER BY o_totalprice DESC, o_orderkey) AS rk
        FROM orders) t
      WHERE rk <= 3
      ORDER BY o_custkey, rk"""))

  val a7 = Q(
    "a7_distinct_agg",
    (s, d) =>
      Tables.lineitem(s, d)
        .groupBy(col("l_returnflag"))
        .agg(
          countDistinct(col("l_suppkey")).as("n_suppliers"),
          countDistinct(col("l_partkey")).as("n_parts"),
          count(lit(1)).as("n_lines"))
        .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
        COUNT(DISTINCT l_suppkey) AS n_suppliers,
        COUNT(DISTINCT l_partkey) AS n_parts,
        COUNT(*) AS n_lines
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  val a8 = Q(
    "a8_anti_semi_join",
    (s, d) => {
      val c = Tables.customer(s, d)
      val o = Tables.orders(s, d)
      val without = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"), lit("no_orders").as("tag"))
      val withF = c.join(
          o.where(col("o_orderstatus") === "F"),
          col("c_custkey") === col("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"), lit("has_f_order").as("tag"))
      without.unionAll(withF).orderBy(col("tag"), col("c_custkey"))
    },
    Some("""
      SELECT c_custkey, c_name, 'no_orders' AS tag
      FROM customer
      WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      UNION ALL
      SELECT c_custkey, c_name, 'has_f_order' AS tag
      FROM customer
      WHERE EXISTS (SELECT 1 FROM orders
                    WHERE o_custkey = c_custkey AND o_orderstatus = 'F')
      ORDER BY tag, c_custkey"""))

  val a9 = Q(
    "a9_rollup",
    (s, d) =>
      Tables.orders(s, d)
        .rollup(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("sum_price"), col("n_orders"))
        .orderBy(col("priority"), col("status")),
    Some("""
      SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        COALESCE(o_orderstatus, 'ALL') AS status,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY ROLLUP(o_orderpriority, o_orderstatus)
      ORDER BY priority, status"""))

  val a10 = Q(
    "a10_event_bucket",
    (s, d) =>
      Tables.events(s, d)
        .groupBy(
          date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:mm:ss")
            .as("hour_bucket"),
          col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          sum(dec(col("value"))).cast("double").as("sum_value"))
        .orderBy(col("hour_bucket"), col("event_type")),
    Some("""
      SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_bucket,
        event_type,
        COUNT(*) AS n_events,
        CAST(SUM(CAST(value AS DECIMAL(25,6))) AS DOUBLE) AS sum_value
      FROM events
      GROUP BY 1, 2
      ORDER BY hour_bucket, event_type"""))

  val a11 = Q(
    "a11_salted_agg",
    // Skewed-key aggregation via salted two-stage partials: decimal-
    // exact, so the result is bit-identical to the direct GROUP BY the
    // oracle runs (l_returnflag has only 3 values — exactly the shape
    // that funnels into 3 reducers without salting).
    (s, d) => Skew.saltedSumCount(Tables.lineitem(s, d),
        col("l_returnflag"), col("l_extendedprice"), salts = 16)
      .withColumnRenamed("key", "l_returnflag")
      .orderBy(col("l_returnflag")),
    Some("""
      SELECT l_returnflag,
        CAST(SUM(CAST(l_extendedprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_value,
        COUNT(*) AS n
      FROM lineitem
      GROUP BY l_returnflag
      ORDER BY l_returnflag"""))

  val a12 = Q(
    "a12_approx_distinct",
    // Deterministic HyperLogLog (Sketches.hllDistinct): per-type
    // approx distinct users, ONE pass + O(64) state per key, register
    // folds are partial-aggregable maxes — the sketch shape
    // approx_count_distinct has, with this repo's bit-exact oracle
    // contract (no float log; the DuckDB replay computes the same
    // estimate to the last bit).
    (s, d) => Sketches.hllDistinct(Tables.events(s, d), "event_type",
        col("user_id"))
      .orderBy(col("event_type")),
    Some(s"""
      ${Sketches.hllDistinctSql("events", "event_type", "user_id")}
      ORDER BY event_type"""))

  val a13 = Q(
    "a13_cube",
    // Full CUBE over (priority, status) — a9's rollup plus the
    // status-only slice; one expand + one partial-aggregable groupBy.
    (s, d) =>
      Tables.orders(s, d)
        .cube(col("o_orderpriority"), col("o_orderstatus"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("sum_price"), col("n_orders"))
        .orderBy(col("priority"), col("status")),
    Some("""
      SELECT COALESCE(o_orderpriority, 'ALL') AS priority,
        COALESCE(o_orderstatus, 'ALL') AS status,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
        COUNT(*) AS n_orders
      FROM orders
      GROUP BY CUBE(o_orderpriority, o_orderstatus)
      ORDER BY priority, status"""))

  val a14 = Q(
    "a14_asof_join",
    // Prior-as-of join (AsOf.joinPrior): each event picks the
    // customer's latest order at or before the event instant —
    // point-in-time-correct dimension lookup, the shape feature
    // backfill needs. Implementation is the single-shuffle
    // union-merge sweep, NOT an inequality join (no per-key history
    // blow-up — see AsOf.scala). All time arithmetic is
    // epoch-microsecond integer math (§4): the 2024 event clock is
    // folded into the 1995-2001 order era with an exact modulus so
    // the inequality actually discriminates, and events before their
    // customer's first order keep NULL order columns (left as-of).
    (s, d) => {
      // 788918400000000 = 1995-01-01T00:00Z µs; 207360000000000 µs
      // = 2400 days, landing inside the order-date span
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        (lit(788918400000000L) +
          pmod(unix_micros(col("ts")), lit(207360000000000L))).as("eff_us"))
      val ord = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        // o_orderdate reads as TIMESTAMP_NTZ; the session TZ is UTC,
        // so the cast is instant-preserving
        unix_micros(col("o_orderdate").cast("timestamp")).as("od_us"))
      AsOf.joinPrior(ev, "user_id", "eff_us", "event_id",
          ord, "o_custkey", "od_us", "o_orderkey")
        .select(col("event_id"), col("user_id"), col("eff_us"),
          col("o_orderkey"), col("o_totalprice"),
          expr("(eff_us - od_us) div 86400000000").as("days_since_order"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id,
               788918400000000 + (epoch_us(ts) % 207360000000000) AS eff_us
        FROM events),
      cand AS (
        SELECT e.event_id, o.o_orderkey, o.o_totalprice,
               epoch_us(o.o_orderdate) AS od_us,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                 ORDER BY epoch_us(o.o_orderdate) DESC,
                          o.o_orderkey DESC) AS rk
        FROM ev e JOIN orders o
          ON o.o_custkey = e.user_id
         AND epoch_us(o.o_orderdate) <= e.eff_us)
      SELECT e.event_id, e.user_id, e.eff_us,
             c.o_orderkey, c.o_totalprice,
             CAST((e.eff_us - c.od_us) // 86400000000 AS BIGINT)
               AS days_since_order
      FROM ev e LEFT JOIN (SELECT * FROM cand WHERE rk = 1) c
        USING (event_id)
      ORDER BY event_id"""))

  val a15 = Q(
    "a15_range_join",
    // Keyed interval join (RangeJoin.intervalJoin): which of the
    // customer's 30-day order windows cover each event instant —
    // snapshot/validity enrichment. NOT an inequality nested loop:
    // intervals explode onto fixed-width buckets (width = interval
    // length ⇒ ≤ 2 buckets each), the join is a plain equi-join on
    // (customer, bucket) with the exact half-open predicate
    // re-applied, and the result aggregates per event. Same era
    // folding as a14 so the windows actually discriminate.
    (s, d) => {
      val ev = Tables.events(s, d).select(
        col("event_id"), col("user_id"),
        (lit(788918400000000L) +
          pmod(unix_micros(col("ts")), lit(207360000000000L))).as("eff_us"))
      val thirtyDaysUs = 2592000000000L
      val ord = Tables.orders(s, d).select(
        col("o_custkey"), col("o_orderkey"),
        unix_micros(col("o_orderdate").cast("timestamp")).as("lo_us"))
        .withColumn("hi_us", col("lo_us") + lit(thirtyDaysUs))
      RangeJoin.intervalJoin(ev, "user_id", "eff_us",
          ord, "o_custkey", "lo_us", "hi_us", widthUs = thirtyDaysUs)
        .groupBy(col("event_id"), col("user_id"))
        .agg(count(lit(1)).as("n_orders"),
          min(col("o_orderkey")).as("first_order"))
        .orderBy(col("event_id"))
    },
    Some("""
      WITH ev AS (
        SELECT event_id, user_id,
               788918400000000 + (epoch_us(ts) % 207360000000000) AS eff_us
        FROM events),
      iv AS (
        SELECT o_custkey, o_orderkey,
               epoch_us(o_orderdate) AS lo,
               epoch_us(o_orderdate) + 2592000000000 AS hi
        FROM orders)
      SELECT e.event_id, e.user_id, COUNT(*) AS n_orders,
             MIN(i.o_orderkey) AS first_order
      FROM ev e JOIN iv i
        ON i.o_custkey = e.user_id
       AND e.eff_us >= i.lo AND e.eff_us < i.hi
      GROUP BY 1, 2
      ORDER BY event_id"""))

  val a16 = Q(
    "a16_grouping_sets",
    // GROUPING SETS ((segment), (status)): two independent
    // aggregation grids from ONE scan + one Expand — the grouping
    // family's third member next to a9's ROLLUP (prefix lattice) and
    // a13's CUBE (full lattice); the shape a reporting layer uses
    // when it wants disjoint slices without rescanning. Customer dim
    // broadcasts into the fact join; sums decimal-exact (§4).
    (s, d) => {
      val j = Tables.orders(s, d).join(
        broadcast(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
      j.groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("o_orderstatus"))),
          col("c_mktsegment"), col("o_orderstatus"))
        .agg(
          sum(dec(col("o_totalprice"))).cast("double").as("sum_price"),
          count(lit(1)).as("n_orders"))
        .select(
          coalesce(col("c_mktsegment"), lit("ALL")).as("segment"),
          coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
          col("sum_price"), col("n_orders"))
        .orderBy(col("segment"), col("status"))
    },
    Some("""
      SELECT COALESCE(c_mktsegment, 'ALL') AS segment,
        COALESCE(o_orderstatus, 'ALL') AS status,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE) AS sum_price,
        COUNT(*) AS n_orders
      FROM orders JOIN customer ON o_custkey = c_custkey
      GROUP BY GROUPING SETS ((c_mktsegment), (o_orderstatus))
      ORDER BY segment, status"""))

  val a17 = Q(
    "a17_pivot",
    // PIVOT: per-nation order value spread across the five order
    // priorities as columns — the wide reporting matrix next to the
    // grouping family (a9/a13/a16 produce rows; pivot produces
    // columns). Priority values are DECLARED, not discovered: passing
    // the value list to pivot() skips the extra collect-distinct job
    // Spark otherwise runs AND fixes the output schema — the only
    // sane contract at 100 TB (schema can't depend on a corpus scan).
    // Executes as Spark's two-phase pivot: partial decimal sums per
    // (nation, priority) — map-side combinable, so the first exchange
    // moves ≤ nations×5 rows per task — then pivotfirst folds the 5
    // priority cells into columns on the nation key; nation
    // broadcasts, customer joins orders on the shuffle.
    (s, d) => {
      val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
      j.groupBy(col("n_name"))
        .pivot("o_orderpriority", pris)
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
        .select(col("n_name"),
          col("`1-URGENT`").as("p_urgent"),
          col("`2-HIGH`").as("p_high"),
          col("`3-MEDIUM`").as("p_medium"),
          col("`4-NOT SPECIFIED`").as("p_notspec"),
          col("`5-LOW`").as("p_low"))
        .orderBy(col("n_name"))
    },
    Some("""
      SELECT n_name,
        CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT'
          THEN CAST(o_totalprice AS DECIMAL(25,6)) END) AS DOUBLE)
          AS p_urgent,
        CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH'
          THEN CAST(o_totalprice AS DECIMAL(25,6)) END) AS DOUBLE)
          AS p_high,
        CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM'
          THEN CAST(o_totalprice AS DECIMAL(25,6)) END) AS DOUBLE)
          AS p_medium,
        CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED'
          THEN CAST(o_totalprice AS DECIMAL(25,6)) END) AS DOUBLE)
          AS p_notspec,
        CAST(SUM(CASE WHEN o_orderpriority = '5-LOW'
          THEN CAST(o_totalprice AS DECIMAL(25,6)) END) AS DOUBLE)
          AS p_low
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      GROUP BY n_name
      ORDER BY n_name"""))

  val a18 = Q(
    "a18_unpivot",
    // UNPIVOT (melt): a17's wide nation×priority matrix back to long
    // rows — the inverse reporting move (wide matrix for humans, long
    // rows for joins/ML), executed as a single Expand over the
    // aggregated 25-row matrix: 5 output rows per input row, map-only,
    // ZERO additional shuffles beyond a17's one aggregation. Column
    // names ARE the priority values, so the melt needs no relabel
    // join; empty cells (null sums) are dropped to match the long
    // groupBy form.
    (s, d) => {
      val pris = Seq("1-URGENT", "2-HIGH", "3-MEDIUM",
        "4-NOT SPECIFIED", "5-LOW")
      val j = Tables.orders(s, d)
        .join(Tables.customer(s, d)
          .select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.nation(s, d)
          .select(col("n_nationkey"), col("n_name"))),
          col("c_nationkey") === col("n_nationkey"))
      val wide = j.groupBy(col("n_name"))
        .pivot("o_orderpriority", pris)
        .agg(sum(dec(col("o_totalprice"))).cast("double"))
      wide.unpivot(
          Array(col("n_name")),
          pris.map(p => col(s"`$p`")).toArray,
          "priority", "sum_price")
        .where(col("sum_price").isNotNull)
        .orderBy(col("n_name"), col("priority"))
    },
    Some("""
      SELECT n_name, o_orderpriority AS priority,
        CAST(SUM(CAST(o_totalprice AS DECIMAL(25,6))) AS DOUBLE)
          AS sum_price
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
      ORDER BY n_name, priority"""))

  val a19 = Q(
    "a19_funnel",
    // Ordered conversion funnel view → click → purchase: a user
    // reaches step k iff they have a step-k event STRICTLY after
    // their step-(k-1) entry time — the staged-min-timestamp
    // semantics every product-analytics funnel uses (not mere
    // presence: order matters). Each stage is a user-keyed
    // partial-aggregable min + one user-keyed equi-join of the NEXT
    // event type against the previous stage's entry times — k-1
    // bounded-fanout shuffles on the user key, no window over the
    // event stream and no per-user event sort; the final 3-row
    // summary broadcasts step 1's count for the ppm conversion.
    (s, d) => {
      val ev = Tables.events(s, d).select(col("user_id"),
        col("event_type"), unix_micros(col("ts")).as("us"))
      def entry(t: String, prev: DataFrame, prevCol: String) =
        ev.where(col("event_type") === t)
          .join(prev, Seq("user_id"))
          .where(col("us") > col(prevCol))
          .groupBy(col("user_id"))
          .agg(min(col("us")).as(prevCol + "n"))
      // t1/t2 each feed two consumers (the next stage's join + their
      // own count row), so barrier them — the event scan and the
      // staged min-aggregations run once, not once per consumer (the
      // shared-subplan convention, cf. mixTemperatureCurve)
      import graft.util.Barriers.BarrierOps
      val t1 = ev.where(col("event_type") === "view")
        .groupBy(col("user_id")).agg(min(col("us")).as("t"))
        .barrier(false)
      val t2 = entry("click", t1, "t").barrier(false)
      val t3 = entry("purchase", t2, "tn")
      def row(step: Int, name: String, df: DataFrame) =
        df.agg(count(lit(1)).as("n_users"))
          .select(lit(step.toLong).as("step"), lit(name).as("stage"),
            col("n_users"))
      val steps = row(1, "view", t1)
        .unionAll(row(2, "click", t2))
        .unionAll(row(3, "purchase", t3))
        .barrier(false)
      // n_base comes from the already-built steps frame, not a second
      // view aggregation
      val base = steps.where(col("step") === 1)
        .select(col("n_users").as("n_base"))
      steps.crossJoin(broadcast(base))
        .select(col("step"), col("stage"), col("n_users"),
          expr("(cast(n_users as decimal(38,0)) * 1000000) div n_base")
            .cast("long").as("conv_ppm"))
        .orderBy(col("step"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, event_type, epoch_us(ts) AS us FROM events),
      t1 AS (
        SELECT user_id, MIN(us) AS t FROM ev
        WHERE event_type = 'view' GROUP BY 1),
      t2 AS (
        SELECT e.user_id, MIN(e.us) AS t FROM ev e
        JOIN t1 ON e.user_id = t1.user_id
        WHERE e.event_type = 'click' AND e.us > t1.t GROUP BY 1),
      t3 AS (
        SELECT e.user_id, MIN(e.us) AS t FROM ev e
        JOIN t2 ON e.user_id = t2.user_id
        WHERE e.event_type = 'purchase' AND e.us > t2.t GROUP BY 1),
      steps AS (
        SELECT 1 AS step, 'view' AS stage, COUNT(*) AS n_users FROM t1
        UNION ALL
        SELECT 2, 'click', COUNT(*) FROM t2
        UNION ALL
        SELECT 3, 'purchase', COUNT(*) FROM t3)
      SELECT CAST(step AS BIGINT) AS step, stage,
             CAST(n_users AS BIGINT) AS n_users,
             CAST((CAST(n_users AS HUGEINT) * 1000000)
               // (SELECT n_users FROM steps WHERE step = 1) AS BIGINT)
               AS conv_ppm
      FROM steps
      ORDER BY step"""))

  val a20 = Q(
    "a20_retention_cohort",
    // Weekly retention cohort matrix: users grouped by first-seen
    // week, each cohort's share still active k weeks later — the
    // classic growth-analytics triangle. First-seen is a user-keyed
    // partial-aggregable min; the (cohort, offset) matrix is a
    // distinct over (user, week) pairs (bounded: users × weeks)
    // joined user-keyed to the cohort map; cohort sizes broadcast
    // back for the ppm share. Weeks are integer epoch-microsecond
    // arithmetic — no calendar functions to disagree across engines.
    (s, d) => {
      val ev = Tables.events(s, d)
        .select(col("user_id"),
          expr("unix_micros(ts) div 604800000000").as("week"))
      val cohort = ev.groupBy(col("user_id"))
        .agg(min(col("week")).as("cohort_week"))
      val active = ev.distinct()
        .join(cohort, Seq("user_id"))
        .select(col("cohort_week"),
          (col("week") - col("cohort_week")).as("week_offset"))
        .groupBy(col("cohort_week"), col("week_offset"))
        .agg(count(lit(1)).as("n_active"))
      val sizes = cohort.groupBy(col("cohort_week"))
        .agg(count(lit(1)).as("n_cohort"))
      active.join(broadcast(sizes), Seq("cohort_week"))
        .select(col("cohort_week"), col("week_offset"), col("n_active"),
          col("n_cohort"),
          expr("(cast(n_active as decimal(38,0)) * 1000000) div n_cohort")
            .cast("long").as("retained_ppm"))
        .orderBy(col("cohort_week"), col("week_offset"))
    },
    Some("""
      WITH ev AS (
        SELECT user_id, epoch_us(ts) // 604800000000 AS week
        FROM events),
      cohort AS (
        SELECT user_id, MIN(week) AS cohort_week FROM ev GROUP BY 1),
      active AS (
        SELECT c.cohort_week, e.week - c.cohort_week AS week_offset,
               COUNT(*) AS n_active
        FROM (SELECT DISTINCT user_id, week FROM ev) e
        JOIN cohort c ON e.user_id = c.user_id
        GROUP BY 1, 2),
      sizes AS (
        SELECT cohort_week, COUNT(*) AS n_cohort FROM cohort GROUP BY 1)
      SELECT a.cohort_week, a.week_offset,
             CAST(a.n_active AS BIGINT) AS n_active,
             CAST(s.n_cohort AS BIGINT) AS n_cohort,
             CAST((CAST(a.n_active AS HUGEINT) * 1000000) // s.n_cohort
               AS BIGINT) AS retained_ppm
      FROM active a JOIN sizes s ON a.cohort_week = s.cohort_week
      ORDER BY a.cohort_week, a.week_offset"""))

  val a21 = Q(
    "a21_json_extract",
    // Schema-on-read JSON extraction over the semi-structured
    // `props` column — the warehouse staple the inventory lacked:
    // get_json_object pulls `$.k` out of each event's JSON payload
    // (codegen'd path-extraction, no UDF), cast to long, then one
    // partial-aggregable per-type rollup (count / sum / min / max of
    // k + distinct users). At 100 TB the extraction is a pure
    // projection riding the scan — no shuffle beyond the final
    // per-type aggregate; distinct-user is the only expansion and it
    // keys on (type, user), never materializing the payloads. All
    // output integers — no float aggregation to disagree across
    // engines.
    (s, d) => Tables.events(s, d)
      .select(col("event_type"), col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast("long").as("n_events"),
        sum(col("k")).cast("long").as("k_sum"),
        min(col("k")).cast("long").as("k_min"),
        max(col("k")).cast("long").as("k_max"),
        countDistinct(col("user_id")).cast("long").as("n_users"))
      .orderBy(col("event_type")),
    Some("""
      SELECT event_type,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_sum,
             CAST(MIN(CAST(json_extract(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_min,
             CAST(MAX(CAST(json_extract(props, '$.k') AS BIGINT))
               AS BIGINT) AS k_max,
             CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
      FROM events
      GROUP BY event_type
      ORDER BY event_type"""))

  override val queries: Seq[Q] =
    Seq(a1, a2, a3, a4, a5, a6, a7, a8, a9, a10, a11, a12, a13, a14, a15,
      a16, a17, a18, a19, a20, a21)
}
