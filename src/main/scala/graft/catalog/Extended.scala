package graft.catalog

import graft.Ckpt.StableCheckpoint
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Extended relational surface: as-of join, range join, CUBE, ordered
  * list-agg, regex functions — operators a reference user would reach for
  * next, each with an exact DuckDB oracle.
  */
object Extended {
  import Tables.t

  private def d2(c: Column): Column = c.cast(DecimalType(12, 2))

  /** q61's JSON staging dir, keyed to the scale-factor dir so dumps for
    * two SFs can never race each other's oracle reads. The oracle SQL
    * carries the `__GRAFT_JSON_STAGE__` token, which Verify substitutes
    * with this same value at dump time. */
  def jsonStageDir(sfDir: String): String =
    s"/root/repo/target/graft_json_src_${Integer.toHexString(sfDir.hashCode)}"
  val JsonStageToken = "__GRAFT_JSON_STAGE__"

  /** q65's landing-zone fixture memo: session → sfDirs already staged.
    * Weak keys keep retired sessions collectable (E2E discipline). */
  private val compactZones = java.util.Collections.synchronizedMap(
    new java.util.WeakHashMap[SparkSession, java.util.Set[String]]())

  val queries: Seq[QueryDef] = Seq(

    QueryDef(
      "q30_asof_join",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"))
        graft.operators.AsOfJoin.asofBackward(
          errors, signups, Seq("user_id"), "ts", "ts", Seq("ts"))
          .select(col("event_id"), col("user_id"), col("asof_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, s.ts AS asof_ts
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN
             (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'signup') s
          ON e.user_id = s.user_id AND e.ts >= s.ts
        ORDER BY e.event_id"""),
      "backward as-of join (latest signup at or before each error), " +
        "composed as union + last_value window — one shuffle, no " +
        "range cross-product (operators/AsOfJoin)"),

    QueryDef(
      "q45_asof_forward",
      (s, dir) => {
        val ev = t(s, dir, "events")
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("ts"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("ts"))
        graft.operators.AsOfJoin.asofForward(
          errors, signups, Seq("user_id"), "ts", "ts", Seq("ts"))
          .select(col("event_id"), col("user_id"), col("asof_ts"))
          .orderBy("event_id")
      },
      Some("""SELECT e.event_id, e.user_id, s.ts AS asof_ts
        FROM (SELECT event_id, user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'error') e
        ASOF LEFT JOIN
             (SELECT user_id, CAST(ts AS TIMESTAMP) AS ts
              FROM events WHERE event_type = 'signup') s
          ON e.user_id = s.user_id AND e.ts <= s.ts
        ORDER BY e.event_id"""),
      "forward as-of join (earliest signup at or after each error) — " +
        "the reversed-ordering twin of q30, vs DuckDB native ASOF"),

    QueryDef(
      "q46_range_frame",
      (s, dir) => {
        // RANGE frame over event time: per-user trailing-1-hour event
        // count and value sum. Ordering by integer epoch seconds keeps
        // the frame bounds exact on both engines; rows tied on the order
        // value are PEERS (range-frame semantics), so no tiebreak column
        // is needed for determinism.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id")).orderBy(col("es"))
          .rangeBetween(-3600L, 0L)
        t(s, dir, "events")
          // floor, not integer division: long division truncates toward
          // zero, which diverges from the oracle's FLOOR for pre-epoch
          // timestamps (latent here — corpus is epoch-positive). The
          // double quotient cannot mis-floor: micros are exact integers
          // < 2^53 and the nearest non-multiple of 1e6 is 1 µs away,
          // beyond the quotient's half-ulp.
          .withColumn("es",
            floor(unix_micros(col("ts")).cast("double") / 1000000.0).cast("long"))
          .select(col("event_id"), col("user_id"), col("es"),
            count(lit(1)).over(w).as("n_1h"),
            sum(d2(col("value"))).over(w).cast("double").as("value_1h"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, es, n_1h, value_1h FROM (
          SELECT event_id, user_id,
            CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT) AS es,
            COUNT(*) OVER (PARTITION BY user_id ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS n_1h,
            CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER (PARTITION BY user_id
              ORDER BY CAST(floor(epoch(CAST(ts AS TIMESTAMP))) AS BIGINT)
              RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW) AS VARCHAR) AS DOUBLE) AS value_1h
          FROM events)
        ORDER BY event_id"""),
      "RANGE window frame: trailing-1-hour per-user aggregates over " +
        "integer event-time (peers share frames — no tiebreak needed)"),

    QueryDef(
      "q47_percentiles",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(expr("percentile(l_quantity, 0.25)").as("q25"),
            expr("percentile(l_quantity, 0.5)").as("q50"),
            expr("percentile(l_quantity, 0.75)").as("q75"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag,
        quantile_cont(l_quantity, 0.25) AS q25,
        quantile_cont(l_quantity, 0.5) AS q50,
        quantile_cont(l_quantity, 0.75) AS q75
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "exact interpolated percentiles (quartiles per group)"),

    QueryDef(
      "q48_string_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .select(col("p_partkey"),
            upper(col("p_name")).as("uname"),
            lpad(col("p_type"), 30, ".").as("padded"),
            translate(col("p_brand"), "AEIOU", "aeiou").as("xlated"),
            expr("split_part(p_type, ' ', 2)").as("type_mid"),
            instr(col("p_name"), "a").cast("long").as("first_a"),
            expr("levenshtein(p_brand, p_type)").cast("long").as("edit_dist"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        upper(p_name) AS uname,
        lpad(p_type, 30, '.') AS padded,
        translate(p_brand, 'AEIOU', 'aeiou') AS xlated,
        split_part(p_type, ' ', 2) AS type_mid,
        CAST(strpos(p_name, 'a') AS BIGINT) AS first_a,
        CAST(levenshtein(p_brand, p_type) AS BIGINT) AS edit_dist
        FROM part ORDER BY p_partkey"""),
      "string-function breadth: case, padding, translate, split_part, " +
        "position, edit distance (F surface generalization)"),

    QueryDef(
      "q49_exists_subquery",
      (s, dir) => {
        // correlated EXISTS / NOT EXISTS through the SQL entry path:
        // Catalyst rewrites them to left-semi and left-anti joins — the
        // subquery surface of the P6/J4 filters
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT c_custkey, c_nationkey FROM customer_v c
          WHERE EXISTS (SELECT 1 FROM orders_v o
                        WHERE o.o_custkey = c.c_custkey
                          AND o.o_totalprice > 300000)
            AND NOT EXISTS (SELECT 1 FROM orders_v o
                            WHERE o.o_custkey = c.c_custkey
                              AND o.o_orderstatus = 'F'
                              AND o.o_totalprice < 1000)
          ORDER BY c_custkey""")
      },
      Some("""SELECT c_custkey, c_nationkey FROM customer c
        WHERE EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM orders o
                          WHERE o.o_custkey = c.c_custkey
                            AND o.o_orderstatus = 'F'
                            AND o.o_totalprice < 1000)
        ORDER BY c_custkey"""),
      "correlated EXISTS + NOT EXISTS subqueries (semi/anti rewrite via " +
        "the SQL entry path)"),

    QueryDef(
      "q31_range_join",
      (s, dir) => {
        val s2 = s; import s2.implicits._
        val periods = Seq(("low", 0.0, 50.0), ("mid", 50.0, 120.0),
          ("high", 120.0, 200.0)).toDF("bucket", "lo", "hi")
        t(s, dir, "events")
          .join(broadcast(periods),
            col("value") >= col("lo") && col("value") < col("hi"))
          .groupBy(col("bucket"))
          .agg(count(lit(1)).as("n"),
            sum(d2(col("value"))).cast("double").as("total_value"))
          .orderBy("bucket")
      },
      Some("""SELECT bucket, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value
        FROM events
        JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 120.0),
                     ('high', 120.0, 200.0)) AS p(bucket, lo, hi)
          ON value >= lo AND value < hi
        GROUP BY bucket ORDER BY bucket"""),
      "range (interval-containment) join against a broadcast dimension"),

    QueryDef(
      "q22_cube",
      (s, dir) =>
        t(s, dir, "lineitem")
          .cube(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(d2(col("l_quantity"))).cast("double").as("sum_qty"))
          .orderBy(col("l_returnflag").asc_nulls_first,
            col("l_linestatus").asc_nulls_first),
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_qty
        FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
        ORDER BY l_returnflag ASC NULLS FIRST, l_linestatus ASC NULLS FIRST"""),
      "CUBE grouping sets"),

    QueryDef(
      "q23_listagg",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_orderkey"))
          .agg(concat_ws(",",
            transform(sort_array(collect_list(col("l_linenumber"))),
              x => x.cast("string"))).as("lines"),
            count(lit(1)).as("n"))
          .orderBy("l_orderkey"),
      Some("""SELECT l_orderkey,
        string_agg(l_linenumber, ',' ORDER BY l_linenumber) AS lines,
        COUNT(*) AS n
        FROM lineitem GROUP BY l_orderkey ORDER BY l_orderkey"""),
      "ordered list aggregation (collect_list + sort vs string_agg)"),

    QueryDef(
      "q32_array_ops",
      (s, dir) => {
        val dv = transform(col("embedding"), x => x.cast("double"))
        t(s, dir, "embeddings")
          .select(col("vec_id"),
            size(col("embedding")).cast("long").as("dim"),
            array_min(dv).as("vmin"),
            array_max(dv).as("vmax"),
            graft.functions.DotProduct.dot_product(dv, dv).as("sumsq"),
            sqrt(graft.functions.DotProduct.dot_product(dv, dv)).as("norm"))
          .orderBy("vec_id")
      },
      Some("""WITH v AS (
          SELECT vec_id, embedding,
            list_transform(embedding, x -> CAST(x AS DOUBLE)) AS dv
          FROM embeddings)
        SELECT vec_id,
          CAST(len(embedding) AS BIGINT) AS dim,
          list_min(dv) AS vmin,
          list_max(dv) AS vmax,
          list_reduce(list_transform(dv, x -> x * x), (a, b) -> a + b) AS sumsq,
          sqrt(list_reduce(list_transform(dv, x -> x * x), (a, b) -> a + b)) AS norm
        FROM v ORDER BY vec_id"""),
      "array min/max/size + fold-based norms over the embedding column"),

    QueryDef(
      "q33_median",
      (s, dir) =>
        t(s, dir, "lineitem")
          .groupBy(col("l_returnflag"))
          .agg(median(col("l_quantity")).as("med_qty"),
            count(lit(1)).as("n"))
          .orderBy("l_returnflag"),
      Some("""SELECT l_returnflag, median(l_quantity) AS med_qty, COUNT(*) AS n
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "exact median (interpolated percentile)"),

    QueryDef(
      "q34_global_topk",
      (s, dir) => {
        val li = t(s, dir, "lineitem"); val o = t(s, dir, "orders")
        li.join(o, li("l_orderkey") === o("o_orderkey"))
          .filter(col("o_orderdate") < to_timestamp(lit("1996-06-01 00:00:00")))
          .groupBy(col("l_orderkey"), col("o_orderdate"))
          .agg(sum(d2(col("l_extendedprice")) *
            (lit(new java.math.BigDecimal("1.00")) - col("l_discount").cast(DecimalType(4, 2))))
            .cast("double").as("revenue"))
          .orderBy(col("revenue").desc, col("l_orderkey"))
          .limit(10)
      },
      Some("""SELECT l_orderkey, o_orderdate,
        CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (CAST(1.00 AS DECIMAL(3,2)) - CAST(l_discount AS DECIMAL(4,2)))) AS VARCHAR) AS DOUBLE) AS revenue
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        WHERE o_orderdate < TIMESTAMP '1996-06-01 00:00:00'
        GROUP BY l_orderkey, o_orderdate
        ORDER BY revenue DESC, l_orderkey LIMIT 10"""),
      "TPC-H Q3 shape: global top-K after join+agg (TakeOrderedAndProject " +
        "— only K rows per partition survive to the driver)"),

    QueryDef(
      "q35_argmax_joinback",
      (s, dir) => {
        val c = t(s, dir, "customer")
        val maxPerNation = c.groupBy(col("c_nationkey").as("nk"))
          .agg(max(col("c_acctbal")).as("max_bal"))
        c.join(broadcast(maxPerNation),
            col("c_nationkey") === col("nk") && col("c_acctbal") === col("max_bal"))
          .select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
          .orderBy("c_nationkey", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM customer
        JOIN (SELECT c_nationkey AS nk, MAX(c_acctbal) AS max_bal
              FROM customer GROUP BY c_nationkey) m
          ON c_nationkey = nk AND c_acctbal = max_bal
        ORDER BY c_nationkey, c_custkey"""),
      "argmax via aggregate + join-back (all ties kept — deterministic)"),

    QueryDef(
      "q37_null_funcs",
      (s, dir) =>
        t(s, dir, "customer")
          .select(col("c_custkey"),
            nullif(col("c_mktsegment"), lit("AUTOMOBILE")).as("seg_or_null"),
            coalesce(nullif(col("c_mktsegment"), lit("AUTOMOBILE")),
              lit("SUPPRESSED")).as("seg_coalesced"),
            when(col("c_acctbal") < 0, lit(null).cast("double"))
              .otherwise(col("c_acctbal")).as("bal_nonneg"),
            (col("c_acctbal") < 0).as("was_negative"))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey,
        nullif(c_mktsegment, 'AUTOMOBILE') AS seg_or_null,
        coalesce(nullif(c_mktsegment, 'AUTOMOBILE'), 'SUPPRESSED') AS seg_coalesced,
        CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal_nonneg,
        c_acctbal < 0 AS was_negative
        FROM customer ORDER BY c_custkey"""),
      "null semantics: nullif / coalesce / CASE-to-null round-trips"),

    QueryDef(
      "q38_date_arith",
      (s, dir) =>
        t(s, dir, "orders")
          .select(col("o_orderkey"),
            (col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("due_date"),
            datediff(col("o_orderdate"),
              to_timestamp(lit("1994-01-01 00:00:00"))).as("days_since_epoch"),
            last_day(col("o_orderdate")).as("month_end"),
            date_trunc("quarter", col("o_orderdate")).as("qtr"))
          .orderBy("o_orderkey"),
      Some("""SELECT o_orderkey,
        o_orderdate + INTERVAL 90 DAY AS due_date,
        CAST(date_diff('day', TIMESTAMP '1994-01-01 00:00:00', o_orderdate) AS INT) AS days_since_epoch,
        CAST(last_day(CAST(o_orderdate AS DATE)) AS DATE) AS month_end,
        date_trunc('quarter', o_orderdate) AS qtr
        FROM orders ORDER BY o_orderkey"""),
      "date arithmetic: interval add, day diff, last_day, quarter trunc"),

    QueryDef(
      "q39_explode",
      (s, dir) =>
        t(s, dir, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), " +")).as("token"))
          .groupBy(col("token"))
          .agg(count(lit(1)).as("n"), countDistinct(col("doc_id")).as("n_docs"))
          .orderBy("token"),
      Some("""SELECT token, COUNT(*) AS n, COUNT(DISTINCT doc_id) AS n_docs
        FROM (SELECT doc_id, unnest(string_split_regex(trim(text), ' +')) AS token
              FROM documents)
        GROUP BY token ORDER BY token"""),
      "explode/unnest a tokenized column + re-aggregate"),

    QueryDef(
      "q40_rank_family",
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("c_nationkey"))
          .orderBy(col("c_acctbal"), col("c_custkey"))
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_custkey"),
            percent_rank().over(w).as("pr"),
            cume_dist().over(w).as("cd"),
            ntile(4).over(w).cast("long").as("quartile"))
          .orderBy("c_nationkey", "c_custkey")
      },
      Some("""SELECT c_nationkey, c_custkey,
        percent_rank() OVER (PARTITION BY c_nationkey
          ORDER BY c_acctbal, c_custkey) AS pr,
        cume_dist() OVER (PARTITION BY c_nationkey
          ORDER BY c_acctbal, c_custkey) AS cd,
        ntile(4) OVER (PARTITION BY c_nationkey
          ORDER BY c_acctbal, c_custkey) AS quartile
        FROM customer ORDER BY c_nationkey, c_custkey"""),
      "percent_rank / cume_dist / ntile over a fully-deterministic order"),

    QueryDef(
      "q41_sql_grouping_sets",
      (s, dir) => {
        // the engine's SQL entry path: Catalyst parses/plans the statement
        // (GROUPING SETS has no DataFrame-API equivalent)
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        s.sql("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
            CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
            CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
          FROM orders_v
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
          ORDER BY g_status, g_prio,
            o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
        CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
        CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio,
          o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST"""),
      "raw SQL entry path: GROUPING SETS + GROUPING() markers"),

    QueryDef(
      "q29_regex_funcs",
      (s, dir) =>
        t(s, dir, "part")
          .filter(col("p_type").rlike("^(ECONOMY|SMALL)"))
          .select(col("p_partkey"),
            regexp_extract(col("p_name"), "([a-z]+)", 1).as("first_word"),
            regexp_replace(col("p_name"), "[aeiou]", "_").as("devoweled"))
          .orderBy("p_partkey"),
      Some("""SELECT p_partkey,
        regexp_extract(p_name, '([a-z]+)', 1) AS first_word,
        regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled
        FROM part WHERE regexp_matches(p_type, '^(ECONOMY|SMALL)')
        ORDER BY p_partkey"""),
      "regex predicate + extract + global replace (P4 generalization)"),

    QueryDef(
      "q42_salted_skew_agg",
      (s, dir) => {
        // l_returnflag has 3 values over the whole table — the textbook
        // hot-key aggregation. The two-phase salted plan bounds every
        // reducer at ~|table|/nSalts rows where a plain groupBy sends a
        // third of the table to one reducer. DECIMAL partials keep the
        // two-phase sum exact (associative), so the result is bit-equal
        // to the single-phase oracle.
        val src = Tables.t(s, dir, "lineitem")
          .select(col("l_returnflag"),
            col("l_quantity").cast(DecimalType(12, 2)).as("_q"))
        graft.operators.SaltedAgg.saltedSum(
            src, Seq("l_returnflag"), "_q", "qty_sum", nSalts = 32)
          .select(col("l_returnflag"), col("qty_sum").cast("double").as("qty_sum"))
          .orderBy("l_returnflag")
      },
      Some("""SELECT l_returnflag,
        CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS qty_sum
        FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "two-phase salted aggregation over a 3-value hot key, oracle-equal " +
        "to the plain sum (skew mitigation AQE does not cover)"),

    QueryDef(
      "q44_native_topk",
      (s, dir) => {
        // the engine's whole-operator extension tier (§7.3 (c)): a custom
        // LogicalPlan + SparkStrategy + physical bounded-heap operator,
        // same query shape and oracle as q8's window formulation
        graft.plans.TopKPerKey.of(
            Tables.t(s, dir, "orders")
              .select("o_custkey", "o_orderkey", "o_totalprice"),
            Seq("o_custkey"),
            Seq("o_totalprice" -> false, "o_orderkey" -> true), 3)
          .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
          .orderBy("o_custkey", "rk")
      },
      Some("""SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
          SELECT o_custkey, o_orderkey, o_totalprice,
            ROW_NUMBER() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rk
          FROM orders) WHERE rk <= 3
        ORDER BY o_custkey, rk"""),
      "native per-key top-K: custom LogicalPlan + Strategy + bounded-heap " +
        "SparkPlan — O(k) memory per key instead of a full partition sort, " +
        "bit-equal to the q8 window formulation"),

    QueryDef(
      "q50_sql_cte",
      (s, dir) => {
        // SQL entry path, CTE statement: Catalyst inlines the CTE and
        // plans the same two-phase aggregate + join a DataFrame twin
        // would; money math stays DECIMAL until the final cast
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        s.sql("""WITH cust_rev AS (
            SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev,
              COUNT(*) AS n_orders
            FROM orders_v GROUP BY o_custkey)
          SELECT c.c_mktsegment,
            CAST(SUM(r.rev) AS DOUBLE) AS segment_rev,
            CAST(SUM(r.n_orders) AS BIGINT) AS orders_cnt,
            COUNT(*) AS customers
          FROM cust_rev r JOIN customer_v c ON c.c_custkey = r.o_custkey
          GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment""")
      },
      Some("""WITH cust_rev AS (
          SELECT o_custkey, SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS rev,
            COUNT(*) AS n_orders
          FROM orders GROUP BY o_custkey)
        SELECT c.c_mktsegment,
          CAST(CAST(SUM(r.rev) AS VARCHAR) AS DOUBLE) AS segment_rev,
          CAST(SUM(r.n_orders) AS BIGINT) AS orders_cnt,
          COUNT(*) AS customers
        FROM cust_rev r JOIN customer c ON c.c_custkey = r.o_custkey
        GROUP BY c.c_mktsegment ORDER BY c.c_mktsegment"""),
      "raw SQL entry path: CTE statement — per-customer revenue rolled up " +
        "to market segment, decimal-exact"),

    QueryDef(
      "q51_sql_window_subquery",
      (s, dir) => {
        // SQL entry path, window function inside a derived table with an
        // outer rank predicate (the q8 shape, statement form). The order
        // key carries value tiebreaks: the corpus has duplicate
        // (l_orderkey, l_linenumber) rows (SURVEY §7.4), so rank must be
        // total over every emitted column
        t(s, dir, "lineitem").createOrReplaceTempView("lineitem_v")
        s.sql("""SELECT l_orderkey, l_linenumber, l_quantity, rk FROM (
            SELECT l_orderkey, l_linenumber,
              CAST(l_quantity AS DOUBLE) AS l_quantity,
              CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
                ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                  l_quantity) AS BIGINT) AS rk
            FROM lineitem_v) t
          WHERE rk <= 20 ORDER BY rk, l_orderkey, l_linenumber""")
      },
      Some("""SELECT l_orderkey, l_linenumber, l_quantity, rk FROM (
          SELECT l_orderkey, l_linenumber,
            CAST(l_quantity AS DOUBLE) AS l_quantity,
            CAST(ROW_NUMBER() OVER (PARTITION BY l_returnflag
              ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber,
                l_quantity) AS BIGINT) AS rk
          FROM lineitem) t
        WHERE rk <= 20 ORDER BY rk, l_orderkey, l_linenumber"""),
      "raw SQL entry path: windowed derived table + outer rank filter"),

    QueryDef(
      "q52_sql_setops",
      (s, dir) => {
        // SQL entry path, chained set operators with explicit grouping —
        // the q11 family as one statement
        t(s, dir, "customer").createOrReplaceTempView("customer_v")
        t(s, dir, "orders").createOrReplaceTempView("orders_v")
        t(s, dir, "supplier").createOrReplaceTempView("supplier_v")
        s.sql("""SELECT k FROM (
            ((SELECT c_custkey AS k FROM customer_v
                WHERE c_mktsegment = 'BUILDING'
              INTERSECT
              SELECT o_custkey AS k FROM orders_v
                WHERE o_totalprice > 100000)
             UNION
             SELECT s_suppkey + 1000000 AS k FROM supplier_v
               WHERE s_acctbal < 0)
            EXCEPT
            SELECT c_custkey AS k FROM customer_v WHERE c_acctbal < 0) t
          ORDER BY k""")
      },
      Some("""SELECT k FROM (
          ((SELECT c_custkey AS k FROM customer
              WHERE c_mktsegment = 'BUILDING'
            INTERSECT
            SELECT o_custkey AS k FROM orders
              WHERE o_totalprice > 100000)
           UNION
           SELECT s_suppkey + 1000000 AS k FROM supplier
             WHERE s_acctbal < 0)
          EXCEPT
          SELECT c_custkey AS k FROM customer WHERE c_acctbal < 0) t
        ORDER BY k"""),
      "raw SQL entry path: INTERSECT / UNION / EXCEPT chained with " +
        "explicit grouping"),

    QueryDef(
      "q53_schema_evolution",
      (s, dir) => {
        // schema-drift source semantics — the 100 TB-lake reality that
        // yesterday's files lack today's columns. Two deterministic
        // batches are written with DIFFERENT schemas (batch a carries
        // o_totalprice, batch b instead adds o_orderpriority), then read
        // back as ONE table via mergeSchema; absent columns surface as
        // NULL. The aggregate proves both directions of the merge. The
        // oracle replays the SAME files through DuckDB union_by_name —
        // equality checks the merged schema, null-fill, and values.
        val root = "/root/repo/target/graft_schema_evo"
        // drifted batches = ingest fixture — staged once per (session,
        // CURRENT sfDir): the root is shared across sfDirs (the oracle
        // hard-codes the path), so the global "q53" slot tracks which
        // dir the root holds and any dir switch rewrites it; the
        // mergeSchema read is what's measured
        Staging.once(s, "q53", dir, s"$root/b/_SUCCESS") {
          val orders = t(s, dir, "orders")
          orders.filter(col("o_orderkey") % 2 === 0)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_totalprice"))
            .write.mode("overwrite").parquet(s"$root/a")
          orders.filter(col("o_orderkey") % 2 === 1)
            .select(col("o_orderkey"), col("o_custkey"),
              col("o_orderpriority"))
            .write.mode("overwrite").parquet(s"$root/b")
        }
        s.read.option("mergeSchema", "true")
          .parquet(s"$root/a", s"$root/b")
          .groupBy((col("o_custkey") % 7).as("bucket"))
          .agg(count(lit(1)).as("n_rows"),
            count(col("o_totalprice")).as("n_priced"),
            count(col("o_orderpriority")).as("n_prioritized"),
            sum(d2(col("o_totalprice"))).cast("double").as("sum_price"),
            countDistinct(col("o_orderpriority")).as("n_prio_kinds"))
          .orderBy("bucket")
      },
      Some("""SELECT o_custkey % 7 AS bucket,
          COUNT(*) AS n_rows,
          COUNT(o_totalprice) AS n_priced,
          COUNT(o_orderpriority) AS n_prioritized,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS sum_price,
          COUNT(DISTINCT o_orderpriority) AS n_prio_kinds
        FROM read_parquet(
          ['/root/repo/target/graft_schema_evo/a/*.parquet',
           '/root/repo/target/graft_schema_evo/b/*.parquet'],
          union_by_name=true)
        GROUP BY bucket ORDER BY bucket"""),
      "schema-evolution source: two parquet batches with drifted schemas " +
        "merged at scan (mergeSchema ↔ union_by_name), null-fill proven " +
        "both directions"),

    QueryDef(
      "q54_scalable_rownum",
      (s, dir) => {
        // global row numbering WITHOUT the single-reducer window:
        // `ROW_NUMBER() OVER (ORDER BY x)` plans as Exchange
        // SinglePartition — one task sorts the world. The scalable
        // pattern (the zipWithIndex idiom): range-partition by the key,
        // number within each partition, add per-partition offsets. The
        // only driver-side data is ONE count per partition — partition
        // metadata, not rows. localCheckpoint pins the sampled range
        // boundaries so the counts job and the numbering job see the
        // SAME pid assignment (range sampling is seeded per execution).
        import org.apache.spark.sql.expressions.Window
        val parted = t(s, dir, "documents")
          .select(col("doc_id"), col("source"))
          .repartitionByRange(col("doc_id"))
          .withColumn("pid", spark_partition_id())
          .stableCheckpoint()
        val counts = parted.groupBy("pid").agg(count(lit(1)).as("n"))
          .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
        var acc = 0L
        val offsets = counts.map { case (pid, n) =>
          val o = (pid, acc); acc += n; o
        }.toSeq
        import s.implicits._
        val offDf = offsets.toDF("pid", "off")
        val w = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
        parted.join(broadcast(offDf), "pid")
          .withColumn("rid", col("off") + row_number().over(w).cast("long"))
          .select(col("doc_id"), col("rid"))
          .orderBy("doc_id")
      },
      Some("""SELECT doc_id,
          ROW_NUMBER() OVER (ORDER BY doc_id) AS rid
        FROM documents ORDER BY doc_id"""),
      "scalable global row numbering: range partition + within-partition " +
        "row_number + per-partition offsets — equals the single-reducer " +
        "ROW_NUMBER() OVER (ORDER BY ...) with no SinglePartition exchange"),

    QueryDef(
      "q56_sql_pivot",
      (s, dir) => {
        // SQL entry path, PIVOT clause — q17's relational pivot as a
        // statement. Explicit IN values keep the column set static at
        // plan time (no distinct-collection job); absent (day, type)
        // combinations surface as NULL from PIVOT and are coalesced to 0
        // like the DataFrame twin's na.fill.
        Tables.events(s, dir).createOrReplaceTempView("events_v")
        s.sql("""SELECT day,
            COALESCE(click, 0) AS click, COALESCE(error, 0) AS error,
            COALESCE(purchase, 0) AS purchase, COALESCE(signup, 0) AS signup,
            COALESCE(view, 0) AS view
          FROM (SELECT date_trunc('day', ts) AS day, event_type FROM events_v)
          PIVOT (COUNT(*) FOR event_type
            IN ('click' AS click, 'error' AS error, 'purchase' AS purchase,
                'signup' AS signup, 'view' AS view))
          ORDER BY day""")
      },
      Some("""SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
          CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS click,
          CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS error,
          CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS purchase,
          CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS signup,
          CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS "view"
        FROM events GROUP BY 1 ORDER BY day"""),
      "raw SQL entry path: PIVOT clause with explicit IN values " +
        "(statement twin of q17)"),

    QueryDef(
      "q57_sql_lateral",
      (s, dir) => {
        // SQL entry path, LATERAL VIEW explode — the UDTF-shaped surface
        // as a statement (per-doc token frequencies, HAVING-filtered).
        // Same explode→partial-agg plan as the DataFrame form; the
        // generator runs inside the scan stage.
        t(s, dir, "documents").createOrReplaceTempView("documents_v")
        s.sql("""SELECT doc_id, tok AS w, COUNT(*) AS c
          FROM documents_v
          LATERAL VIEW explode(split(trim(text), ' +')) tks AS tok
          GROUP BY doc_id, tok HAVING COUNT(*) >= 5
          ORDER BY doc_id, w""")
      },
      Some("""SELECT doc_id, w, COUNT(*) AS c
        FROM (SELECT doc_id,
                unnest(string_split_regex(trim(text), ' +')) AS w
              FROM documents)
        GROUP BY doc_id, w HAVING COUNT(*) >= 5
        ORDER BY doc_id, w"""),
      "raw SQL entry path: LATERAL VIEW explode (UDTF surface) with " +
        "grouped HAVING over the generated rows"),

    QueryDef(
      "q58_merge_upsert",
      (s, dir) => {
        // CDC merge/upsert (the MERGE INTO shape without a table format):
        // apply a deterministic change set — updates (key%10=3, price
        // +1000), deletes (key%10=7), inserts (fresh keys, key%10=5) —
        // onto the orders base via ONE full-outer join on the key.
        // Update/insert/delete all resolve as column expressions over
        // the join, so the whole merge is a single shuffle on the join
        // key (broadcast when the change set is small; AQE splits skew).
        // Money stays DECIMAL end-to-end; cast to double only at output.
        val base = t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
            d2(col("o_totalprice")).as("p"))
        val changes =
          base.filter(col("k") % 10 === 3)
            .select(col("k"), lit("U").as("op"),
              (col("p") + lit(1000)).cast(DecimalType(12, 2)).as("np"))
          .unionAll(base.filter(col("k") % 10 === 7)
            .select(col("k"), lit("D").as("op"),
              lit(null).cast(DecimalType(12, 2)).as("np")))
          .unionAll(base.filter(col("k") % 10 === 5)
            .select((col("k") + 10000000L).as("k"), lit("I").as("op"),
              lit(BigDecimal("42.00")).cast(DecimalType(12, 2)).as("np")))
        base.join(changes, Seq("k"), "full_outer")
          .filter(col("op").isNull || col("op") =!= "D")
          .select(col("k").as("o_orderkey"),
            coalesce(col("c"), lit(-1L)).as("o_custkey"),
            when(col("op").isin("U", "I"), col("np")).otherwise(col("p"))
              .cast("double").as("price"))
          .orderBy("o_orderkey")
      },
      Some("""WITH base AS (
          SELECT o_orderkey AS k, o_custkey AS c,
            CAST(o_totalprice AS DECIMAL(12,2)) AS p
          FROM orders),
        changes AS (
          SELECT k, 'U' AS op, CAST(p + 1000 AS DECIMAL(12,2)) AS np
          FROM base WHERE k % 10 = 3
          UNION ALL
          SELECT k, 'D', NULL FROM base WHERE k % 10 = 7
          UNION ALL
          SELECT k + 10000000, 'I', CAST(42.00 AS DECIMAL(12,2))
          FROM base WHERE k % 10 = 5)
        SELECT COALESCE(b.k, ch.k) AS o_orderkey,
          COALESCE(b.c, -1) AS o_custkey,
          CAST(CASE WHEN ch.op IN ('U', 'I') THEN ch.np ELSE b.p END
            AS DOUBLE) AS price
        FROM base b FULL OUTER JOIN changes ch ON b.k = ch.k
        WHERE ch.op IS NULL OR ch.op <> 'D'
        ORDER BY o_orderkey"""),
      "CDC merge/upsert: update + delete + insert change set applied in " +
        "ONE full-outer join (the MERGE INTO shape) — single shuffle on " +
        "the merge key"),

    QueryDef(
      "q59_zorder",
      (s, dir) =>
        t(s, dir, "lineitem")
          .select(col("l_partkey"), col("l_suppkey"),
            graft.functions.ZOrder.zvalue(col("l_partkey"), col("l_suppkey"))
              .as("z"))
          .orderBy("z", "l_partkey", "l_suppkey")
          .limit(2000),
      Some(s"""SELECT l_partkey, l_suppkey,
          CAST(${graft.functions.ZOrder.zvalueSql("l_partkey", "l_suppkey")}
            AS BIGINT) AS z
        FROM lineitem
        ORDER BY z, l_partkey, l_suppkey LIMIT 2000"""),
      "z-order (Morton) curve value over two keys — the multi-dimensional " +
        "data-skipping layout primitive (ZOrderSpec measures the per-file " +
        "min/max tightening); identical 32-term bit-interleave on both " +
        "engines, global top slice via TakeOrderedAndProject"),

    QueryDef(
      "q60_sql_unpivot",
      (s, dir) => {
        // SQL entry path, UNPIVOT clause: the wide→long inverse of q56's
        // PIVOT, as one statement round-trip. The dense zero cells the
        // pivot materialized survive the unpivot (they are 0, not NULL —
        // UNPIVOT drops only NULLs), so the output is the DENSE long
        // form: every (day, type) combination, the reference's 0-filled
        // grid semantics (bigbugdata.py:289–291) in statement form.
        Tables.events(s, dir).createOrReplaceTempView("events_v")
        s.sql("""SELECT day, event_type, n FROM (
            SELECT day,
              COALESCE(click, 0) AS click, COALESCE(error, 0) AS error,
              COALESCE(purchase, 0) AS purchase,
              COALESCE(signup, 0) AS signup, COALESCE(view, 0) AS view
            FROM (SELECT date_trunc('day', ts) AS day, event_type
                  FROM events_v)
            PIVOT (COUNT(*) FOR event_type
              IN ('click' AS click, 'error' AS error, 'purchase' AS purchase,
                  'signup' AS signup, 'view' AS view)))
          UNPIVOT (n FOR event_type
            IN (click, error, purchase, signup, view))
          ORDER BY day, event_type""")
      },
      Some("""WITH c AS (
          SELECT date_trunc('day', CAST(ts AS TIMESTAMP)) AS day,
            event_type, COUNT(*) AS n
          FROM events GROUP BY 1, 2),
        days AS (SELECT DISTINCT day FROM c),
        types AS (SELECT unnest(
          ['click','error','purchase','signup','view']) AS event_type)
        SELECT d.day, t.event_type, COALESCE(c.n, 0) AS n
        FROM days d CROSS JOIN types t
        LEFT JOIN c ON c.day = d.day AND c.event_type = t.event_type
        ORDER BY d.day, t.event_type"""),
      "raw SQL entry path: PIVOT→UNPIVOT round-trip — the dense 0-filled " +
        "long grid (reference A2 semantics) as one statement"),

    QueryDef(
      "q61_json_source",
      (s, dir) => {
        // JSON-lines source coverage (the landing-zone format every lake
        // ingests before parquet): a deterministic events slice is
        // written as newline-delimited JSON, read back with an EXPLICIT
        // schema (schema-on-read; no inference job at 100 TB), and
        // aggregated. The oracle replays DuckDB read_json over the SAME
        // files, so the JSON round-trip itself (double shortest-repr,
        // string escaping, embedded-JSON passthrough) is what's checked.
        // Timestamps travel as micros (BIGINT) — JSON has no timestamp
        // type; encoding explicitly beats engine-specific string formats.
        val root = Extended.jsonStageDir(dir)
        Tables.events(s, dir)
          .select(col("event_id"), unix_micros(col("ts")).as("ts_us"),
            col("user_id"), col("event_type"), col("value"), col("props"))
          .write.mode("overwrite").json(root)
        s.read
          .schema("event_id BIGINT, ts_us BIGINT, user_id BIGINT, " +
            "event_type STRING, value DOUBLE, props STRING")
          .json(root)
          .groupBy("event_type")
          .agg(count(lit(1)).as("n"),
            sum(d2(col("value"))).cast("double").as("total_value"),
            min(col("ts_us")).as("first_us"),
            max(col("ts_us")).as("last_us"),
            count(get_json_object(col("props"), "$.k")).as("n_with_k"))
          .orderBy("event_type")
      },
      Some("""SELECT event_type, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS total_value,
          MIN(ts_us) AS first_us, MAX(ts_us) AS last_us,
          COUNT(json_extract_string(props, '$.k')) AS n_with_k
        FROM read_json('__GRAFT_JSON_STAGE__/*.json',
          format='newline_delimited',
          columns={'event_id':'BIGINT','ts_us':'BIGINT','user_id':'BIGINT',
                   'event_type':'VARCHAR','value':'DOUBLE','props':'VARCHAR'})
        GROUP BY event_type ORDER BY event_type"""),
      "JSON-lines source: write → schema-on-read scan → aggregate, " +
        "oracled by DuckDB read_json over the SAME files (round-trip of " +
        "doubles, escaping, embedded JSON)"),

    QueryDef(
      "q62_sql_recursive",
      (s, dir) => {
        // WITH RECURSIVE (new in Spark 4): ancestor-chain walk over the
        // implicit binary-tree hierarchy parent(n) = n div 2 — the
        // org-chart / BOM / reachability query class that previously
        // forced driver-side iteration (ConnectedComponents) or an
        // external engine. Depth is log2(n): the recursion runs ~13
        // rounds at sf0.1, each a distributed self-join of the frontier.
        t(s, dir, "documents").createOrReplaceTempView("documents_v")
        s.sql("""WITH RECURSIVE chain (doc_id, cur, depth) AS (
            SELECT doc_id, doc_id, 0 FROM documents_v
            UNION ALL
            SELECT doc_id, cur DIV 2, depth + 1 FROM chain WHERE cur > 0)
          SELECT doc_id, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
            COUNT(*) AS chain_len
          FROM chain GROUP BY doc_id ORDER BY doc_id""")
      },
      Some("""WITH RECURSIVE chain (doc_id, cur, depth) AS (
          SELECT doc_id, doc_id, 0 FROM documents
          UNION ALL
          SELECT doc_id, cur // 2, depth + 1 FROM chain WHERE cur > 0)
        SELECT doc_id, CAST(MAX(depth) AS BIGINT) AS depth_to_root,
          COUNT(*) AS chain_len
        FROM chain GROUP BY doc_id ORDER BY doc_id"""),
      "raw SQL entry path: WITH RECURSIVE ancestor-chain walk (binary-" +
        "tree hierarchy, log-depth recursion) — Spark 4's recursive CTE " +
        "vs DuckDB's"),

    QueryDef(
      "q63_gap_fill",
      (s, dir) => {
        // time-series forward fill: carry the last non-null observation
        // forward per entity (the sensor/metrics gap-fill every
        // observability pipeline runs). Deterministic gaps are punched
        // first (event_id % 5). last_value(ignoreNulls) over a running
        // frame — one shuffle on the entity key, running-frame execution
        // is a single pass per partition.
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, dir)
          .withColumn("v",
            when(col("event_id") % 5 === 0, lit(null).cast("double"))
              .otherwise(col("value")))
          .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
          .select(col("event_id"), col("user_id"), col("v"), col("filled"))
          .orderBy("event_id")
      },
      Some("""SELECT event_id, user_id, v,
          LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY user_id
            ORDER BY CAST(ts AS TIMESTAMP), event_id
            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        FROM (SELECT *,
            CASE WHEN event_id % 5 = 0 THEN NULL ELSE value END AS v
          FROM events)
        ORDER BY event_id"""),
      "time-series forward fill: last_value(IGNORE NULLS) over a running " +
        "frame per entity — the observability gap-fill operator"),

    QueryDef(
      "q64_profile",
      (s, dir) => {
        // data profiling (the data-quality sweep every pipeline runs
        // before training on a new drop): per-column row/null/distinct
        // counts and min/max. Two plan shapes were measured at sf0.1:
        //   - everything in ONE aggregate: the exact multi-column
        //     count_distinct plans as Expand (one replica per distinct
        //     column = 7x rows) + a 7-key SortAggregate — 8.7 s, the
        //     single most expensive query in the whole catalog, and the
        //     sort grows with data x columns at scale. Rejected.
        //   - here: one no-distinct stats pass (counts/min/max for all
        //     columns, single 1-row HashAggregate) + one two-phase
        //     hash-distinct aggregate PER column (partial dedup
        //     map-side, no Expand, no wide sort), stitched by a 6-row
        //     broadcast join — 1.15 s. Columnar IO makes the per-column
        //     passes read each column exactly once, so total bytes
        //     scanned match the one-pass shape; only the scan COUNT
        //     differs. At 100 TB, approx_count_distinct per column
        //     collapses this back to one pass when estimates suffice
        //     (q21 is the sketch-tier precedent).
        // Columns profiled are types whose string casts are engine-
        // portable (ints, date, varchar); a deterministically punched
        // nullable column makes the null accounting load-bearing.
        val cols = Seq("l_orderkey", "l_linenumber", "l_shipdate_d",
          "l_returnflag", "l_linestatus", "ship_nullable")
        val li = t(s, dir, "lineitem")
          .withColumn("l_shipdate_d", col("l_shipdate").cast("date"))
          .withColumn("ship_nullable",
            when(col("l_linenumber") % 7 === 0, lit(null).cast("string"))
              .otherwise(col("l_linestatus")))
        val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
          count(col(c)).as(s"${c}_nn"),
          min(col(c)).cast("string").as(s"${c}_min"),
          max(col(c)).cast("string").as(s"${c}_max")))
        val stats = li.agg(aggs.head, aggs.tail: _*)
          .selectExpr("n_rows",
            s"stack(${cols.size}, " + cols.map(c =>
              s"'$c', ${c}_nn, ${c}_min, ${c}_max").mkString(", ") +
              ") as (column_name, n_non_null, min_str, max_str)")
        val distincts = cols.map { c =>
          li.select(col(c)).where(col(c).isNotNull).distinct()
            .agg(count(lit(1)).as("n_distinct"))
            .select(lit(c).as("column_name"), col("n_distinct"))
        }.reduce(_ unionAll _)
        stats.join(broadcast(distincts), "column_name")
          .select(col("column_name"), col("n_rows"),
            (col("n_rows") - col("n_non_null")).as("n_null"),
            col("n_distinct"), col("min_str"), col("max_str"))
          .orderBy("column_name")
      },
      Some("""WITH src AS (
          SELECT *, CAST(l_shipdate AS DATE) AS l_shipdate_d,
            CASE WHEN l_linenumber % 7 = 0 THEN NULL
            ELSE l_linestatus END AS ship_nullable FROM lineitem),
        a AS (SELECT COUNT(*) AS n_rows,
          COUNT(l_orderkey) AS c1n, COUNT(DISTINCT l_orderkey) AS c1d,
            CAST(MIN(l_orderkey) AS VARCHAR) AS c1mn, CAST(MAX(l_orderkey) AS VARCHAR) AS c1mx,
          COUNT(l_linenumber) AS c2n, COUNT(DISTINCT l_linenumber) AS c2d,
            CAST(MIN(l_linenumber) AS VARCHAR) AS c2mn, CAST(MAX(l_linenumber) AS VARCHAR) AS c2mx,
          COUNT(l_shipdate_d) AS c3n, COUNT(DISTINCT l_shipdate_d) AS c3d,
            CAST(MIN(l_shipdate_d) AS VARCHAR) AS c3mn, CAST(MAX(l_shipdate_d) AS VARCHAR) AS c3mx,
          COUNT(l_returnflag) AS c4n, COUNT(DISTINCT l_returnflag) AS c4d,
            MIN(l_returnflag) AS c4mn, MAX(l_returnflag) AS c4mx,
          COUNT(l_linestatus) AS c5n, COUNT(DISTINCT l_linestatus) AS c5d,
            MIN(l_linestatus) AS c5mn, MAX(l_linestatus) AS c5mx,
          COUNT(ship_nullable) AS c6n, COUNT(DISTINCT ship_nullable) AS c6d,
            MIN(ship_nullable) AS c6mn, MAX(ship_nullable) AS c6mx
          FROM src)
        SELECT column_name, n_rows, n_rows - n_non_null AS n_null,
          n_distinct, min_str, max_str FROM (
          SELECT 'l_orderkey' AS column_name, n_rows, c1n AS n_non_null,
            c1d AS n_distinct, c1mn AS min_str, c1mx AS max_str FROM a
          UNION ALL SELECT 'l_linenumber', n_rows, c2n, c2d, c2mn, c2mx FROM a
          UNION ALL SELECT 'l_shipdate_d', n_rows, c3n, c3d, c3mn, c3mx FROM a
          UNION ALL SELECT 'l_returnflag', n_rows, c4n, c4d, c4mn, c4mx FROM a
          UNION ALL SELECT 'l_linestatus', n_rows, c5n, c5d, c5mn, c5mx FROM a
          UNION ALL SELECT 'ship_nullable', n_rows, c6n, c6d, c6mn, c6mx FROM a)
        ORDER BY column_name"""),
      "single-scan data profiling: per-column null/distinct/min/max for " +
        "six columns in ONE aggregate pass, stacked to long format on " +
        "the 1-row result — the pre-training data-quality sweep"),

    QueryDef(
      "q65_compaction",
      (s, dir) => {
        // small-files compaction (table maintenance at 100 TB: streaming
        // ingest leaves KB-scale files whose open/footer cost dominates
        // scans). A 64-small-file landing zone is simulated from
        // lineitem, compacted to ceil(bytes / 8 MB) files via a
        // shuffle-free coalesce (graft.io.Compaction), and the
        // verification frame aggregates the COMPACTED copy — the oracle
        // computes the same frame from the ORIGINAL table, so any row
        // lost, duplicated, or corrupted by the rewrite diverges it.
        // Staging is keyed to the SF dir (same discipline as q61).
        val root = s"/root/repo/target/graft_compact_${
          Integer.toHexString(dir.hashCode)}"
        // The 64-small-file landing zone is FIXTURE, not the operator
        // under test — write it once per (session, sfDir) (same
        // memoization discipline as E2E.writeAndRead); the compaction
        // rewrite itself still runs on every invocation.
        val staged = Extended.compactZones.computeIfAbsent(s,
          _ => java.util.Collections.synchronizedSet(
            new java.util.HashSet[String]()))
        if (!staged.contains(dir)
            || !java.nio.file.Files.exists(
              java.nio.file.Paths.get(s"$root/small"))) {
          t(s, dir, "lineitem")
            .select(col("l_orderkey"), col("l_linenumber"),
              col("l_returnflag"), col("l_linestatus"),
              col("l_quantity"), col("l_extendedprice"), col("l_shipdate"))
            .repartition(64) // simulate the many-small-files landing zone
            .write.mode("overwrite").parquet(s"$root/small")
          staged.add(dir)
        }
        graft.io.Compaction.compact(
          s, s"$root/small", s"$root/compacted", targetBytes = 8L << 20)
        s.read.parquet(s"$root/compacted")
          .groupBy(col("l_returnflag"), col("l_linestatus"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_orderkey")).as("key_sum"),
            sum(d2(col("l_quantity"))).cast("double").as("qty_sum"),
            sum(d2(col("l_extendedprice"))).cast("double").as("price_sum"),
            min(col("l_shipdate")).as("min_ship"),
            max(col("l_shipdate")).as("max_ship"))
          .orderBy("l_returnflag", "l_linestatus")
      },
      Some("""SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
          CAST(SUM(l_orderkey) AS BIGINT) AS key_sum,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS qty_sum,
          CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS price_sum,
          MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
        FROM lineitem GROUP BY l_returnflag, l_linestatus
        ORDER BY l_returnflag, l_linestatus"""),
      "small-files compaction: simulated 64-file landing zone -> " +
        "shuffle-free coalesce rewrite to byte-targeted files -> " +
        "content-preservation oracle (compacted aggregate == original " +
        "table aggregate)"),

    QueryDef(
      "q66_metadata_agg",
      (s, dir) => {
        // footer-only aggregation: COUNT/MIN/MAX answered from parquet
        // file METADATA (row-group statistics), zero data pages read —
        // at 100 TB the difference between a full scan and a
        // metadata-only pass is the whole job. Spark's parquet
        // aggregate pushdown lives on the DSv2 read path, so the query
        // runs on a cloned session (own conf, shared catalog/cache)
        // with parquet removed from useV1SourceList and
        // parquet.aggregatePushdown on — the parent session's plans
        // are untouched. PlanSpec pins `PushedAggregation` in the scan;
        // types stay within pushdown support (int64/double — timestamp
        // and decimal statistics are not eligible).
        val s2 = s.newSession()
        s2.conf.set("spark.sql.sources.useV1SourceList",
          "avro,csv,json,kafka,orc,text")
        s2.conf.set("spark.sql.parquet.aggregatePushdown", "true")
        s2.read.parquet(s"$dir/lineitem.parquet")
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_orderkey")).as("min_key"),
            max(col("l_orderkey")).as("max_key"),
            min(col("l_quantity")).as("min_qty"),
            max(col("l_quantity")).as("max_qty"))
      },
      Some("""SELECT COUNT(*) AS n_rows,
          MIN(l_orderkey) AS min_key, MAX(l_orderkey) AS max_key,
          MIN(l_quantity) AS min_qty, MAX(l_quantity) AS max_qty
        FROM lineitem"""),
      "parquet aggregate pushdown: COUNT/MIN/MAX answered from " +
        "row-group statistics in file footers (PushedAggregation in " +
        "the scan, zero data pages) — metadata-only table stats at " +
        "any scale"),

    QueryDef(
      "q67_snapshot_diff",
      (s, dir) => {
        // snapshot diff — the audit companion to q58's CDC merge: given
        // two versions of a table, report what was added, removed, or
        // changed (one full-outer equi-join on the key; at 100 TB both
        // sides shuffle-partition on the key and the diff is linear).
        // Versions are derived deterministically from orders: v1 drops
        // keys ≡3 (mod 11), v2 drops keys ≡5 (mod 13) and bumps the
        // price on keys ≡0 (mod 7) — so all three verdicts (and the
        // suppressed `unchanged` majority) are exercised. Unchanged
        // rows are filtered out BEFORE the result materializes: a diff
        // over 10^11 rows must emit only the delta.
        val o = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            col("o_totalprice"), col("o_orderstatus"))
        val v1 = o.filter(pmod(col("o_orderkey"), lit(11)) =!= 3)
        val v2 = o.filter(pmod(col("o_orderkey"), lit(13)) =!= 5)
          .withColumn("o_totalprice",
            when(pmod(col("o_orderkey"), lit(7)) === 0,
              col("o_totalprice") + 1.0).otherwise(col("o_totalprice")))
        val a = v1.select(col("o_orderkey").as("k"),
          col("o_custkey").as("cust_a"), col("o_totalprice").as("price_a"),
          col("o_orderstatus").as("st_a"))
        val b = v2.select(col("o_orderkey").as("k"),
          col("o_custkey").as("cust_b"), col("o_totalprice").as("price_b"),
          col("o_orderstatus").as("st_b"))
        a.join(b, Seq("k"), "full_outer")
          .withColumn("status",
            when(col("cust_a").isNull, "added")
              .when(col("cust_b").isNull, "removed")
              .when(col("price_a") =!= col("price_b")
                || col("cust_a") =!= col("cust_b")
                || col("st_a") =!= col("st_b"), "changed")
              .otherwise("unchanged"))
          .filter(col("status") =!= "unchanged")
          .select(col("k").as("o_orderkey"), col("status"),
            col("price_a").as("old_price"), col("price_b").as("new_price"))
          .orderBy("o_orderkey")
      },
      Some("""WITH v1 AS (
          SELECT o_orderkey, o_custkey, o_totalprice, o_orderstatus
          FROM orders WHERE o_orderkey % 11 <> 3),
        v2 AS (
          SELECT o_orderkey, o_custkey,
            CASE WHEN o_orderkey % 7 = 0 THEN o_totalprice + 1.0
                 ELSE o_totalprice END AS o_totalprice,
            o_orderstatus
          FROM orders WHERE o_orderkey % 13 <> 5),
        d AS (
          SELECT COALESCE(a.o_orderkey, b.o_orderkey) AS o_orderkey,
            CASE WHEN a.o_orderkey IS NULL THEN 'added'
                 WHEN b.o_orderkey IS NULL THEN 'removed'
                 WHEN a.o_totalprice <> b.o_totalprice
                   OR a.o_custkey <> b.o_custkey
                   OR a.o_orderstatus <> b.o_orderstatus THEN 'changed'
                 ELSE 'unchanged' END AS status,
            a.o_totalprice AS old_price, b.o_totalprice AS new_price
          FROM v1 a FULL OUTER JOIN v2 b ON a.o_orderkey = b.o_orderkey)
        SELECT o_orderkey, status, old_price, new_price
        FROM d WHERE status <> 'unchanged' ORDER BY o_orderkey"""),
      "snapshot diff between two table versions: one full-outer " +
        "equi-join on the key, added/removed/changed verdicts, " +
        "unchanged majority suppressed before materialization"),

    QueryDef(
      "q68_incremental_agg",
      (s, dir) => {
        // incremental aggregate maintenance — the materialized-view
        // move: at 100 TB you never recompute a per-key aggregate from
        // scratch when a delta batch lands; you aggregate the DELTA
        // (batch-sized) and merge it into yesterday's aggregate
        // (key-cardinality-sized) with one full-outer equi-join.
        // COUNT/SUM merge by addition (DECIMAL, exact); the oracle IS
        // the invariant: DuckDB recomputes the same aggregate from the
        // FULL table, so any key lost or double-merged diverges.
        // Yesterday/today split is deterministic: keys ≡7 (mod 10)
        // form today's batch.
        val o = t(s, dir, "orders")
          .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
        def agg(df: DataFrame) = df.groupBy("o_custkey")
          .agg(count(lit(1)).as("n"), sum(d2(col("o_totalprice"))).as("tot"))
        val base = agg(o.filter(pmod(col("o_orderkey"), lit(10)) =!= 7))
        val delta = agg(o.filter(pmod(col("o_orderkey"), lit(10)) === 7))
          .withColumnRenamed("n", "dn").withColumnRenamed("tot", "dtot")
        base.join(delta, Seq("o_custkey"), "full_outer")
          .select(col("o_custkey"),
            (coalesce(col("n"), lit(0L)) + coalesce(col("dn"), lit(0L)))
              .as("n_orders"),
            (coalesce(col("tot"), lit(0).cast(DecimalType(22, 2)))
              + coalesce(col("dtot"), lit(0).cast(DecimalType(22, 2))))
              .cast("double").as("total_price"))
          .orderBy("o_custkey")
      },
      Some("""SELECT o_custkey, COUNT(*) AS n_orders,
          CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS VARCHAR)
            AS DOUBLE) AS total_price
        FROM orders GROUP BY o_custkey ORDER BY o_custkey"""),
      "incremental aggregate maintenance: delta-batch aggregate merged " +
        "into the standing per-key aggregate via one full-outer " +
        "equi-join — the oracle recomputes from scratch, proving " +
        "incremental == full"),

    QueryDef(
      "q75_approx_quantile",
      (s, dir) => {
        // Greenwald-Khanna approximate quantiles — with q21's HLL the
        // second sketch workhorse at 100 TB: exact percentiles (q47)
        // need a full sort per group; the GK sketch is one pass,
        // mergeable across partitions, with a RANK-error guarantee
        // (≤ n/accuracy; accuracy=10000 → ±0.01% rank). The sketch
        // values themselves have no DuckDB twin, so the query VERIFIES
        // the guarantee in-frame and emits it as a deterministic
        // verdict the oracle asserts (the q21 bucketed-verdict
        // pattern): for each fixed probe (p50/p95/p99) the returned
        // element's rank interval [count(<v)+1, count(<=v)] must
        // overlap the target rank ± n/accuracy. One broadcast of 9
        // probe rows + one group-local pass computes the ranks — no
        // sort, no self-shuffle. CatalogSpec keeps the raw bound pin.
        val acc = 10000
        val li = t(s, dir, "lineitem")
          .select(col("l_returnflag"), col("l_extendedprice"))
        val probeRows = li.groupBy(col("l_returnflag"))
          .agg(percentile_approx(col("l_extendedprice"),
              array(lit(0.5), lit(0.95), lit(0.99)), lit(acc))
              .as("vals"),
            count(lit(1)).as("n"))
          .select(col("l_returnflag"), col("n"), explode(array(
            struct(lit("p50").as("probe"), lit(0.5).as("q"),
              col("vals").getItem(0).as("v")),
            struct(lit("p95").as("probe"), lit(0.95).as("q"),
              col("vals").getItem(1).as("v")),
            struct(lit("p99").as("probe"), lit(0.99).as("q"),
              col("vals").getItem(2).as("v")))).as("z"))
          .select(col("l_returnflag"), col("n"),
            col("z.probe").as("probe"), col("z.q").as("q"),
            col("z.v").as("v"))
        li.join(broadcast(probeRows), "l_returnflag")
          .groupBy(col("l_returnflag"), col("probe"), col("q"),
            col("v"), col("n"))
          .agg(sum(when(col("l_extendedprice") < col("v"), 1L)
              .otherwise(0L)).as("lo"),
            sum(when(col("l_extendedprice") <= col("v"), 1L)
              .otherwise(0L)).as("hi"))
          .select(col("l_returnflag"), col("probe"), col("n"),
            when(col("q") * col("n") >= col("lo") - (col("n") / acc + 1)
                && col("q") * col("n") <= col("hi") + (col("n") / acc + 1),
              lit(1)).otherwise(lit(0)).as("within_bound"))
          .orderBy("l_returnflag", "probe")
      },
      Some("""SELECT l.l_returnflag, p.probe, COUNT(*) AS n,
          1 AS within_bound
        FROM lineitem l
        CROSS JOIN (VALUES ('p50'), ('p95'), ('p99')) p(probe)
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      "Greenwald-Khanna approximate quantiles (one-pass, mergeable, " +
        "rank-error <= n/accuracy) under a bucketed-verdict oracle: " +
        "the rank-error guarantee is verified in-frame per probe and " +
        "the oracle asserts the verdict; CatalogSpec keeps the raw pin"),

    QueryDef(
      "q78_winsorize",
      (s, dir) => {
        // Winsorized (outlier-clipped) aggregation: per group, clamp
        // every price into [p10, p90] before averaging — the robust-mean
        // move for corpora with fat tails. Percentiles are DISCRETE
        // rank selections (the ceil(q*n)-th smallest actual value), not
        // interpolations: the cut is an existing 2-decimal value, so the
        // clamped column stays DECIMAL-exact and the sum is
        // order-independent. Rank indices use pure integer arithmetic
        // ((n+9) div 10, (9n+9) div 10) so both engines pick the
        // identical element — no double rounding at the boundary.
        // Scale shape: the rank pick is DISTRIBUTED (RankSelect: value
        // histogram → range partitions → prefix offsets → bounded
        // per-chunk windows) — the group cardinality is 3, so a
        // per-group sort window would put a third of the corpus through
        // one task; then a 3-row broadcast of the cuts and a plain
        // partial-final aggregate over the clamped column.
        val pr = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
            d2(col("l_extendedprice")).as("p"))
        // ONE corpus pass: the checkpointed value histogram feeds both
        // the group sizes (percentile indices) and the rank selection —
        // everything after this line is histogram-sized.
        val hist = graft.operators.RankSelect.histogram(pr, "rf", "p")
          .stableCheckpoint()
        val sz = hist.groupBy("rf").agg(sum(col("_c")).as("n"))
        val targets = sz
          .select(col("rf"), expr("(n + 9) div 10").as("k"),
            lit("lo").as("which"))
          .union(sz.select(col("rf"), expr("(9 * n + 9) div 10").as("k"),
            lit("hi").as("which")))
        val cuts = graft.operators.RankSelect
          .valueAtRanksFromHist(hist,
            graft.operators.RankSelect.inputBytes(pr), "rf", "p", targets)
          .groupBy("rf")
          .agg(
            max(when(col("which") === "lo", col("p"))).as("lo"),
            max(when(col("which") === "hi", col("p"))).as("hi"))
        // round 16: aggregate off the CHECKPOINTED HISTOGRAM, not the
        // corpus — sum(clamp(p)) over rows == sum(clamp(p) · _c) over
        // the (rf, p, _c) histogram, exactly (DECIMAL × BIGINT is
        // exact and decimal addition is order-free), and
        // count(*) == sum(_c). This removes the query's SECOND corpus
        // scan + corpus-side broadcast join: the whole query is now
        // genuinely ONE pass over the data (the histogram build) plus
        // histogram-sized work. Oracle unchanged (it computes the same
        // sum from the rows); re-gated bit-exact.
        hist.join(broadcast(cuts), "rf")
          .withColumn("w", greatest(col("lo"), least(col("hi"), col("p"))))
          .groupBy("rf")
          .agg(sum(col("_c")).as("n_rows"),
            max(col("lo")).cast("double").as("p10"),
            max(col("hi")).cast("double").as("p90"),
            sum(col("w") * col("_c")).cast("double").as("win_sum"))
          .withColumn("win_mean", col("win_sum") / col("n_rows"))
          .select(col("rf").as("l_returnflag"), col("n_rows"),
            col("p10"), col("p90"), col("win_sum"), col("win_mean"))
          .orderBy("l_returnflag")
      },
      Some("""WITH pr AS (SELECT l_returnflag AS rf,
            CAST(l_extendedprice AS DECIMAL(12,2)) AS p FROM lineitem),
        sz AS (SELECT rf, COUNT(*) AS n FROM pr GROUP BY 1),
        rk AS (SELECT rf, p,
            ROW_NUMBER() OVER (PARTITION BY rf ORDER BY p) AS rn FROM pr),
        cuts AS (SELECT rk.rf,
            MAX(CASE WHEN rn = (n + 9) // 10 THEN p END) AS lo,
            MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN p END) AS hi
          FROM rk JOIN sz USING (rf) GROUP BY 1)
        SELECT pr.rf AS l_returnflag, MAX(sz.n) AS n_rows,
          CAST(CAST(MAX(lo) AS VARCHAR) AS DOUBLE) AS p10,
          CAST(CAST(MAX(hi) AS VARCHAR) AS DOUBLE) AS p90,
          -- clamp via CASE, not GREATEST/LEAST: DuckDB's GREATEST
          -- promotes DECIMAL to DOUBLE, which would break the exact sum
          CAST(CAST(SUM(CASE WHEN p < lo THEN lo WHEN p > hi THEN hi
                             ELSE p END) AS VARCHAR) AS DOUBLE) AS win_sum,
          CAST(CAST(SUM(CASE WHEN p < lo THEN lo WHEN p > hi THEN hi
                             ELSE p END) AS VARCHAR) AS DOUBLE)
            / MAX(sz.n) AS win_mean
        FROM pr
        JOIN cuts USING (rf)
        JOIN sz USING (rf)
        GROUP BY pr.rf
        ORDER BY l_returnflag"""),
      "winsorized mean per group: discrete p10/p90 rank selection " +
        "(integer index math, identical element both engines), clamp in " +
        "DECIMAL, order-independent exact sum — robust aggregation " +
        "without losing oracle bit-exactness"),

    QueryDef(
      "q80_nullsafe_join",
      (s, dir) => {
        // Null-safe equality join (<=> / IS NOT DISTINCT FROM): the one
        // join-predicate semantic the rest of the catalog never
        // exercises. Plain `=` silently DROPS null keys from an inner
        // join; in a pipeline where null is a real key value (unknown
        // source, unparseable date bucket), the null groups must match
        // each other. Both sides bucket their keys with nullif(k % 7, 0)
        // so the null group is populated and load-bearing — the oracle
        // row count differs from the `=` version by exactly the null
        // match. Spark's <=> still plans as a hash join (null-safe
        // equality is hashable); PlanSpec pins no nested loop.
        val ord = t(s, dir, "orders")
          .groupBy(nullif(col("o_custkey") % 7, lit(0)).as("k"))
          .agg(count(lit(1)).as("orders_n"))
        val cust = t(s, dir, "customer")
          .groupBy(nullif(col("c_custkey") % 7, lit(0)).as("k"))
          .agg(count(lit(1)).as("cust_n"))
        ord.join(cust, ord("k") <=> cust("k"))
          .select(ord("k"), col("orders_n"), col("cust_n"))
          .orderBy(col("k"))
      },
      Some("""WITH o AS (SELECT nullif(o_custkey % 7, 0) AS k,
            COUNT(*) AS orders_n FROM orders GROUP BY 1),
        c AS (SELECT nullif(c_custkey % 7, 0) AS k,
            COUNT(*) AS cust_n FROM customer GROUP BY 1)
        SELECT o.k, o.orders_n, c.cust_n
        FROM o JOIN c ON o.k IS NOT DISTINCT FROM c.k
        ORDER BY o.k"""),
      "null-safe equality join (<=> / IS NOT DISTINCT FROM): the null " +
        "key groups match each other instead of silently dropping — " +
        "still a hash join (null-safe equality is hashable)"),

    QueryDef(
      "q82_try_arith",
      (s, dir) => {
        // ANSI-safe arithmetic: Spark 4 runs ANSI mode ON (a divide-by-
        // zero or out-of-range access ERRORS instead of silently
        // nulling), so production pipelines need the try_* escape
        // hatches. Both failure classes are load-bearing here: every
        // 7th custkey makes the divisor 0 (try_divide → NULL) and every
        // order tries an out-of-bounds array index (try_element_at →
        // NULL beyond position 3). The oracle mirrors with NULLIF and
        // DuckDB's natively-NULL OOB list indexing; the null accounting
        // in the aggregate proves the NULLs actually happened.
        val arr = array(lit(10L), lit(20L), lit(30L))
        t(s, dir, "orders")
          .withColumn("per_bucket",
            try_divide(d2(col("o_totalprice")), (col("o_custkey") % 7))
              .cast("double"))
          .withColumn("pick",
            try_element_at(arr, (col("o_orderkey") % 5 + 1).cast("int")))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"),
            count(col("per_bucket")).as("n_div_ok"),
            count(col("pick")).as("n_pick_ok"),
            sum(d2(col("pick"))).cast("double").as("pick_sum"))
          .orderBy("o_orderpriority")
      },
      Some("""SELECT o_orderpriority, COUNT(*) AS n,
          COUNT(CAST(o_totalprice AS DECIMAL(12,2))
            / NULLIF(o_custkey % 7, 0)) AS n_div_ok,
          COUNT(([10, 20, 30])[CAST(o_orderkey % 5 + 1 AS INT)]) AS n_pick_ok,
          CAST(CAST(SUM(CAST(([10, 20, 30])[CAST(o_orderkey % 5 + 1 AS INT)]
            AS DECIMAL(12,2))) AS VARCHAR) AS DOUBLE) AS pick_sum
        FROM orders GROUP BY 1 ORDER BY o_orderpriority"""),
      "ANSI-safe arithmetic surface: try_divide and try_element_at " +
        "return NULL where ANSI mode would error (divide-by-zero, " +
        "out-of-bounds) — null accounting proves both paths fire"),

    QueryDef(
      "q83_map_ops",
      (s, dir) => {
        // MAP-type surface (arrays and structs are exercised all over
        // the catalog; maps were not): build a map per order from a
        // key:value string via str_to_map, read it back with
        // element_at, and relationalize it with explode — the
        // round-trip every semi-structured pipeline needs. The oracle
        // never materializes a MAP: it recomputes the exploded
        // relational form directly from the same string, which is
        // exactly the point — the map column is an in-flight
        // representation, the relational form is the data.
        t(s, dir, "orders")
          .withColumn("m", expr(
            "str_to_map(concat('status:', o_orderstatus, ',prio:', o_orderpriority), ',', ':')"))
          .withColumn("status_val", element_at(col("m"), "status"))
          .select(col("o_orderkey"), col("status_val"),
            explode(col("m")).as(Seq("mk", "mv")))
          .filter(col("o_orderkey") % 97 === 0)
          .orderBy("o_orderkey", "mk")
      },
      Some("""WITH m AS (
          SELECT o_orderkey, o_orderstatus AS status_val,
            'status' AS mk, o_orderstatus AS mv FROM orders
          UNION ALL
          SELECT o_orderkey, o_orderstatus,
            'prio', o_orderpriority FROM orders)
        SELECT o_orderkey, status_val, mk, mv FROM m
        WHERE o_orderkey % 97 = 0
        ORDER BY o_orderkey, mk"""),
      "map-type surface: str_to_map build, element_at lookup, explode " +
        "to (key, value) rows — the oracle recomputes the relational " +
        "form without ever holding a map"),

    QueryDef(
      "q86_skyline",
      (s, dir) => {
        // Pareto skyline (maximize price AND recency): the points no
        // other point beats on both axes. The textbook formulation is a
        // quadratic NOT EXISTS self-join; the 2-D skyline collapses to
        // ONE descending running max — a point survives iff its y is
        // the max of its x-group AND strictly above every y seen at
        // larger x. That running max is GLOBAL, so it runs through the
        // q81 machinery (range partition by x desc + per-partition max
        // + broadcast prefix offsets) instead of a SinglePartition
        // window — the driver sees one value per partition. Dates
        // compare as epoch days (exact ints). CatalogSpec cross-checks
        // against the quadratic dominance definition at sf0.001.
        import org.apache.spark.sql.expressions.Window
        val pts = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_totalprice").as("price"),
            col("o_orderdate").cast("date").as("odate"),
            datediff(col("o_orderdate").cast("date"),
              lit("1970-01-01").cast("date")).as("yd"))
        val gx = pts.groupBy(col("price")).agg(max(col("yd")).as("gyd"))
        val parted = gx.repartitionByRange(col("price").desc)
          .withColumn("pid", spark_partition_id())
          .stableCheckpoint() // pin pid assignment across the two jobs
        val pmax = parted.groupBy("pid").agg(max(col("gyd")).as("pm"))
          .collect().map(r => r.getInt(0) -> r.getInt(1)).sortBy(_._1)
        var run: Option[Int] = None
        val offsets = pmax.map { case (pid, pm) =>
          val o = (pid, run.map(_.toLong))
          run = Some(run.fold(pm)(math.max(_, pm)))
          o
        }.toSeq
        import s.implicits._
        val offDf = offsets.toDF("pid", "off")
        val w = Window.partitionBy(col("pid")).orderBy(col("price").desc)
          .rowsBetween(Window.unboundedPreceding, -1)
        val ranked = parted
          .withColumn("wmax", max(col("gyd")).over(w).cast("long"))
          .join(broadcast(offDf), "pid")
          .withColumn("maxgt", greatest(col("wmax"), col("off")))
        pts.join(ranked.select("price", "gyd", "maxgt"), "price")
          .filter(col("yd") === col("gyd") &&
            (col("maxgt").isNull || col("gyd") > col("maxgt")))
          .select(col("o_orderkey"), col("price"), col("odate"))
          .orderBy("o_orderkey")
      },
      Some("""WITH pts AS (
          SELECT o_orderkey, o_totalprice AS price,
            CAST(o_orderdate AS DATE) AS odate,
            datediff('day', DATE '1970-01-01',
              CAST(o_orderdate AS DATE)) AS yd
          FROM orders),
        gx AS (SELECT price, MAX(yd) AS gyd FROM pts GROUP BY price),
        rm AS (SELECT price, gyd,
            MAX(gyd) OVER (ORDER BY price DESC
              ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS maxgt
          FROM gx)
        SELECT p.o_orderkey, p.price, p.odate
        FROM pts p JOIN rm USING (price)
        WHERE p.yd = rm.gyd AND (rm.maxgt IS NULL OR rm.gyd > rm.maxgt)
        ORDER BY p.o_orderkey"""),
      "2-D Pareto skyline via ONE descending running max instead of the " +
        "quadratic dominance join — global prefix max through the q81 " +
        "range-partition machinery, no SinglePartition; quadratic " +
        "cross-check pinned in CatalogSpec"),

    QueryDef(
      "q87_histogram",
      (s, dir) => {
        // Equi-width histogram (20 bins over price) with INTEGER-exact
        // bin assignment: prices convert to exact cents (2-decimal
        // DECIMAL × 100), the bin is pure integer math — (c − cmin) ·
        // 20 div (cmax − cmin + 1) — so no float boundary can put a row
        // in different bins on different engines. The min/max frame is
        // 1 row, broadcast; the histogram itself is one partial-final
        // aggregate. Per-bin min/max prices come back as exact
        // decimals. The binning primitive under every distribution
        // dashboard, done so it hash-matches.
        val pr = t(s, dir, "lineitem")
          .select((d2(col("l_extendedprice")) * 100).cast("long").as("c"),
            d2(col("l_extendedprice")).as("p"))
        val mm = pr.agg(min(col("c")).as("cmin"), max(col("c")).as("cmax"))
        pr.crossJoin(broadcast(mm)) // 1 row
          .withColumn("bin",
            expr("(c - cmin) * 20 div (cmax - cmin + 1)"))
          .groupBy(col("bin"))
          .agg(count(lit(1)).as("n_rows"),
            min(col("p")).cast("double").as("p_lo"),
            max(col("p")).cast("double").as("p_hi"))
          .orderBy("bin")
      },
      Some("""WITH pr AS (
          SELECT CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100
              AS BIGINT) AS c,
            CAST(l_extendedprice AS DECIMAL(12,2)) AS p
          FROM lineitem),
        mm AS (SELECT MIN(c) AS cmin, MAX(c) AS cmax FROM pr)
        SELECT (c - cmin) * 20 // (cmax - cmin + 1) AS bin,
          COUNT(*) AS n_rows,
          CAST(CAST(MIN(p) AS VARCHAR) AS DOUBLE) AS p_lo,
          CAST(CAST(MAX(p) AS VARCHAR) AS DOUBLE) AS p_hi
        FROM pr, mm GROUP BY 1 ORDER BY bin"""),
      "equi-width histogram with integer-exact binning (exact cents, " +
        "truncating division both engines): 1-row min/max broadcast + " +
        "one partial-final aggregate — no float boundary ambiguity"),

    QueryDef(
      "q88_ntile_nth",
      (s, dir) => {
        // ntile/first_value/nth_value semantics — but DISTRIBUTED. The
        // naive form windows over PARTITION BY rf (3 partitions → a
        // third of the corpus through one task's sort at scale). The
        // aggregated output only ever reads p AT SPECIFIC GLOBAL RANKS:
        // SQL's ntile gives bucket i of n rows the exact rank interval
        //   [(i-1)·(n div 4) + least(i-1, n mod 4) + 1,
        //        i·(n div 4) + least(i,   n mod 4)]
        // (first buckets take the extras), so per-quartile count is
        // pure integer arithmetic, per-quartile min/max p are the
        // boundary-rank values (the order is p-first, so ok/ln
        // tie-breaks never change WHICH VALUE sits at a rank), and
        // first_value/nth_value(3) are ranks 1 and 3. All ten ranks per
        // group come from one RankSelect pass (value histogram → range
        // partitions → prefix offsets → bounded per-chunk windows).
        // Boundary sensitivity is preserved: any disagreement about
        // which value sits at a quartile boundary still moves lo/hi
        // and diverges the hash.
        ntileNth(t(s, dir, "lineitem")
          .select(col("l_returnflag").as("rf"),
            d2(col("l_extendedprice")).as("p")))
      },
      Some("""WITH pr AS (
          SELECT l_returnflag AS rf,
            CAST(l_extendedprice AS DECIMAL(12,2)) AS p,
            l_orderkey AS ok, l_linenumber AS ln
          FROM lineitem),
        wv AS (
          SELECT rf, p,
            CAST(NTILE(4) OVER (PARTITION BY rf ORDER BY p, ok, ln)
              AS BIGINT) AS quartile,
            FIRST_VALUE(p) OVER (PARTITION BY rf ORDER BY p, ok, ln
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS first_p,
            NTH_VALUE(p, 3) OVER (PARTITION BY rf ORDER BY p, ok, ln
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
              AS third_p
          FROM pr)
        SELECT rf, quartile, COUNT(*) AS n,
          CAST(MIN(p) AS DOUBLE) AS lo, CAST(MAX(p) AS DOUBLE) AS hi,
          CAST(MAX(first_p) AS DOUBLE) AS first_p,
          CAST(MAX(third_p) AS DOUBLE) AS third_p
        FROM wv GROUP BY 1, 2 ORDER BY rf, quartile"""),
      "ntile quartile bucketing + first_value/nth_value over the full " +
        "frame — the last window functions the catalog lacked; " +
        "total-order tie-breaks make bucket membership deterministic, " +
        "and per-quartile min/max catch any boundary disagreement"),

    QueryDef(
      "q89_explode_outer",
      (s, dir) => {
        // explode vs explode_outer: plain explode silently DROPS rows
        // whose array is empty — in a pipeline that flattens per-doc
        // rare-term lists, the docs with no rare terms vanish from any
        // downstream per-doc accounting. explode_outer keeps them with
        // a NULL element. Both run here over the same frame (rare =
        // tokens seen < 600 times corpus-wide, so MOST docs have an
        // empty list and the semantic difference is the majority of
        // the output, not an edge row). The oracle reproduces
        // explode_outer with the [NULL]-substitution identity.
        val tok = t(s, dir, "documents")
          .select(col("doc_id"), explode(split(trim(col("text")), " +"))
            .as("term"))
          .filter(col("term") =!= "")
        val rare = tok.groupBy("term").agg(count(lit(1)).as("cnt"))
          .filter(col("cnt") < 600).select("term")
        val perDoc = tok.join(broadcast(rare), "term")
          .groupBy("doc_id").agg(collect_set(col("term")).as("terms"))
        val withAll = t(s, dir, "documents").select(col("doc_id"))
          .join(perDoc, Seq("doc_id"), "left")
          .withColumn("terms",
            coalesce(col("terms"), array().cast("array<string>")))
        withAll
          .select(col("doc_id"), explode_outer(col("terms")).as("rare_term"))
          .orderBy("doc_id", "rare_term")
      },
      Some("""WITH tk AS (
          SELECT doc_id, unnest(string_split_regex(trim(text), ' +'))
            AS term
          FROM documents),
        tk2 AS (SELECT * FROM tk WHERE term <> ''),
        rare AS (SELECT term FROM tk2 GROUP BY term
                 HAVING COUNT(*) < 600),
        per_doc AS (
          SELECT t.doc_id, list_distinct(list(t.term)) AS terms
          FROM tk2 t JOIN rare USING (term) GROUP BY t.doc_id),
        all_docs AS (
          SELECT d.doc_id, COALESCE(p.terms, []) AS terms
          FROM documents d LEFT JOIN per_doc p USING (doc_id))
        SELECT doc_id,
          unnest(CASE WHEN len(terms) = 0
            THEN [CAST(NULL AS VARCHAR)] ELSE terms END) AS rare_term
        FROM all_docs
        ORDER BY doc_id, rare_term"""),
      "explode_outer null-preservation: docs whose rare-term list is " +
        "empty keep a NULL row instead of vanishing — the flatten " +
        "semantic plain explode silently breaks; oracle reproduces it " +
        "with the [NULL]-substitution identity"),

    QueryDef(
      "d38_fuzzy_resolve",
      (s, dir) => {
        // Entity resolution by BLOCKED fuzzy match — the record-linkage
        // step every ingest pipeline needs when keys are dirty strings:
        // probes (every 7th part's name with one deterministically-
        // deleted character — a typo'd feed) resolve against the
        // catalog's distinct names. The blocking is the symmetric-delete
        // shape (public: Garbe's SymSpell spell correction): BOTH sides
        // expand to themselves plus ALL their 1-deletion variants,
        // candidates come from an EQUI-join on variant equality (two
        // names are within ED 1 ⇒ their neighborhoods intersect), and
        // only candidates pay the levenshtein verify — linear in
        // corpus × name-length, never probe × catalog. The verified
        // distance then picks the best entity (dist asc, name asc),
        // with the per-probe candidate count exposing blocking recall.
        // All strings + integers → exact oracle (both engines implement
        // classic unit-cost Levenshtein). Scale shape: the deletion
        // neighborhood is a shuffle-free explode over DISTINCT entity
        // names (entity catalogs are bounded; broadcast when small),
        // probes join it by hashable string equality — at 100 TB of
        // probes this is one broadcast/equi join + a bounded verify,
        // the same discipline as d7's LSH banding applied to edit
        // distance.
        val names = t(s, dir, "part").select(col("p_name")).distinct()
        val variants = names
          .withColumn("i", explode(sequence(lit(0), length(col("p_name")) - 1)))
          .select(col("p_name"),
            concat(expr("substr(p_name, 1, i)"),
              expr("substr(p_name, i + 2)")).as("v"))
          .union(names.select(col("p_name"), col("p_name").as("v")))
          .distinct()
        val probes = t(s, dir, "part")
          .filter(col("p_partkey") % 7 === 0)
          .select(col("p_partkey").as("probe_id"),
            concat(
              expr("substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))"),
              expr("substr(p_name, CAST(p_partkey % length(p_name) AS INT) + 2)"))
              .as("probe_name"))
        // symmetric delete: the probe side expands to ITS 1-deletion
        // neighborhood too, so substitution-type matches (same length,
        // ED 1) block as well — intersecting neighborhoods can reach
        // ED 2, which is exactly why the levenshtein verify below is
        // load-bearing, not decorative
        val probeVars = probes
          .withColumn("i",
            explode(sequence(lit(0), length(col("probe_name")) - 1)))
          .select(col("probe_id"), col("probe_name"),
            concat(expr("substr(probe_name, 1, i)"),
              expr("substr(probe_name, i + 2)")).as("pv"))
          .union(probes.select(col("probe_id"), col("probe_name"),
            col("probe_name").as("pv")))
          .distinct()
        val cand = probeVars
          .join(broadcast(variants), col("pv") === col("v"))
          .select(col("probe_id"), col("probe_name"),
            col("p_name").as("match_name"))
          .distinct() // many variant collisions, one candidate pair
          .withColumn("dist",
            levenshtein(col("probe_name"), col("match_name")).cast("long"))
          .filter(col("dist") <= 1)
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col("probe_id"))
        val wr = Window.partitionBy(col("probe_id"))
          .orderBy(col("dist").asc, col("match_name").asc)
        cand
          .withColumn("n_cand", count(lit(1)).over(w))
          .withColumn("rn", row_number().over(wr))
          .filter(col("rn") === 1)
          .select("probe_id", "probe_name", "match_name", "dist", "n_cand")
          .orderBy("probe_id")
      },
      Some("""WITH names AS (SELECT DISTINCT p_name FROM part),
        variants AS (
          SELECT p_name, substr(p_name, 1, CAST(i AS INT))
              || substr(p_name, CAST(i AS INT) + 2) AS v
          FROM names, UNNEST(range(0, length(p_name))) t(i)
          UNION
          SELECT p_name, p_name AS v FROM names),
        probes AS (
          SELECT p_partkey AS probe_id,
            substr(p_name, 1, CAST(p_partkey % length(p_name) AS INT))
              || substr(p_name,
                   CAST(p_partkey % length(p_name) AS INT) + 2) AS probe_name
          FROM part WHERE p_partkey % 7 = 0),
        probe_vars AS (
          SELECT probe_id, probe_name,
            substr(probe_name, 1, CAST(i AS INT))
              || substr(probe_name, CAST(i AS INT) + 2) AS pv
          FROM probes, UNNEST(range(0, length(probe_name))) t(i)
          UNION
          SELECT probe_id, probe_name, probe_name AS pv FROM probes),
        cand AS (
          SELECT DISTINCT probe_id, probe_name, p_name AS match_name
          FROM probe_vars JOIN variants ON pv = v),
        scored AS (
          SELECT probe_id, probe_name, match_name,
            CAST(levenshtein(probe_name, match_name) AS BIGINT) AS dist,
            COUNT(*) OVER (PARTITION BY probe_id) AS n_cand
          FROM cand
          WHERE levenshtein(probe_name, match_name) <= 1)
        SELECT probe_id, probe_name, match_name, dist, n_cand FROM scored
        QUALIFY ROW_NUMBER() OVER (PARTITION BY probe_id
          ORDER BY dist, match_name) = 1
        ORDER BY probe_id"""),
      "entity resolution via SymSpell deletion-neighborhood blocking: " +
        "distinct-name catalog explodes to 1-deletion variants, probes " +
        "equi-join the neighborhood, only candidates pay the edit-" +
        "distance verify — linear blocking, never probe x catalog"),

    QueryDef(
      "q92_observed_metrics",
      (s, dir) => observedGate(s, dir)._1,
      Some("""SELECT l_returnflag,
          CAST(COUNT(*) AS BIGINT) AS n,
          CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS qty_sum
        FROM lineitem
        WHERE l_quantity <= 45
        GROUP BY l_returnflag ORDER BY l_returnflag"""),
      "quality-gated aggregate with observe(): pipeline health metrics " +
        "(rows seen, rows rejected, rejected mass) ride the SAME scan " +
        "as the production aggregate via AggregatingAccumulator — no " +
        "second pass; OpsSpec pins the metrics against independent " +
        "counts, the oracle pins the gated result"),

    QueryDef(
      "q94_poisson_bootstrap",
      (s, dir) => {
        // Poisson bootstrap (Chamandy et al., "Estimating Uncertainty
        // for Massive Data Streams") — THE distributed bootstrap: no
        // resample shuffles, no with-replacement index draws; every row
        // carries a Poisson(1) weight per replica and all B replica
        // estimates fall out of ONE aggregate over rows × B. Here: B=20
        // bootstrap means of the order value, for the confidence
        // interval a point estimate alone can't give. EXACT: the
        // "random" weight is a deterministic function of (replica,
        // orderkey) — md5 → 24-bit integer uniform → threshold count
        // against the literal Poisson CDF lattice (poissonThr; computed
        // once, injected into both engines — no per-row libm, no RNG
        // state). Weighted sums are BIGINT; each replica mean is one
        // exact division. Scale: one scan explodes ×B, one map-side-
        // combining groupBy(B keys) — at 100 TB this is the only
        // bootstrap shape that works, and reproducibility means a
        // re-run (or an auditor) gets the identical CI.
        // One md5 yields 32 hex digits = five independent 24-bit
        // uniforms, so the B=20 replicas need only FOUR hashes per row
        // (replica b reads window b%5 of hash group b/5) — measured
        // 4.3 s → the hash work is the whole cost at sf0.1. The Spark
        // side converts windows with native conv() (codegen'd); the
        // oracle mirrors the same windows with its strpos fold.
        val cents = (col("o_totalprice").cast(DecimalType(12, 2)) * 100)
          .cast("long")
        val base = t(s, dir, "orders")
          .select(col("o_orderkey").as("k"), cents.as("c"))
          .withColumn("g", explode(sequence(lit(0L), lit(3L))))
          .withColumn("h",
            md5(concat(col("g").cast("string"), lit(":"),
              col("k").cast("string"))))
          .withColumn("wi", explode(sequence(lit(0L), lit(4L))))
          .withColumn("b", col("g") * 5 + col("wi"))
          .withColumn("u", expr(
            "CAST(conv(substr(h, CAST(wi * 6 + 1 AS INT), 6), 16, 10) AS BIGINT)"))
          .withColumn("w", poissonThr.map(tv =>
            when(col("u") >= tv, 1L).otherwise(0L)).reduce(_ + _))
        base.groupBy(col("b"))
          .agg(sum(col("w")).as("n_eff"),
            sum(col("w") * col("c")).as("wsum"))
          .select(col("b"), col("n_eff"),
            (col("wsum").cast("double") / (col("n_eff") * 100))
              .as("mean_val"))
          .orderBy("b")
      },
      Some {
        val uSql = (1 to 6).map { i =>
          s"(strpos('0123456789abcdef', substr(h, CAST(wi * 6 + $i AS INT), 1)) - 1) * ${1L << (4 * (6 - i))}"
        }.mkString(" + ")
        val wSql = poissonThr.map(tv =>
          s"(CASE WHEN u >= $tv THEN 1 ELSE 0 END)").mkString(" + ")
        s"""WITH rows_g AS (
          SELECT o_orderkey AS k,
            CAST(CAST(o_totalprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS c,
            CAST(t.g AS BIGINT) AS g
          FROM orders, UNNEST(range(0, 4)) t(g)),
        hx AS (SELECT g, c,
            md5(CAST(g AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS h
          FROM rows_g),
        rows_b AS (SELECT g * 5 + CAST(t2.wi AS BIGINT) AS b, c, h,
            CAST(t2.wi AS BIGINT) AS wi
          FROM hx, UNNEST(range(0, 5)) t2(wi)),
        uu AS (SELECT b, c, CAST($uSql AS BIGINT) AS u FROM rows_b),
        ww AS (SELECT b, c, $wSql AS w FROM uu)
        SELECT b, CAST(SUM(w) AS BIGINT) AS n_eff,
          CAST(SUM(w * c) AS DOUBLE) / (SUM(w) * 100) AS mean_val
        FROM ww GROUP BY b ORDER BY b"""
      },
      "Poisson bootstrap (B=20): per-(row, replica) Poisson(1) weights " +
        "from md5 uniforms vs the literal CDF lattice — all replica " +
        "means in ONE weighted aggregate pass, bit-reproducible CI, " +
        "no resampling shuffle"),

    QueryDef(
      "q95_asof_nearest",
      (s, dir) => {
        // NEAREST as-of join — completes the as-of family (q30
        // backward, q45 forward): each error attaches its user's
        // closest signup in EITHER direction, ties resolving backward.
        // Times flow as epoch micros so the |Δ| compare is exact
        // integer math; asof_dir makes both directions' wins visible
        // (load-bearing on this corpus: both 'b' and 'f' occur). One
        // union + one key shuffle + two window passes over the same
        // partitioning — never a range product.
        val ev = t(s, dir, "events")
          .withColumn("us", unix_micros(col("ts")))
        val errors = ev.filter(col("event_type") === "error")
          .select(col("event_id"), col("user_id"), col("us"))
        val signups = ev.filter(col("event_type") === "signup")
          .select(col("user_id"), col("us"))
        graft.operators.AsOfJoin.asofNearest(
          errors, signups, Seq("user_id"), "us", "us", Nil)
          .select(col("event_id"), col("user_id"),
            col("asof_us"), col("asof_dir"))
          .orderBy("event_id")
      },
      Some("""WITH e AS (SELECT event_id, user_id,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type = 'error'),
        s AS (SELECT user_id, epoch_us(CAST(ts AS TIMESTAMP)) AS us
          FROM events WHERE event_type = 'signup'),
        b AS (SELECT e.event_id, MAX(s.us) AS bts
          FROM e LEFT JOIN s ON s.user_id = e.user_id AND s.us <= e.us
          GROUP BY e.event_id),
        f AS (SELECT e.event_id, MIN(s.us) AS fts
          FROM e LEFT JOIN s ON s.user_id = e.user_id AND s.us >= e.us
          GROUP BY e.event_id)
        SELECT e.event_id, e.user_id,
          CASE WHEN f.fts IS NULL
                 OR (b.bts IS NOT NULL AND e.us - b.bts <= f.fts - e.us)
               THEN b.bts ELSE f.fts END AS asof_us,
          CASE WHEN b.bts IS NULL AND f.fts IS NULL THEN NULL
               WHEN f.fts IS NULL
                 OR (b.bts IS NOT NULL AND e.us - b.bts <= f.fts - e.us)
               THEN 'b' ELSE 'f' END AS asof_dir
        FROM e JOIN b USING (event_id) JOIN f USING (event_id)
        ORDER BY e.event_id"""),
      "nearest as-of join (min |Δt|, ties backward): one union + one " +
        "key shuffle + two windows over the same partitioning — the " +
        "third leg of the as-of family, exact integer time compare, " +
        "direction column exposes both wins"),

    QueryDef(
      "q96_k_anonymity",
      (s, dir) => {
        // k-anonymous data release (Sweeney) — the privacy gate a
        // training-data export runs before leaving the boundary:
        // every released row must be indistinguishable from >= k-1
        // others on its quasi-identifiers. Three moves in one pass:
        // (1) direct identifier -> salted sha256 pseudonym (join-
        // preserving, irreversible without the salt); (2) the precise
        // balance GENERALIZES to a 1000-unit band (floor of one IEEE
        // division — identical bits both engines); (3) equivalence
        // classes on (nation, segment) below k=10 are SUPPRESSED
        // outright. Load-bearing at sf0.01: 35 of 125 classes fall.
        // Scale shape: class sizes are one map-side-combining groupBy
        // on bounded keys, broadcast back — the corpus is scanned
        // once; nothing driver-side.
        val cust = t(s, dir, "customer")
        val classes = cust.groupBy(col("c_nationkey"), col("c_mktsegment"))
          .agg(count(lit(1)).as("class_n"))
          .filter(col("class_n") >= 10)
        cust.join(broadcast(classes), Seq("c_nationkey", "c_mktsegment"))
          .select(
            sha2(concat(lit("graft-salt:"), col("c_custkey").cast("string")),
              256).as("pseudo_id"),
            col("c_nationkey"), col("c_mktsegment"),
            floor(col("c_acctbal") / lit(1000.0)).cast("long").as("bal_band"),
            col("class_n"))
          .orderBy("pseudo_id")
      },
      Some("""WITH cls AS (
          SELECT c_nationkey, c_mktsegment, COUNT(*) AS class_n
          FROM customer GROUP BY 1, 2 HAVING COUNT(*) >= 10)
        SELECT sha256('graft-salt:' || CAST(c_custkey AS VARCHAR))
            AS pseudo_id,
          c.c_nationkey, c.c_mktsegment,
          CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
          cls.class_n
        FROM customer c
        JOIN cls ON c.c_nationkey = cls.c_nationkey
          AND c.c_mktsegment = cls.c_mktsegment
        ORDER BY pseudo_id"""),
      "k-anonymous release (k=10): salted-sha256 pseudonymization, " +
        "band generalization, and suppression of small equivalence " +
        "classes — one scan + one bounded-key groupBy broadcast back; " +
        "35 of 125 classes suppressed at sf0.01"),

    QueryDef(
      "q97_bloom_prefilter",
      (s, dir) => {
        // Bloom filter AS DATAFLOW — completing the sketch family
        // (q21 HLL, q75 GK, d33 Misra-Gries, d39 count-min) with the
        // one that gates JOINS: the dim side's membership set compiles
        // to m=2048 bits / 3 hashes, the fact side probes it BEFORE
        // any shuffle. Deterministic md5 positions make the whole
        // filter — and every probe verdict including the false
        // positives — exactly reproducible in SQL, so the FP rate is
        // AUDITED, not assumed. Per-key verdict table: maybe=1 ∧
        // member=0 rows are the Bloom's false positives (~8% at this
        // fill); false negatives are structurally impossible and the
        // oracle would catch one. Scale shape: the bit table is ≤ m
        // rows (broadcast); probes = one distinct + one groupBy on
        // the probe key. Spark's own runtime bloom injection is
        // pinned in PlanSpec — this entry makes the sketch itself a
        // first-class, auditable relation.
        val M = 2048
        val members = t(s, dir, "part").filter(col("p_size") > 40)
          .select(col("p_partkey").as("k"))
        def positions(df: DataFrame): DataFrame =
          df.withColumn("i", explode(sequence(lit(0), lit(2))))
            .withColumn("h",
              md5(concat(col("i").cast("string"), lit(":"),
                col("k").cast("string"))))
            .withColumn("pos", u24Spark("h") % M)
        val bits = positions(members).select(col("pos")).distinct()
        val probes = t(s, dir, "lineitem")
          .select(col("l_partkey").as("k")).distinct()
        val hits = positions(probes)
          .join(broadcast(bits), "pos")
          .groupBy(col("k")).agg(count(lit(1)).as("nhit"))
        probes
          .join(hits, Seq("k"), "left")
          .join(members.withColumn("member", lit(1L)), Seq("k"), "left")
          .select(col("k").as("partkey"),
            coalesce(col("member"), lit(0L)).as("member"),
            when(coalesce(col("nhit"), lit(0L)) === 3, 1L).otherwise(0L)
              .as("bloom_maybe"))
          .orderBy("partkey")
      },
      Some(s"""WITH members AS (
          SELECT p_partkey AS k FROM part WHERE p_size > 40),
        mpos AS (
          SELECT k, CAST(t.i AS BIGINT) AS i FROM members,
            UNNEST(range(0, 3)) t(i)),
        mh AS (SELECT k,
            md5(CAST(i AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS h
          FROM mpos),
        bits AS (SELECT DISTINCT CAST(${u24Sql("h")} AS BIGINT) % 2048
            AS pos FROM mh),
        probes AS (SELECT DISTINCT l_partkey AS k FROM lineitem),
        ppos AS (
          SELECT k, CAST(t.i AS BIGINT) AS i FROM probes,
            UNNEST(range(0, 3)) t(i)),
        ph AS (SELECT k, i,
            md5(CAST(i AS VARCHAR) || ':' || CAST(k AS VARCHAR)) AS h
          FROM ppos),
        pb AS (SELECT k, CAST(${u24Sql("h")} AS BIGINT) % 2048 AS pos
          FROM ph),
        hits AS (SELECT pb.k, COUNT(*) AS nhit
          FROM pb JOIN bits ON pb.pos = bits.pos GROUP BY pb.k)
        SELECT p.k AS partkey,
          CAST(CASE WHEN m.k IS NULL THEN 0 ELSE 1 END AS BIGINT) AS member,
          CAST(CASE WHEN COALESCE(hits.nhit, 0) = 3 THEN 1 ELSE 0 END
            AS BIGINT) AS bloom_maybe
        FROM probes p
        LEFT JOIN hits ON p.k = hits.k
        LEFT JOIN members m ON p.k = m.k
        ORDER BY partkey"""),
      "Bloom filter as dataflow (m=2048, 3 md5 hashes): dim-side " +
        "membership compiles to a broadcast bit table, fact side " +
        "probes pre-shuffle; per-key verdicts expose the exact false-" +
        "positive set — the join-gating sketch, fully oracle-checked"),

    QueryDef(
      "q98_strat_sample",
      (s, dir) => {
        // Deterministic stratified Bernoulli sampling — TABLESAMPLE
        // that an auditor can replay: each stratum (order status)
        // samples at its own rate, and the keep/drop coin is
        // md5(o_orderkey) -> 24-bit uniform vs a literal integer
        // threshold — no RNG state, so the sample is identical on
        // every run, every parallelism, and in the oracle. Rates:
        // P 50% / O 10% / F 2% (the down-sample-the-majority-class
        // move of every training-data rebalance). One scan, zero
        // shuffles before the sample — the filter prunes 80% of the
        // corpus before anything downstream pays for it.
        val thr = Map("P" -> (1L << 23), "O" -> 1677721L, "F" -> 335544L)
        t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_orderstatus"))
          .withColumn("h", md5(concat(lit("s:"), col("o_orderkey")
            .cast("string"))))
          .withColumn("u", u24Spark("h"))
          .filter(col("u") <
            when(col("o_orderstatus") === "P", thr("P"))
              .when(col("o_orderstatus") === "O", thr("O"))
              .otherwise(thr("F")))
          .select(col("o_orderkey"), col("o_orderstatus"), col("u"))
          .orderBy("o_orderkey")
      },
      Some(s"""WITH h AS (
          SELECT o_orderkey, o_orderstatus,
            md5('s:' || CAST(o_orderkey AS VARCHAR)) AS h
          FROM orders),
        u AS (SELECT o_orderkey, o_orderstatus,
            CAST(${u24Sql("h")} AS BIGINT) AS u FROM h)
        SELECT o_orderkey, o_orderstatus, u FROM u
        WHERE u < CASE o_orderstatus WHEN 'P' THEN ${1L << 23}
          WHEN 'O' THEN 1677721 ELSE 335544 END
        ORDER BY o_orderkey"""),
      "deterministic stratified Bernoulli sample (P 50% / O 10% / " +
        "F 2%): md5-uniform vs literal thresholds — replayable by an " +
        "auditor, identical at any parallelism; one scan, the filter " +
        "prunes before any downstream shuffle"),

    QueryDef(
      "q99_cooccur",
      (s, dir) => {
        // Market-basket co-occurrence (the support-counting core of
        // Apriori): which part pairs ship together in one order? The
        // pair generator is a SELF-JOIN ON THE ORDER KEY with a < b —
        // quadratic only in the per-order item count (≤ 13 here, ≤ 78
        // pairs), so the plan is linear-ish in orders at ANY corpus
        // size: the classic bounded-fan-out shape, never parts×parts.
        // Distinct first (an order listing a part twice is one
        // occurrence); top-20 by (support desc, pa, pb) — total order,
        // so the cut is deterministic and plans as
        // TakeOrderedAndProject, not a global sort.
        val items = t(s, dir, "lineitem")
          .select(col("l_orderkey").as("ok"), col("l_partkey").as("p"))
          .distinct()
        cooccurPairs(items)
          .orderBy(col("support").desc, col("pa"), col("pb"))
          .limit(20)
      },
      Some(s"""WITH s AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
        sz AS (SELECT l_orderkey FROM s GROUP BY l_orderkey
          HAVING COUNT(*) <= $MaxBasket),
        k AS (SELECT s.l_orderkey, s.l_partkey
          FROM s JOIN sz ON s.l_orderkey = sz.l_orderkey)
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, COUNT(*) AS support
        FROM k a JOIN k b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY 1, 2
        ORDER BY support DESC, pa, pb LIMIT 20"""),
      "market-basket pair co-occurrence: self-join bounded by per-order " +
        "item count (never parts x parts), support count, deterministic " +
        "top-20 via TakeOrderedAndProject"),

    QueryDef(
      "q100_twap",
      (s, dir) => {
        // Time-WEIGHTED average (TWAP) per (event_type, day) — the
        // time-series mean where a value holds until the next
        // observation, so sparse quiet hours don't get out-voted by
        // bursts (q79's OHLC gives the bar, this gives the weighted
        // level). Exactness: value -> cents (long), holding time ->
        // lead(ts)−ts in MICROS (integer; the last observation of each
        // day carries no interval and drops out on both engines), and
        // the key bound that makes BIGINT safe at ANY corpus size:
        // sum(dt) per group <= one day in micros, so the numerator is
        // <= cents_max * 86.4e9 ~ 8.6e14 — no decimal widening needed.
        // One window + one aggregate over the same (type, day)
        // partitioning; ONE IEEE division at the end.
        val ev = t(s, dir, "events")
          .select(col("event_type"), col("ts"),
            (col("value").cast(DecimalType(12, 2)) * 100).cast("long")
              .as("cents"),
            col("event_id"), to_date(col("ts")).as("day"),
            unix_micros(col("ts")).as("us"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"), col("day"))
          .orderBy(col("us"), col("event_id"))
        ev.withColumn("dt", lead(col("us"), 1).over(w) - col("us"))
          .filter(col("dt").isNotNull)
          .groupBy(col("event_type"), col("day"))
          .agg(sum(col("cents") * col("dt")).as("num"),
            sum(col("dt")).as("den"), count(lit(1)).as("n_intervals"))
          .select(col("event_type"), col("day"), col("n_intervals"),
            (col("num").cast("double") / (col("den") * 100).cast("double"))
              .as("twap"))
          .orderBy("event_type", "day")
      },
      Some("""WITH e AS (
          SELECT event_type, CAST(CAST(ts AS TIMESTAMP) AS DATE) AS day,
            CAST(CAST(value AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
            epoch_us(CAST(ts AS TIMESTAMP)) AS us, event_id
          FROM events),
        d AS (SELECT event_type, day, cents,
            LEAD(us) OVER (PARTITION BY event_type, day
              ORDER BY us, event_id) - us AS dt
          FROM e)
        SELECT event_type, day, COUNT(*) AS n_intervals,
          CAST(SUM(cents * dt) AS DOUBLE) / CAST(SUM(dt) * 100 AS DOUBLE)
            AS twap
        FROM d WHERE dt IS NOT NULL
        GROUP BY 1, 2 ORDER BY 1, 2"""),
      "time-weighted average per (event_type, day): integer holding-" +
        "time weights from one lead() window, BIGINT-safe at any scale " +
        "(per-group weight mass bounded by the day), one IEEE division"),

    QueryDef(
      "q101_checksum",
      (s, dir) => {
        // Order-independent table fingerprint — replica anti-entropy
        // at 100 TB: two sites compare per-group (count, checksum)
        // pairs instead of shipping or sorting rows. checksum = SUM of
        // a deterministic md5-derived 24-bit digest of each row's
        // canonical key string — commutative, so ANY partitioning/
        // order yields the identical value, and one flipped row moves
        // the sum with probability ~1. Verified here by construction:
        // the oracle recomputes the same fingerprint from its own
        // scan, so the green row IS a successful anti-entropy compare
        // between two independent engines.
        val l = t(s, dir, "lineitem")
          .select(col("l_returnflag").as("grp"),
            md5(concat_ws(":",
              col("l_orderkey"), col("l_linenumber"),
              (col("l_quantity").cast(DecimalType(12, 2)) * 100)
                .cast("long"))).as("h"))
        l.withColumn("d", u24Spark("h"))
          .groupBy("grp")
          .agg(count(lit(1)).as("n"), sum(col("d")).as("checksum"))
          .orderBy("grp")
      },
      Some(s"""WITH h AS (
          SELECT l_returnflag AS grp,
            md5(CAST(l_orderkey AS VARCHAR) || ':' ||
              CAST(l_linenumber AS VARCHAR) || ':' ||
              CAST(CAST(CAST(l_quantity AS DECIMAL(12,2)) * 100 AS BIGINT)
                AS VARCHAR)) AS h
          FROM lineitem)
        SELECT grp, COUNT(*) AS n,
          CAST(SUM(${u24Sql("h")}) AS BIGINT) AS checksum
        FROM h GROUP BY grp ORDER BY grp"""),
      "order-independent table checksum per group (sum of md5-derived " +
        "row digests): replica anti-entropy without sorting or " +
        "shipping rows — the oracle run IS the cross-engine compare"),

    QueryDef(
      "q102_bitmask_rollup",
      (s, dir) => {
        // Bitwise aggregate rollup — audience/feature segmentation the
        // way a 100 TB system stores it: each order compresses to a
        // feature BITMASK, and per-customer semantics fall out of the
        // three bitwise aggregates in ONE map-side-combining pass:
        // bit_or = "ever had the flag", bit_and = "always had it",
        // bit_xor = parity (the delta-sync primitive). Flags: open
        // status / high value / urgent priority. All-integer — exact
        // on both engines, order-free.
        val o = t(s, dir, "orders")
        val mask =
          (when(col("o_orderstatus") === "O", 1L).otherwise(0L)
            + when(col("o_totalprice") > 150000.0, 2L).otherwise(0L)
            + when(col("o_orderpriority").startsWith("1"), 4L)
              .otherwise(0L)).as("mask")
        o.select(col("o_custkey"), mask)
          .groupBy("o_custkey")
          .agg(count(lit(1)).as("n_orders"),
            bit_or(col("mask")).as("flags_any"),
            bit_and(col("mask")).as("flags_all"),
            bit_xor(col("mask")).as("flags_parity"))
          .orderBy("o_custkey")
      },
      Some("""WITH m AS (
          SELECT o_custkey,
            CAST(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END
              + CASE WHEN o_totalprice > 150000.0 THEN 2 ELSE 0 END
              + CASE WHEN o_orderpriority LIKE '1%' THEN 4 ELSE 0 END
              AS BIGINT) AS mask
          FROM orders)
        SELECT o_custkey, COUNT(*) AS n_orders,
          CAST(BIT_OR(mask) AS BIGINT) AS flags_any,
          CAST(BIT_AND(mask) AS BIGINT) AS flags_all,
          CAST(BIT_XOR(mask) AS BIGINT) AS flags_parity
        FROM m GROUP BY o_custkey ORDER BY o_custkey"""),
      "bitwise aggregate rollup (bit_or / bit_and / bit_xor) over " +
        "per-order feature bitmasks: ever/always/parity semantics per " +
        "customer in one map-side-combining pass — all-integer, exact"),

    QueryDef(
      "q103_reservoir",
      (s, dir) => {
        // Deterministic per-group reservoir — exactly K uniform
        // samples per stratum WITHOUT replacement (q98 samples at a
        // RATE; this guarantees the count): order each group by an
        // md5 coin and keep the first K=5. The row_number-filter
        // idiom is the one WindowTopKRewrite turns into the native
        // O(K) TopKPerKey operator under the engine's session
        // extensions — per-group state is K rows no matter how hot
        // the group (the skew corpus's 30%-hot event_type pays the
        // same memory as a cold one). Replayable: the coin is a
        // function of the event id alone.
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("event_type"))
          .orderBy(col("coin"), col("event_id"))
        t(s, dir, "events")
          .select(col("event_type"), col("event_id"),
            md5(concat(lit("r:"), col("event_id").cast("string")))
              .as("coin"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 5)
          .select(col("event_type"), col("event_id"), col("rn").cast("long")
            .as("rn"))
          .orderBy("event_type", "rn")
      },
      Some("""SELECT event_type, event_id,
          CAST(ROW_NUMBER() OVER (PARTITION BY event_type
            ORDER BY md5('r:' || CAST(event_id AS VARCHAR)), event_id)
            AS BIGINT) AS rn
        FROM events
        QUALIFY rn <= 5
        ORDER BY event_type, rn"""),
      "deterministic per-group reservoir (exactly K=5 per stratum, " +
        "md5-coin order): the row_number idiom the native TopKPerKey " +
        "rewrite bounds to O(K) state per group — hot groups pay what " +
        "cold ones pay; auditor-replayable"),

    QueryDef(
      "q106_l_diversity",
      (s, dir) => {
        // l-DIVERSITY audit — the release gate k-anonymity alone
        // misses: a class can have >= k members who all share the
        // SENSITIVE value (here the 1000-unit balance band), so
        // membership still discloses it. Verdict per equivalence
        // class: released iff class_n >= 10 AND >= 7 distinct
        // sensitive values (k=10, l=7) — both exact integers from ONE
        // aggregate
        // over the corpus (count + count distinct per bounded class
        // key). The audit table is what a privacy review reads; q96's
        // row-level release composes with it. Load-bearing at sf0.01:
        // classes fail each test independently.
        t(s, dir, "customer")
          .select(col("c_nationkey"), col("c_mktsegment"),
            floor(col("c_acctbal") / lit(1000.0)).cast("long")
              .as("bal_band"))
          .groupBy("c_nationkey", "c_mktsegment")
          .agg(count(lit(1)).as("class_n"),
            countDistinct(col("bal_band")).as("n_sensitive"))
          .withColumn("released",
            when(col("class_n") >= 10 && col("n_sensitive") >= 7, 1L)
              .otherwise(0L))
          .orderBy("c_nationkey", "c_mktsegment")
      },
      Some("""SELECT c_nationkey, c_mktsegment,
          COUNT(*) AS class_n,
          COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
            AS n_sensitive,
          CAST(CASE WHEN COUNT(*) >= 10
            AND COUNT(DISTINCT CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT))
              >= 7 THEN 1 ELSE 0 END AS BIGINT) AS released
        FROM customer
        GROUP BY c_nationkey, c_mktsegment
        ORDER BY c_nationkey, c_mktsegment"""),
      "l-diversity audit (k=10, l=7): per-equivalence-class size AND " +
        "distinct-sensitive-value counts in one aggregate — the " +
        "disclosure check k-anonymity alone misses; composes with " +
        "q96's row-level release"),

    QueryDef(
      "q107_skew_join",
      (s, dir) => {
        // Hot-key fan-in JOIN under AQE skew handling — the join-side
        // complement to q42's salted aggregation: ~80% of lineitems
        // collapse onto supplier 1 (the anonymous-user / null-key shape
        // real fact tables produce), and the fix is NOT rewritten keys
        // but Spark's own OptimizeSkewedJoin: at runtime AQE splits the
        // hot shuffle partition and duplicates the matching dim rows,
        // keeping every task bounded while the RESULT is untouched.
        // hint("merge") forces the sort-merge join a cluster-scale dim
        // requires (broadcast is the toy-scale escape, and a broadcast
        // join has no skew to split); the groupBy on s_name re-shuffles
        // after the join anyway, so the skew split never adds an
        // exchange. PlanSpec pins skew=true in the final adaptive plan
        // with production thresholds lowered to fire at sf0.01; this
        // oracle pins that the split changes nothing about the answer.
        val fact = t(s, dir, "lineitem")
          .select(when(pmod(col("l_partkey"), lit(5)) < 4, 1L)
            .otherwise(col("l_suppkey")).as("k"),
            col("l_quantity"))
        val dim = t(s, dir, "supplier")
          .select(col("s_suppkey").as("k"), col("s_name"))
        fact.join(dim.hint("merge"), "k")
          .groupBy(col("s_name"))
          .agg(count(lit(1)).as("n"),
            sum(col("l_quantity").cast(DecimalType(12, 2)))
              .cast("double").as("qty"))
          .orderBy("s_name")
      },
      Some("""SELECT s_name, COUNT(*) AS n,
          CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS VARCHAR)
            AS DOUBLE) AS qty
        FROM (SELECT CASE WHEN l_partkey % 5 < 4 THEN 1 ELSE l_suppkey END
            AS k, l_quantity FROM lineitem) l
        JOIN supplier s ON s.s_suppkey = l.k
        GROUP BY s_name ORDER BY s_name"""),
      "hot-key fan-in join (80% of the fact on one dim key) answered by " +
        "AQE's OptimizeSkewedJoin instead of key rewriting: forced SMJ, " +
        "runtime hot-partition split, exact oracle proves the split is " +
        "semantically invisible — q42's aggregation-skew complement")
  )

  /** Baskets above this size are dropped before q99's pair join — the
    * d7 oversized-bucket discipline applied to market-basket mining:
    * one pathological mega-basket (a crawler cart, a bot order) makes
    * pair generation quadratic in ITS size; capping bounds every
    * basket's fan-out at MaxBasket²/2 pairs, and the dropped mass is
    * surfaced as a side frame (d43). A no-op on this corpus (max
    * basket 13); EdgeSpec pins bounded pair counts on a synthetic
    * 500-item basket.
    * (lazy: referenced by `queries`, which initializes first — the
    * poissonThr ordering discipline.) */
  private[catalog] lazy val MaxBasket = 64L

  /** q99's pair generator over any (ok, p) item frame, plus the guard's
    * dropped-mass accounting AS DATA: at 100 TB an operator reads the
    * dropped-basket count from a query result or metric, not a log
    * line — and a lazy side frame also keeps plan construction free of
    * eager jobs (merely explaining q99 must not scan lineitem). The
    * stats frame shares the `sizes` aggregate with the filter join, so
    * evaluating both costs one extra reuse of a basket-count frame,
    * never a second corpus scan shape. */
  /** q88's body over a prepared (rf, p) frame — factored out so EdgeSpec
    * can drive the tiny-group degradation directly (groups with < 4 rows
    * never occur on lineitem returnflag). See the q88 QueryDef scaladoc
    * for the rank-interval derivation. */
  private[graft] def ntileNth(pr: DataFrame): DataFrame = {
    // ONE corpus pass (the q78 discipline): group sizes for the ntile
    // boundary arithmetic AND the rank selection both come from the
    // checkpointed value histogram.
    val hist = graft.operators.RankSelect.histogram(pr, "rf", "p")
      .stableCheckpoint()
    val sz = hist.groupBy("rf").agg(sum(col("_c")).as("n"))
    val quartTargets = sz.select(col("rf"), col("n"),
        explode(expr("""flatten(transform(sequence(1, 4), i -> array(
          named_struct('q', i, 'w', 'lo',
            'k', CAST((i-1) * (n div 4) + least(i-1, n % 4) + 1 AS BIGINT)),
          named_struct('q', i, 'w', 'hi',
            'k', CAST(i * (n div 4) + least(i, n % 4) AS BIGINT)))))"""))
          .as("t"))
      .select(col("rf"), col("t.q").as("quartile"),
        col("t.w").as("which"), col("t.k").as("k"))
    val frameTargets = sz
      .select(col("rf"), lit(0).as("quartile"),
        lit("first").as("which"), lit(1L).as("k"))
      .union(sz.select(col("rf"), lit(0).as("quartile"),
        lit("third").as("which"), lit(3L).as("k")))
    val picked = graft.operators.RankSelect
      .valueAtRanksFromHist(hist,
        graft.operators.RankSelect.inputBytes(pr), "rf", "p",
        quartTargets.union(frameTargets))
      // ≤ 10 matched ranks per group survive the interval filter, but
      // BOTH consumers below (byQ and frames) would otherwise re-run
      // the whole rank-selection window over the histogram — checkpoint
      // the tiny pick set so the selection pass runs ONCE (round 16
      // same-window A/B at sf0.1, min-of-2 isolated: 2.63 s without →
      // 1.78 s with; at any scale it halves the histogram-window work)
      .stableCheckpoint()
    val byQ = picked.filter(col("quartile") >= 1)
      .groupBy(col("rf"), col("quartile").cast("long").as("quartile"))
      .agg(
        (max(when(col("which") === "hi", col("k")))
          - max(when(col("which") === "lo", col("k"))) + 1L).as("n"),
        max(when(col("which") === "lo", col("p")))
          .cast("double").as("lo"),
        max(when(col("which") === "hi", col("p")))
          .cast("double").as("hi"))
      // groups with fewer than 4 rows leave trailing ntile buckets
      // EMPTY: their lo rank exceeds the group size so RankSelect
      // yields no 'lo' pick, while the hi rank (cumulative count)
      // still lands — without this filter such a quartile would emit
      // a spurious row with null n/lo that the ntile window never
      // produces. Requiring both picks degrades tiny groups to the
      // exact ntile bucket set. (EdgeSpec pins 1/2/3-row groups.)
      .filter(col("lo").isNotNull && col("hi").isNotNull)
    val frames = picked.filter(col("quartile") === 0)
      .groupBy("rf")
      .agg(max(when(col("which") === "first", col("p")))
          .cast("double").as("first_p"),
        max(when(col("which") === "third", col("p")))
          .cast("double").as("third_p"))
    byQ.join(broadcast(frames), "rf")
      .select(col("rf"), col("quartile"), col("n"), col("lo"),
        col("hi"), col("first_p"), col("third_p"))
      .orderBy("rf", "quartile")
  }

  private[graft] def cooccurPairsWithStats(items: DataFrame)
      : (DataFrame, DataFrame) = {
    val sizes = items.groupBy("ok").agg(count(lit(1)).as("bsz"))
    val stats = sizes.filter(col("bsz") > MaxBasket)
      .agg(count(lit(1)).as("dropped_groups"),
        coalesce(sum(col("bsz")), lit(0L)).as("dropped_entries"))
    val kept = items
      .join(sizes.filter(col("bsz") <= MaxBasket), Seq("ok"))
      .select("ok", "p")
    val pairs = kept.as("a")
      .join(kept.as("b"),
        col("a.ok") === col("b.ok") && col("a.p") < col("b.p"))
      .groupBy(col("a.p").as("pa"), col("b.p").as("pb"))
      .agg(count(lit(1)).as("support"))
    (pairs, stats)
  }

  /** q99's pair generator — factored so EdgeSpec can drive it with an
    * adversarial mega-basket. */
  private[graft] def cooccurPairs(items: DataFrame): DataFrame =
    cooccurPairsWithStats(items)._1

  /** 24-bit uniform from the first 6 hex digits of an md5 column —
    * the q94 lattice trick factored for reuse: both engines read the
    * identical digit window, so u is bit-identical. Spark converts
    * with native conv() (codegen'd — measured 9x cheaper than a
    * 6-way instr fold on q94); the SQL twin keeps the strpos fold
    * (DuckDB has no conv, and oracle cost is check-time only). */
  private def u24Spark(hcol: String): Column =
    expr(s"CAST(conv(substr($hcol, 1, 6), 16, 10) AS BIGINT)")

  private def u24Sql(hcol: String): String =
    (1 to 6).map { i =>
      s"(strpos('0123456789abcdef', substr($hcol, $i, 1)) - 1) * ${1L << (4 * (6 - i))}"
    }.mkString(" + ")

  /** Cumulative Poisson(1) thresholds scaled to the 24-bit uniform
    * lattice: w(u) = #{k : u >= thr(k)} reproduces Poisson(1) weights
    * from an md5-derived integer u ∈ [0, 2^24). Computed ONCE from
    * Math.exp at class init and injected as the SAME literals into the
    * Spark plan and the oracle SQL (the d29 move) — no libm call ever
    * runs per row on either engine. */
  lazy val poissonThr: Seq[Long] = { // lazy: referenced by `queries`, which initializes first
    val e1 = math.exp(-1.0)
    val cums = (0 to 7).scanLeft(0.0) { (acc, k) =>
      acc + e1 / (1 to k).foldLeft(1.0)(_ * _)
    }.drop(1) // cumulative P(X <= k), k = 0..7
    cums.map(c => math.floor(c * (1L << 24)).toLong)
  }

  /** q92's pipeline with its Observation handle — the monitoring surface
    * (`Dataset.observe`): the gate's reject statistics are computed by
    * accumulator ON the production scan (zero extra jobs — at 100 TB a
    * metrics-only rescan is a day of cluster time). The spec retrieves
    * the handle; the catalog entry returns just the frame. */
  def observedGate(s: SparkSession, dir: String)
      : (DataFrame, org.apache.spark.sql.Observation) = {
    val obs = new org.apache.spark.sql.Observation()
    val gated = t(s, dir, "lineitem")
      .observe(obs,
        count(lit(1)).as("rows_seen"),
        sum(when(col("l_quantity") > 45, 1L).otherwise(0L)).as("rows_rejected"),
        sum(when(col("l_quantity") > 45,
          col("l_quantity").cast(DecimalType(12, 2)))
          .otherwise(lit(0).cast(DecimalType(12, 2)))).as("qty_rejected"))
      .filter(col("l_quantity") <= 45)
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(12, 2)))
          .cast("double").as("qty_sum"))
      .orderBy("l_returnflag")
    (gated, obs)
  }
}
