package graft.catalog

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
        CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
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
        CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty
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
      "regex predicate + extract + global replace (P4 generalization)")
  )
}
