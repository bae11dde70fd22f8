package graft.queries

import graft.ops.Tables
import org.apache.spark.sql.functions._

/** q23-q28 — the relational capability surface (SURVEY.md §2.2/§2.3):
  * joins, group-by aggregation, sort/limit, grouping sets, set ops, JSON
  * scalar functions. The reference gets these from DuckDB on the read side;
  * we get them from Spark SQL built-ins. Scale notes inline per query.
  */
object RelQueries {

  val all: Seq[Q] = Seq(
    // Semi join ↔ EXISTS. customer is a dimension → broadcast, no shuffle
    // of the big side.
    Q(
      "q23_semijoin_exists",
      (s, dir) => {
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        o.join(broadcast(c), o("o_custkey") === c("c_custkey"), "left_semi")
          .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))
          .orderBy("o_orderkey")
      },
      Some("""SELECT o_orderkey, o_custkey, o_totalprice FROM orders o
        WHERE EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
        ORDER BY o_orderkey""")
    ),
    // Star join + group-by revenue. Dims (customer/nation) broadcast; only
    // lineitem⋈orders shuffles. Revenue summed EXACTLY in DECIMAL(18,4) so
    // the result is independent of partial-aggregation order (doubles would
    // be order-sensitive), then cast to double once.
    Q(
      "q24_star_join_agg",
      (s, dir) => {
        val l = Tables.lineitem(s, dir)
        val o = Tables.orders(s, dir)
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        l.join(o, l("l_orderkey") === o("o_orderkey"))
          .join(broadcast(c), o("o_custkey") === c("c_custkey"))
          .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .groupBy(col("n_name"))
          .agg(
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)"))
              .cast("double")
              .as("revenue"),
            count(lit(1)).as("n_items")
          )
          .orderBy("n_name")
      },
      Some("""SELECT n_name,
        CAST(SUM(CAST(l_extendedprice * (1e0 - l_discount) AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
        CAST(count(*) AS BIGINT) AS n_items
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name ORDER BY n_name""")
    ),
    // Sort/limit top-k. Spark plans TakeOrderedAndProject — no full sort.
    Q(
      "q25_topk",
      (s, dir) =>
        Tables
          .orders(s, dir)
          .select(
            col("o_orderkey"),
            col("o_custkey"),
            col("o_totalprice"),
            date_format(col("o_orderdate"), "yyyy-MM-dd").as("o_date")
          )
          .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
          .limit(10),
      Some("""SELECT o_orderkey, o_custkey, o_totalprice,
        strftime(o_orderdate, '%Y-%m-%d') AS o_date
        FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""")
    ),
    // Grouping sets / ROLLUP. NULLS FIRST pinned explicitly: Spark and
    // DuckDB default null ordering differ.
    Q(
      "q26_rollup",
      (s, dir) => {
        val c = Tables.customer(s, dir)
        val n = Tables.nation(s, dir)
        val r = Tables.region(s, dir)
        c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
          .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
          .rollup(col("r_name"), col("n_name"))
          .agg(count(lit(1)).as("n_customers"))
          .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
      },
      Some("""SELECT r_name, n_name, CAST(count(*) AS BIGINT) AS n_customers
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        JOIN region ON n_regionkey = r_regionkey
        GROUP BY ROLLUP(r_name, n_name)
        ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""")
    ),
    // Set op: customers who never ordered (EXCEPT = distinct anti).
    Q(
      "q27_except",
      (s, dir) =>
        Tables
          .customer(s, dir)
          .select(col("c_custkey"))
          .except(Tables.orders(s, dir).select(col("o_custkey").as("c_custkey")))
          .orderBy("c_custkey"),
      Some("""SELECT c_custkey FROM customer EXCEPT SELECT o_custkey FROM orders
        ORDER BY c_custkey""")
    ),
    // JSON scalar extraction from the events props column.
    Q(
      "q28_json_props",
      (s, dir) =>
        Tables
          .events(s, dir)
          .select(
            col("event_id"),
            get_json_object(col("props"), "$.k").cast("long").as("k")
          )
          .orderBy("event_id"),
      Some("""SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
        FROM events ORDER BY event_id""")
    )
  )
}
