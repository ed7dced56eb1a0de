package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import Det._

/** Reshaping + subquery + extended scalar coverage: pivot/unpivot,
  * scalar subqueries (Catalyst decorrelates them), and the null-handling
  * and string-function catalogs. All pure built-ins with portable
  * oracles.
  */
object Reshape {

  /** q_pivot — orders count+revenue per priority pivoted by status. The
    * pivot values are pinned (no extra distinct-scan job; at scale an
    * unpinned pivot costs a full pass to discover columns). Oracle:
    * FILTER-ed aggregation with matching column names. */
  def pivot(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .na.fill(0L)
      .orderBy("o_orderpriority")

  /** q_unpivot — melt the per-status counts back to long form
    * (`Dataset.unpivot`, Spark 3.4+). Oracle: UNION ALL arms. */
  def unpivot(s: SparkSession, d: String): DataFrame =
    pivot(s, d)
      .unpivot(
        Array(col("o_orderpriority")),
        Array(col("O"), col("F"), col("P")),
        "o_orderstatus", "n_orders")
      .orderBy("o_orderpriority", "o_orderstatus")

  /** q_scalar_subquery — orders above the global average price, with the
    * gap; the scalar subquery plans as a broadcast of one value, the
    * average itself via the deterministic decimal scheme. */
  def scalarSubquery(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_sq")
    s.sql("""
      SELECT o_orderkey, o_totalprice,
             o_totalprice - (SELECT CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
                                    / count(o_totalprice) FROM orders_sq) AS above_avg
      FROM orders_sq
      WHERE o_totalprice > (SELECT CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0
                                   / count(o_totalprice) FROM orders_sq)
      ORDER BY o_orderkey
    """)
  }

  /** q_null_funcs — null-handling catalog over synthesized nulls
    * (the testdata has none): nullif / coalesce / nvl2-style + null-aware
    * counting. */
  def nullFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .withColumn("maybe_status", nullif(col("o_orderstatus"), lit("O")))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(col("maybe_status")).as("n_nonnull"),
        count(lit(1)).as("n_total"),
        count(when(col("maybe_status").isNull, 1)).as("n_null"),
        coalesce(max(col("maybe_status")), lit("-")).as("max_or_dash"))
      .orderBy("o_orderpriority")

  /** q_string_funcs — extended string catalog: replace / pads / reverse /
    * strpos / levenshtein (all codegen'd builtins, present in DuckDB too). */
  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d).select(
      col("c_custkey"),
      regexp_replace(col("c_name"), "Customer", "Cust").as("short_name"),
      lpad(col("c_custkey").cast("string"), 8, "0").as("padded_key"),
      reverse(col("c_mktsegment")).as("seg_rev"),
      instr(col("c_name"), "#").cast("int").as("hash_pos"),
      levenshtein(col("c_mktsegment"), lit("MACHINERY")).as("seg_dist"),
      length(col("c_name")).as("name_len"))
      .orderBy("c_custkey")
}
