package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.Tables
import Det._

/** The generalized relational operator library (SURVEY.md §2.3): the
  * reference's map/filter/aggregate surface widened to the full
  * scan/join/agg/window/setop/scalar catalog, all as declarative
  * DataFrame plans so Catalyst gets pushdown, pruning, join selection
  * and AQE for free (SURVEY.md §4).
  *
  * Scale notes embedded per query; the common rules: dimension joins are
  * broadcast, fact-fact joins hash-shuffle on their keys, aggregations are
  * partial (map-side combine) by construction, every query's sort is the
  * LAST operator so it never constrains the upstream exchange.
  */
object Relational {

  /** q_scan_project — parquet scan with column pruning: ReadSchema in the
    * explain output carries only the four projected columns. */
  def scanProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_extendedprice"))
      // (l_orderkey, l_linenumber) is NOT unique in the synthetic data —
      // sort on every output column so ties are full-row duplicates and
      // the output multiset is order-stable for the hash compare.
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")

  /** q_filter_pred — range + IN-list predicates, all pushed to the parquet
    * reader (PushedFilters). */
  def filterPred(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_quantity") < 25.0 &&
        col("l_returnflag").isin("A", "R"))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), millis(col("l_shipdate")).as("shipdate_ms"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag",
        "shipdate_ms")

  /** q_hash_join — orders ⋈ customer on custkey. customer is small at any
    * SF relative to orders → Catalyst/AQE picks broadcast-hash; at true
    * fact-fact scale it degrades gracefully to shuffle-hash on the key. */
  def hashJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d),
        col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("o_custkey"), col("c_name"),
        col("c_mktsegment"), col("o_totalprice"))
      .orderBy("o_orderkey")

  /** q_multi_join — the star-schema chain lineitem⋈orders⋈customer⋈nation
    * ⋈region rolled up per region/nation. Dims broadcast; the single real
    * shuffle is lineitem⋈orders (AQE coalesced). */
  def multiJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        count(lit(1)).as("n_lines"),
        dsumExact(dprod(col("l_extendedprice"), lit(1.0) - col("l_discount"))).as("revenue"))
      .orderBy("r_name", "n_name")

  /** q_broadcast_join — explicit broadcast hint on the 5-row dim
    * (Main.java has no joins; this is the §2.3 generalization). */
  def broadcastJoin(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d)
      .join(broadcast(Tables.region(s, d)),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"), col("r_name"))
      .orderBy("n_nationkey")

  /** q_semi_join — customers with ≥1 order; left-semi never widens rows. */
  def semiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** q_anti_join — customers with no orders. */
  def antiJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy("c_custkey")

  /** q_outer_join — orders left-outer lineitem, folded to one row per
    * order (count/revenue; orders with no lines keep 0). */
  def outerJoin(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.lineitem(s, d), col("o_orderkey") === col("l_orderkey"), "left_outer")
      .groupBy(col("o_orderkey"))
      .agg(
        count(col("l_orderkey")).as("n_lines"),
        coalesce(dsum(col("l_extendedprice")), lit(0.0)).as("revenue"))
      .orderBy("o_orderkey")

  /** q_agg_q1 — TPC-H Q1-style wide aggregate: partial (map-side) combine
    * then one exchange on the 6-value grouping key. */
  def aggQ1(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsumExact(dprod(col("l_extendedprice"), lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        dsumExact(dprod(col("l_extendedprice"), lit(1.0) - col("l_discount"), lit(1.0) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** q_agg_distinct — distinct aggregate (expands to a two-stage plan;
    * Spark de-dups per group before the final count). */
  def aggDistinct(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        countDistinct(col("o_custkey")).as("n_custs"),
        count(lit(1)).as("n_orders"))
      .orderBy("o_orderpriority")

  private def customerGeo(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))

  /** q_rollup — hierarchical subtotals region→nation→grand total. */
  def rollup(s: SparkSession, d: String): DataFrame =
    customerGeo(s, d)
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_custs"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))

  /** q_cube — full cross-dimensional subtotals. */
  def cube(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(asc_nulls_first("o_orderstatus"), asc_nulls_first("o_orderpriority"))

  /** q_grouping_sets — explicit sets via the SQL surface (the DataFrame
    * API spells rollup/cube; arbitrary sets are SQL-only by design). */
  def groupingSets(s: SparkSession, d: String): DataFrame = {
    Tables.orders(s, d).createOrReplaceTempView("orders_gs")
    s.sql("""
      SELECT o_orderstatus, o_orderpriority,
             count(1) AS n_orders,
             CAST(sum(CAST(floor(o_totalprice * 10000 + 0.5) AS BIGINT)) AS DOUBLE) / 10000.0 AS sum_price
      FROM orders_gs
      GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST
    """)
  }

  /** q_window_rank — top-3 orders per customer by totalprice (ranking
    * window; tie-broken on the unique key for determinism). */
  def windowRank(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    Tables.orders(s, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")
  }

  /** q_topk_custom — q_window_rank's semantics through the engine's own
    * TopKPerKey operator (custom LogicalPlan + Strategy + SparkPlan,
    * graft.plans): bounded per-key heaps after one planner-inserted hash
    * exchange — O(n log k) and no partition sort, vs the window
    * formulation's full O(n log n) sort (and its spill at scale).
    * Same oracle as q_window_rank: the two plans must agree exactly. */
  def topKCustom(s: SparkSession, d: String): DataFrame =
    graft.plans.TopK.topKPerKey(Tables.orders(s, d),
      keys = Seq("o_custkey"),
      orderBy = Seq(("o_totalprice", true), ("o_orderkey", false)), k = 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy("o_custkey", "rn")

  /** q_window_running — running revenue per customer (analytic frame).
    * Decimal accumulator: DuckDB computes window sums via segment trees
    * (different addition order), so double accumulation would diverge. */
  def windowRunning(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, d)
      .withColumn("running_spend",
        sum(col("o_totalprice").cast(DecimalType(18, 4))).over(w).cast("double"))
      .select(col("o_custkey"), col("o_orderkey"),
        millis(col("o_orderdate")).as("orderdate_ms"), col("running_spend"))
      .orderBy("o_custkey", "orderdate_ms", "o_orderkey")
  }

  /** q_window_leadlag — the offset/position analytic family: lag/lead
    * (NULL at partition edges), first_value over the default running
    * frame, ntile quartiles — one window definition, one sort pass. */
  def windowLeadLag(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderkey"),
      lag(col("o_totalprice"), 1).over(w).as("prev_price"),
      lead(col("o_totalprice"), 1).over(w).as("next_price"),
      first(col("o_totalprice")).over(w).as("first_price"),
      ntile(4).over(w).as("quartile"))
      .orderBy("o_custkey", "o_orderkey")
  }

  /** q_monthly_rollup — calendar bucketing via date_trunc (vs the
    * epoch-aligned window() buckets elsewhere): monthly order volume. */
  def monthlyRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month_ts"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("revenue"))
      .select(millis(col("month_ts")).as("month_ms"), col("n_orders"), col("revenue"))
      .orderBy("month_ms")

  /** q_sort_limit — global top-10 (Spark plans TakeOrderedAndProject:
    * per-partition heap + driver merge, no full sort at scale). */
  def sortLimit(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey").asc,
        col("l_linenumber").asc)
      .limit(10)

  private def segA(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_mktsegment").isin("BUILDING", "MACHINERY"))
      .select(col("c_custkey"))
  private def segB(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .filter(col("c_acctbal") > 0.0)
      .select(col("c_custkey"))

  /** q_union — UNION ALL of two customer splits (bag semantics). */
  def union(s: SparkSession, d: String): DataFrame =
    segA(s, d).union(segB(s, d)).orderBy("c_custkey")

  /** q_intersect — INTERSECT (distinct) of the splits. */
  def intersect(s: SparkSession, d: String): DataFrame =
    segA(s, d).intersect(segB(s, d)).orderBy("c_custkey")

  /** q_except — EXCEPT (distinct) of the splits. */
  def except(s: SparkSession, d: String): DataFrame =
    segA(s, d).except(segB(s, d)).orderBy("c_custkey")

  private def flagKeys(s: SparkSession, d: String, flag: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === flag)
      .select(col("l_orderkey")) // multiset: orders repeat per line

  /** q_intersect_all — bag-semantics INTERSECT ALL on a genuinely
    * repeating key (order keys per returnflag): keeps min-multiplicity
    * copies, unlike the distinct form. */
  def intersectAll(s: SparkSession, d: String): DataFrame =
    flagKeys(s, d, "A").intersectAll(flagKeys(s, d, "R")).orderBy("l_orderkey")

  /** q_except_all — bag-semantics EXCEPT ALL (multiplicity subtraction). */
  def exceptAll(s: SparkSession, d: String): DataFrame =
    flagKeys(s, d, "A").exceptAll(flagKeys(s, d, "R")).orderBy("l_orderkey")

  /** q_scalar_funcs — string/date/math scalar catalog over orders, all
    * codegen'd builtins (no UDFs; SURVEY.md §2.2 "scalar functions"). */
  def scalarFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d).select(
      col("o_orderkey"),
      upper(col("o_orderpriority")).as("prio_upper"),
      substring(col("o_orderpriority"), 1, 1).as("prio_code"),
      concat(col("o_orderstatus"), lit("/"), col("o_orderpriority")).as("status_prio"),
      year(col("o_orderdate")).as("order_year"),
      month(col("o_orderdate")).as("order_month"),
      datediff(col("o_orderdate"), lit("1995-01-01").cast("date")).as("days_since_epoch_start"),
      floor(col("o_totalprice")).as("price_floor"),
      abs(col("o_totalprice") - lit(150000.0)).as("price_dev"))
      .orderBy("o_orderkey")

  /** q_array_ops — array functions over the embedding column. The head-4
    * sum is a sequential left fold in both engines → deterministic. */
  def arrayOps(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d).select(
      col("vec_id"),
      size(col("embedding")).as("dim"),
      element_at(col("embedding"), 1).cast("double").as("first_val"),
      aggregate(slice(col("embedding"), 1, 4), lit(0.0),
        (acc, x) => acc + x.cast("double")).as("head4_sum"))
      .orderBy("vec_id")

  /** q_percentiles — exact interpolated percentiles (Spark `percentile`
    * ≡ DuckDB `quantile_cont`: both linear-interpolate between order
    * statistics; rounded at the edge for the last-ulp interpolation
    * arithmetic). The exact form needs a per-group sort — at 100 TB use
    * [[approxDistinct]]-style sketches (`approx_percentile`) instead. */
  def percentiles(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 4).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 4).as("p90"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** q_stats_agg — second-moment aggregates (stddev/variance/corr).
    * Both engines accumulate moments in different orders, so the drift
    * is ~1e-12 relative; round-6/round-2 grids are far coarser. */
  def statsAgg(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(stddev_samp(col("o_totalprice")), 4).as("sd"),
        round(var_samp(col("o_totalprice")), 2).as("vr"),
        round(corr(col("o_totalprice"), col("o_custkey").cast("double")), 6).as("cr"))
      .orderBy("o_orderpriority")

  /** q_lateral_explode — the lateral-view/unnest surface: one row per
    * (order, week-of-duration) via sequence + explode, counted back. */
  def lateralExplode(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        explode(sequence(lit(0), (col("o_orderkey") % 3).cast("int"))).as("slot"))
      .groupBy(col("slot"))
      .agg(count(lit(1)).as("n"))
      .orderBy("slot")

  /** q_approx_distinct — HLL++ sketch (no-oracle: approximate by design;
    * the sketch merges associatively so it scales to any partition count). */
  def approxDistinct(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("approx_users"),
        count(lit(1)).as("n"))
      .orderBy("event_type")

  /** q_approx_quantile — mergeable percentile sketch (no-oracle:
    * approximate by design; rank error ≤ 1/accuracy). The sketch
    * merges associatively across partitions — the 100 TB replacement
    * for [[percentiles]]' exact per-group sort. The estimate is
    * spec-bounded between the exact ±1 %-rank order statistics
    * (AnalyticsSpec), the same hard-check pattern as
    * [[approxDistinct]]. */
  def approxQuantile(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(
        expr("approx_percentile(o_totalprice, 0.5, 1000)").as("p50_approx"),
        expr("approx_percentile(o_totalprice, 0.9, 1000)").as("p90_approx"),
        count(lit(1)).as("n"))
      .orderBy("o_orderpriority")

  /** q_cross_join — explicit Cartesian product of two tiny dims (every
    * nation × every region). Fine when one side is broadcast-small;
    * anything else should be an equi or banded join. */
  def crossJoin(s: SparkSession, d: String): DataFrame =
    Tables.nation(s, d).select(col("n_name"))
      .crossJoin(broadcast(Tables.region(s, d).select(col("r_name"))))
      .orderBy("n_name", "r_name")

  /** q_full_outer — FULL OUTER join: high-balance customers against
    * per-customer order counts, both unmatched sides preserved (orders
    * of non-rich customers → null acctbal; rich customers with no
    * orders → null n_orders). */
  def fullOuter(s: SparkSession, d: String): DataFrame = {
    val rich = Tables.customer(s, d)
      .filter(col("c_acctbal") > 9000.0)
      .select(col("c_custkey"), col("c_acctbal"))
    val cnt = Tables.orders(s, d)
      .groupBy(col("o_custkey")).agg(count(lit(1)).as("n_orders"))
    rich.join(cnt, col("c_custkey") === col("o_custkey"), "full_outer")
      .select(coalesce(col("c_custkey"), col("o_custkey")).as("custkey"),
        col("c_acctbal"), col("n_orders"))
      .orderBy("custkey")
  }

  /** q_shuffle_hash_join — the SHUFFLE_HASH hint: both sides hash-
    * partition and the smaller builds an in-memory hash table per
    * partition — no sort of either side (vs SortMergeJoin), the right
    * choice when one side fits per-partition memory but is too big to
    * broadcast. Results identical to the plain join (oracle: plain SQL). */
  def shuffleHashJoin(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).hint("shuffle_hash"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("total_qty"))
      .orderBy("o_orderstatus")

  /** q_tpch_q6 — TPC-H Q6 (forecast revenue change): the pushdown
    * showcase — every predicate reaches the parquet reader
    * (PushedFilters on shipdate range, discount band, quantity), the
    * scan reads 4 of 11 columns, and the whole query is one partial+
    * final aggregate with zero joins. */
  def tpchQ6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) &&
        col("l_quantity") < 24.0)
      .agg(dsumExact(dprod(col("l_extendedprice"), col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))

  /** q_tpch_q3 — TPC-H Q3 shape (shipping priority): segment-filtered
    * customer ⋈ orders ⋈ lineitem with date bounds on both sides of the
    * pipeline, per-order revenue rollup, top-10 by revenue. Customer is
    * the broadcast dim; revenue is exact decimal so the ranking is
    * engine-independent. */
  def tpchQ3(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") > lit("1997-06-01").cast("timestamp"))
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") < lit("1997-06-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)
        .filter(col("c_mktsegment") === "BUILDING")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg(dsumExact(dprod(col("l_extendedprice"),
        lit(1.0) - col("l_discount"))).as("revenue"))
      .select(col("l_orderkey"), col("revenue"),
        millis(col("o_orderdate")).as("orderdate_ms"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)

  /** q_nullsafe_join — null-safe equality join (`<=>` / IS NOT DISTINCT
    * FROM): NULL keys MATCH each other, unlike plain `=` where they
    * silently drop — the semantic every dedup-on-nullable-key and
    * SCD-merge pipeline needs. Two derived order sets join on a
    * nullable bucket; the NULL<=>NULL group must survive with a real
    * count. Planner note: `<=>` still hashes (EqualNullSafe is a valid
    * hash-join key, null hashing to a bucket), so the plan is the same
    * shuffled hash/broadcast join as `=` — no nested-loop penalty. */
  def nullsafeJoin(s: SparkSession, d: String): DataFrame = {
    // thin both sides first (97/89 strides) — a null-safe key is still a
    // hash key, but bucket cardinality is 7, so unfiltered sides would
    // build quadratic per-bucket pair counts
    def side(tag: String, stride: Int) = Tables.orders(s, d)
      .filter(col("o_orderkey") % stride === 0)
      .select(col("o_orderkey").as(s"k_$tag"),
        when(col("o_orderkey") % 7 === 0, lit(null).cast("long"))
          .otherwise(col("o_orderkey") % 7).as(s"b_$tag"))
    side("l", 97).join(side("r", 89), col("b_l") <=> col("b_r"))
      .groupBy(col("b_l"))
      .agg(count(lit(1)).as("n_pairs"), min(col("k_l")).as("min_k"))
      .select(coalesce(col("b_l").cast("string"), lit("NULL")).as("bucket"),
        col("n_pairs"), col("min_k"))
      .orderBy("bucket")
  }

  /** q_tpch_q5 — TPC-H Q5 shape (local supplier volume): the 6-table
    * star — lineitem ⋈ orders ⋈ customer ⋈ supplier ⋈ nation ⋈ region
    * with the c_nationkey = s_nationkey locality predicate — rolled up
    * to per-nation revenue. The fact table never shuffles for a dim:
    * customer/supplier/nation/region all broadcast (they are
    * vocabulary-sized at any scale); the only exchanges are the
    * fact⋈orders key shuffle and the final nation rollup. Revenue is
    * exact decimal so the DESC ranking is engine-independent. */
  def tpchQ5(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
        .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
          col("o_orderdate") < lit("1998-01-01").cast("timestamp")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Tables.customer(s, d)), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, d)),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(dsumExact(dprod(col("l_extendedprice"),
        lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("n_name").asc)
}
