package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** Cross-engine determinism helpers.
  *
  * Double SUMs are not associative, so a parallel Spark sum and a DuckDB sum
  * can differ in the last ulp and break the driver's hash compare. We route
  * every floating aggregate through an exact decimal accumulator
  * (order-independent) and cast the final value back to double; both engines
  * then produce bit-identical results.
  */
object Det {
  private val Dec = DecimalType(38, 6)

  /** Exact, order-independent sum of a double column; returns double. */
  def dsum(c: Column): Column = sum(c.cast(Dec)).cast(DoubleType)

  /** Oracle-side equivalent of [[dsum]]. */
  def dsumSql(e: String): String =
    s"CAST(SUM(CAST(($e) AS DECIMAL(38,6))) AS DOUBLE)"

  /** Windowed variant (frame order is deterministic in both engines). */
  def dsumOver(c: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column =
    sum(c.cast(Dec)).over(w).cast(DoubleType)
}

/** Relational operator coverage: scans, filters, projections, joins
  * (broadcast/shuffle/semi/anti), aggregations, windows, sorts/limits,
  * set ops, rollup, JSON access, sessionization, latest-per-key.
  *
  * The reference has none of these (SURVEY.md §2.5-2.7: no joins, aggs,
  * windows or sorts exist in its 28 source files) — they're in scope as
  * "capabilities" of the Spark-native engine and all map to built-ins so
  * Catalyst/Tungsten optimize them (predicate pushdown, broadcast joins,
  * partial aggregation, WholeStageCodegen).
  */
object RelationalOps {
  import Det._

  /** TPC-H Q1-style pricing summary: scan + filter pushdown + hash agg. */
  def pricingSummary(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    li.groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("sum_disc_price"),
        (dsum(col("l_quantity")) / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  /** Star-schema join: fact ⋈ broadcast dims (customer, nation, region). */
  def revenueByNation(s: SparkSession, dir: String): DataFrame = {
    val o = Tables(s, dir, "orders")
    val c = Tables(s, dir, "customer")
    val n = Tables(s, dir, "nation")
    val r = Tables(s, dir, "region")
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(dsum(col("o_totalprice")).as("revenue"), count(lit(1)).as("n_orders"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Fact-fact shuffle join + agg + deterministic top-k. */
  def topOrdersByRevenue(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val o = Tables(s, dir, "orders")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .groupBy(col("o_orderkey"), col("o_orderstatus"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount"))).as("revenue"),
        count(lit(1)).as("n_lines"))
      .orderBy(col("revenue").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Left-semi join (EXISTS). */
  def customersWithOpenOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders").filter(col("o_orderstatus") === "O")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  /** Left-anti join (NOT EXISTS). */
  def customersWithoutOrders(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer")
    val o = Tables(s, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"))
      .orderBy(col("c_custkey"))
  }

  /** Window top-k per group (row_number with total tie-break order). */
  def topLinesPerSupplier(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
    li.withColumn("rn", row_number().over(w).cast(LongType))
      .filter(col("rn") <= 3)
      .select(col("l_suppkey"), col("rn"), col("l_orderkey"),
        col("l_linenumber").cast(LongType).as("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** Running aggregate over an ordered frame. Keyed on events because
    * event_id is unique — lineitem has no unique key, so a frame ordered by
    * (orderkey, linenumber) is not a total order and prefix sums would be
    * nondeterministic across engines. */
  def runningValuePerUser(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.select(col("user_id"), col("event_id"),
        dsumOver(col("value"), w).as("running_value"))
      .orderBy(col("user_id"), col("event_id"))
  }

  /** Global sort + limit (Spark TakeOrderedAndProject — no full sort). */
  def topPricedLines(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber").cast(LongType).as("l_linenumber"),
        col("l_extendedprice"))
      .orderBy(col("l_extendedprice").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)

  /** UNION / INTERSECT / EXCEPT over comparable key sets. */
  def nationSetOps(s: SparkSession, dir: String): DataFrame = {
    val c = Tables(s, dir, "customer").select(col("c_nationkey").cast(LongType).as("nationkey")).distinct()
    val su = Tables(s, dir, "supplier").select(col("s_nationkey").cast(LongType).as("nationkey")).distinct()
    val u = c.union(su).distinct().withColumn("op", lit("union"))
    val i = c.intersect(su).withColumn("op", lit("intersect"))
    val e = c.except(su).withColumn("op", lit("except"))
    u.union(i).union(e).select(col("op"), col("nationkey")).orderBy(col("op"), col("nationkey"))
  }

  /** Scalar aggregate panel incl. exact distinct counts. */
  def lineitemStats(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem").agg(
      count(lit(1)).as("n_rows"),
      countDistinct(col("l_partkey")).as("n_parts"),
      countDistinct(col("l_suppkey")).as("n_supps"),
      min(col("l_extendedprice")).as("min_price"),
      max(col("l_extendedprice")).as("max_price"),
      dsum(col("l_tax")).as("sum_tax"))

  /** ROLLUP hierarchy aggregate (NULL grouping slots coalesced). */
  def rollupByFlagStatus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"), dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"), col("n"), col("sum_qty"))
      .orderBy(col("flag"), col("status"))

  /** Event-time tumbling aggregation (batch shape of a streaming window). */
  def eventsHourly(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .groupBy(date_format(date_trunc("hour", col("ts")), "yyyy-MM-dd HH:00:00").as("hour"),
        col("event_type"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy(col("hour"), col("event_type"))

  /** Sessionization: gaps-and-islands on millisecond epochs (30 min gap).
    * Millis are used on both engines so nanosecond-precision timestamps
    * cannot produce boundary disagreements. */
  def userSessions(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), unix_millis(col("ts")).as("ems"))
    val wOrd = Window.partitionBy(col("user_id")).orderBy(col("ems"), col("event_id"))
    val flagged = ev
      .withColumn("prev", lag(col("ems"), 1).over(wOrd))
      .withColumn("new_sess",
        when(col("prev").isNull.or(col("ems") - col("prev") > lit(1800000L)), 1L).otherwise(0L))
    val sess = flagged
      .withColumn("session_id", sum(col("new_sess")).over(
        wOrd.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    sess.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("user_id"))
      .agg(max(col("session_id")).as("n_sessions"), sum(col("len")).as("n_events"),
        max(col("len")).as("max_session_len"))
      .orderBy(col("user_id"))
  }

  /** Latest-change-per-key reduction — the exact shape the materialized-view
    * sink needs before writing (SURVEY.md §2.7/§7.4 risk 3: the reference
    * applies CDC sequentially per shard; under Spark parallelism we must
    * reduce to the latest image per PK first). */
  def latestEventPerUser(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(unix_millis(col("ts")).desc, col("event_id").desc)
    ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"), col("value"))
      .orderBy(col("user_id"))
  }

  /** Window top-k via the custom TopKPerKey physical operator
    * (graft.plans.TopK): bounded per-key heaps with a map-side partial
    * before the shuffle — ≤ k rows per key per partition cross the wire,
    * no per-partition full sort (the window+row_number formulation in q06
    * shuffles and sorts everything). Same semantics, checked against the
    * same oracle shape. */
  def topLinesPerSupplierNative(s: SparkSession, dir: String): DataFrame = {
    val li = Tables(s, dir, "lineitem")
    graft.plans.TopK.topKPerKey(li, 3, Seq("l_suppkey"),
        Seq(graft.plans.TopK.desc("l_extendedprice"),
          graft.plans.TopK.asc("l_orderkey"), graft.plans.TopK.asc("l_linenumber")))
      .select(col("l_suppkey"), col("rank").as("rn"), col("l_orderkey"),
        col("l_linenumber").cast(LongType).as("l_linenumber"), col("l_extendedprice"))
      .orderBy(col("l_suppkey"), col("rn"))
  }

  /** As-of join — an operator Spark lacks natively (SURVEY.md §2.5): for
    * each purchase event, the most recent prior signup of the same user.
    * Composed efficiently as a single-shuffle union + running last_value
    * window (NOT a range self-join): both sides shuffle once on user_id,
    * then one ordered pass per user carries the latest signup forward. At
    * 100 TB this is one co-partitioned pass; a naive inequality join would
    * be quadratic per key. */
  def asofSignupForPurchase(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"), unix_millis(col("ts")).as("ems"))
      .filter(col("event_type").isin("purchase", "signup"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ems"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev
      .withColumn("last_signup",
        last(when(col("event_type") === "signup", col("event_id")), ignoreNulls = true).over(w))
      .withColumn("last_signup_ems",
        last(when(col("event_type") === "signup", col("ems")), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id"), col("ems"),
        col("last_signup").as("asof_signup_id"),
        col("last_signup_ems").as("asof_signup_ems"))
      .orderBy(col("event_id"))
  }

  /** Exact median by rank (deterministic across engines, unlike interpolated
    * percentile implementations): the value at row floor((n+1)/2) per group
    * under a total order. */
  def medianValueByType(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    ev.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("event_type"), col("value").as("median_value"), col("n").as("n_rows"))
      .orderBy(col("event_type"))
  }

  /** CUBE aggregate — all 2ⁿ grouping-set combinations in ONE pass with the
    * grouping_id bitmask distinguishing slots (the rollup q11 covers only
    * the hierarchy prefix sets). Spark expands the cube in a single Expand +
    * hash-aggregate stage with map-side combine, so the corpus is scanned
    * once and the shuffle carries (groups × sets × partitions) rows — at
    * 100 TB this replaces 2ⁿ separate GROUP BY jobs with one scan. Spark's
    * `grouping_id()` and DuckDB's `GROUPING(a, b)` use the same bitmask
    * convention (bit set = column aggregated away), checked by the gate. */
  def cubeByFlagStatus(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "lineitem")
      .cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"), count(lit(1)).as("n"),
        dsum(col("l_quantity")).as("sum_qty"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("flag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("status"),
        col("gid"), col("n"), col("sum_qty"))
      .orderBy(col("gid"), col("flag"), col("status"))

  /** Range (interval) join via time-bucket equi-join — the second temporal
    * join shape Spark lacks natively (q17 covers as-of). Semantics: for
    * every purchase event, count and sum platform-wide click events in the
    * strictly-preceding [[RangeJoinWindowMs]] window (the attribution
    * shape). There is NO selective equi key, so the naive plan is a
    * broadcast-nested-loop over the full inequality predicate — O(n²)
    * comparisons. Bucketizing time into window-sized cells turns it into a
    * plain equi-join: each click keys on its own cell, each purchase
    * explodes into the (exactly two, because cell width == window length)
    * cells its window can overlap, and the exact range predicate filters
    * the joined candidates. Fan-out per key is bounded by the per-window
    * arrival rate — the hottest 5 minutes of traffic, not the corpus — and
    * AQE's skew split covers a flash-crowd cell. Purchases with zero
    * prior clicks survive via the left-outer join + conditional count. */
  def purchaseClickAttribution(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("event_id"), col("event_type"), unix_millis(col("ts")).as("ems"),
        col("value"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(expr(s"ems div $RangeJoinWindowMs").as("bucket"),
        col("event_id").as("click_id"), col("ems").as("cems"), col("value").as("cvalue"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("ems"))
      .withColumn("bucket", explode(array(
        expr(s"ems div $RangeJoinWindowMs - 1"), expr(s"ems div $RangeJoinWindowMs"))))
    val inWin = col("cems") >= col("ems") - lit(RangeJoinWindowMs) && col("cems") < col("ems")
    purchases.join(clicks, Seq("bucket"), "left_outer")
      .groupBy(col("event_id"))
      .agg(sum(when(inWin, 1L).otherwise(0L)).as("n_clicks"),
        dsum(when(inWin, col("cvalue"))).as("click_value"))
      .orderBy(col("event_id"))
  }

  /** 5 minutes; also the bucket cell width (a window then spans ≤ 2 cells). */
  val RangeJoinWindowMs = 300000L

  /** PIVOT: revenue matrix (order priority × explicit status columns). With
    * the pivot values DECLARED, Spark plans this as ONE scan + one hash
    * aggregate whose row is the pivoted struct — no per-column pass, no
    * second shuffle; the oracle mirrors it as portable CASE aggregation
    * (statuses that never co-occur with a priority come out NULL in both
    * engines). An UNDECLARED value list would force a distinct-scan first —
    * at 100 TB always enumerate the pivot domain. */
  def revenuePivot(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "orders")
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(dsum(col("o_totalprice")))
      .orderBy(col("o_orderpriority"))

  /** Ranking-window panel: ntile / percent_rank / cume_dist / lag / lead
    * under one total order per event type — the §2.7 ranking functions not
    * already exercised by q06/q07/q13. All four are rational functions of
    * integer ranks (percent_rank = (r−1)/(n−1) as one double division), so
    * they hash-compare bitwise; the partition key is event_type with
    * per-type order (value, event_id) — a skewed type bounds a reducer by
    * its own row count, the same envelope as every doc-scoped window. */
  def rankingWindows(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables(s, dir, "events")
      .select(col("event_id"), col("event_type"), col("value"),
        ntile(4).over(w).cast(LongType).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"))
      .orderBy(col("event_id"))
  }

  /** RANGE-frame moving aggregate: per user, the sum of `value` over the
    * trailing hour by EVENT TIME (not row count — q07's ROWS frame is the
    * other half). A range frame is tie-safe by construction: rows with
    * equal timestamps are all in or all out together, so the result is
    * deterministic under any within-tie order. Millisecond epochs on both
    * engines (the q13 discipline). Scale: user_id-partitioned window —
    * high-cardinality key, reducer bounded by one user's history. */
  def movingHourSum(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ems"))
      .rangeBetween(-3600000L, 0L)
    Tables(s, dir, "events")
      .select(col("event_id"), col("user_id"), unix_millis(col("ts")).as("ems"),
        col("value"))
      .withColumn("moving_sum", dsumOver(col("value"), w))
      .select(col("event_id"), col("user_id"), col("ems"), col("moving_sum"))
      .orderBy(col("event_id"))
  }

  /** Gap-fill RESAMPLING: each user's event history resampled onto an
    * hourly grid with forward fill — the time-series regularization every
    * downstream join/model needs (sensors, prices, metrics). Composed
    * scalably as ONE pass per user: the per-user hourly grid is generated
    * with `sequence()` (a narrow explode off the per-user min/max — never
    * a global calendar cross join), grid points union with observations,
    * and a single ordered window carries the last observed value forward
    * (the q17 as-of discipline: union + running last_value beats a range
    * self-join, which would be quadratic per key). Observations sort
    * before grid points at the same instant, so a grid point ON an
    * observation picks it up deterministically. */
  def gapFillHourly(s: SparkSession, dir: String): DataFrame =
    gapFillHourlyFrom(Tables(s, dir, "events")
      .select(col("user_id"), unix_millis(col("ts")).as("ems"), col("value"),
        col("event_id")))

  /** [[gapFillHourly]]'s core over an explicit (user_id, ems, value,
    * event_id) frame — split out so the no-hour-boundary edge case (a
    * user with a single mid-hour event, which used to crash sequence())
    * is testable directly. */
  private[graft] def gapFillHourlyFrom(ev: DataFrame): DataFrame = {
    val bounds = ev.groupBy(col("user_id"))
      .agg(min(col("ems")).as("mn"), max(col("ems")).as("mx"))
    // A user whose span contains no hour boundary (single mid-hour event)
    // has grid start > mx; Spark's sequence() THROWS there while DuckDB's
    // generate_series yields an empty list — filter those users out first
    // (same zero grid rows as the oracle, no crash).
    val grid = bounds
      .filter(expr("CAST(ceil(mn / 3600000.0) AS BIGINT) * 3600000 <= mx"))
      .select(col("user_id"),
        explode(expr("sequence(CAST(ceil(mn / 3600000.0) AS BIGINT) * 3600000, mx, CAST(3600000 AS BIGINT))"))
          .as("ems"))
      .withColumn("is_obs", lit(0L))
      .withColumn("value", lit(null).cast(DoubleType))
      .withColumn("event_id", lit(null).cast(LongType))
    val obs = ev.select(col("user_id"), col("ems"), lit(1L).as("is_obs"),
      col("value"), col("event_id"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ems"), col("is_obs").desc, col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    obs.unionByName(grid.select(col("user_id"), col("ems"), col("is_obs"),
        col("value"), col("event_id")))
      .withColumn("filled", last(col("value"), ignoreNulls = true).over(w))
      .filter(col("is_obs") === 0L)
      .select(col("user_id"), col("ems").as("grid_ems"), col("filled"))
      .orderBy(col("user_id"), col("grid_ems"))
  }

  /** FUNNEL analysis: signup → first view AFTER signup → first purchase
    * AFTER that view, per user, with stage populations and step
    * conversion. The ordered-sequence constraint is what makes this an
    * operator rather than three counts: each stage's timestamp must
    * strictly follow the previous stage's, per user. Composed as chained
    * per-user conditional mins — each stage is one user-keyed aggregate
    * joined to the previous stage's (user, t) frame, so the work is three
    * user-keyed shuffles of stage-event rows; no window over the full
    * event stream, no self-join fan-out. */
  def funnel(s: SparkSession, dir: String): DataFrame = {
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ems"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ems")).as("t0"))
    val vw = ev.filter(col("event_type") === "view")
      .join(su, "user_id").filter(col("ems") > col("t0"))
      .groupBy(col("user_id")).agg(min(col("ems")).as("t1"))
    val pu = ev.filter(col("event_type") === "purchase")
      .join(vw, "user_id").filter(col("ems") > col("t1"))
      .groupBy(col("user_id")).agg(min(col("ems")).as("t2"))
    val counts = Seq(
      ("1_signup", su), ("2_view_after_signup", vw), ("3_purchase_after_view", pu))
      .map { case (name, df) =>
        df.agg(count(lit(1)).as("n_users")).select(lit(name).as("stage"), col("n_users"))
      }.reduce(_ union _)
    val w = Window.orderBy(col("stage")).rowsBetween(-1, -1)
    counts
      .withColumn("prev", sum(col("n_users")).over(w))
      .withColumn("conversion",
        when(col("prev") > 0L, col("n_users").cast(DoubleType) / col("prev").cast(DoubleType)))
      .select(col("stage"), col("n_users"), col("conversion"))
      .orderBy(col("stage"))
  }

  /** COHORT retention: users grouped by signup week, distinct-user
    * activity counted per week offset since each user's own signup — the
    * retention matrix every growth dashboard renders. One signup
    * aggregate + one user-keyed join back over the event stream + one
    * (cohort, offset) distinct-count; no per-user windows, no calendar
    * cross join. Week arithmetic is integer millisecond division on both
    * engines. */
  def cohortRetention(s: SparkSession, dir: String): DataFrame = {
    val WeekMs = 604800000L
    val ev = Tables(s, dir, "events")
      .select(col("user_id"), col("event_type"), unix_millis(col("ts")).as("ems"))
    val su = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("ems")).as("t0"))
      .withColumn("cohort_week", expr(s"t0 div $WeekMs"))
    ev.join(su, "user_id")
      .filter(col("ems") >= col("t0"))
      .withColumn("week_offset", expr(s"(ems - t0) div $WeekMs"))
      .groupBy(col("cohort_week"), col("week_offset"))
      .agg(countDistinct(col("user_id")).as("n_active"))
      .orderBy(col("cohort_week"), col("week_offset"))
  }

  /** Correlated scalar subquery through the engine's SQL surface — Catalyst
    * decorrelates it into an aggregate + join (no per-row re-execution).
    * Customers with balance above their nation's average. */
  def aboveNationAvgBalance(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("customer_v")
    s.sql(
      """SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer_v c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |  FROM customer_v c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)
      .withColumn("c_nationkey", col("c_nationkey").cast(LongType))
  }

  /** Semi-structured access: JSON property extraction from a string column. */
  def eventPropsJson(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast(LongType).as("k"))
      .orderBy(col("event_id"))
}

object Relational {
  import Det._

  /** q226: RECURSIVE CTE — k-hop reachability over a derived edge set,
    * the ONE SQL text run verbatim by BOTH engines (Spark 4's
    * WITH RECURSIVE and DuckDB's agree on the semantics; the engine-side
    * iteration q148/q192 hand-roll is here expressed declaratively).
    * Edges form a functional graph (each src has one dst: u → 7u mod 97),
    * so the recursion is a bounded chain — the depth guard is the
    * termination contract, as in any production recursive query. At
    * scale each recursion step is one join against the (broadcastable)
    * edge set; Spark executes exactly that plan per level. */
  private val recursiveReachSql: String =
    """WITH RECURSIVE edges AS (
      |  SELECT DISTINCT user_id AS src, (user_id * 7) % 97 AS dst
      |  FROM events),
      |reach(node, depth) AS (
      |  SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
      |  UNION ALL
      |  SELECT e.dst, r.depth + 1
      |  FROM reach r JOIN edges e ON e.src = r.node
      |  WHERE r.depth < 8)
      |SELECT node, CAST(min(depth) AS BIGINT) AS d
      |FROM reach GROUP BY node ORDER BY node""".stripMargin

  private def recursiveReach(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "events").createOrReplaceTempView("events")
    s.sql(recursiveReachSql)
  }

  /** q227: LATERAL correlated subquery — per-customer top-2 orders as a
    * dependent join, one SQL text for both engines (Spark plans the
    * correlation as a rewritten join + per-key limit; DuckDB as a lateral
    * nested loop — same semantics, each engine's own physical choice,
    * which is exactly the parity worth gating). The DataFrame-native
    * equivalent is q06's TopKPerKey window/heap; this is its SQL face. */
  private val lateralTopSql: String =
    """SELECT c_custkey, o.o_orderkey, o.o_totalprice
      |FROM customer,
      |LATERAL (
      |  SELECT o_orderkey, o_totalprice FROM orders
      |  WHERE o_custkey = c_custkey
      |  ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) AS o
      |WHERE c_custkey <= 200
      |ORDER BY c_custkey, o_totalprice DESC, o_orderkey""".stripMargin

  private def lateralTop(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "customer").createOrReplaceTempView("customer")
    Tables(s, dir, "orders").createOrReplaceTempView("orders")
    s.sql(lateralTopSql)
  }

  /** q229: GROUPING SETS — the generalized multi-level aggregate (rollup
    * q145 and CUBE are its special cases; this is the arbitrary-set form
    * with GROUPING() disambiguating a rolled-up NULL from a data NULL),
    * one SQL text for both engines. Spark plans it as a single Expand +
    * hash aggregate — one scan produces every grouping level, which is
    * exactly what a 100 TB reporting query wants (vs four scans + union).
    * NULLS FIRST is spelled explicitly: Spark and DuckDB default opposite
    * null orders (the dialect-pitfall discipline). */
  private val groupingSetsSql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(GROUPING(l_returnflag) AS BIGINT) AS g_rf,
      |  CAST(GROUPING(l_linestatus) AS BIGINT) AS g_ls,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus),
      |  (l_returnflag), (l_linestatus), ())
      |ORDER BY g_rf, g_ls, l_returnflag NULLS FIRST,
      |  l_linestatus NULLS FIRST""".stripMargin

  private def groupingSets(s: SparkSession, dir: String): DataFrame = {
    Tables(s, dir, "lineitem").createOrReplaceTempView("lineitem")
    s.sql(groupingSetsSql)
  }

  val queries: Seq[Q] = Seq(
    Q("q226_recursive_reach", recursiveReach, Some(recursiveReachSql)),
    Q("q227_lateral_topk", lateralTop, Some(lateralTopSql)),
    Q("q229_grouping_sets", groupingSets, Some(groupingSetsSql)),
    Q("q01_pricing_summary", RelationalOps.pricingSummary, Some(
      s"""SELECT l_returnflag, l_linestatus,
         |  ${dsumSql("l_quantity")} AS sum_qty,
         |  ${dsumSql("l_extendedprice")} AS sum_base_price,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS sum_disc_price,
         |  ${dsumSql("l_quantity")} / COUNT(*) AS avg_qty,
         |  COUNT(*) AS count_order
         |FROM lineitem
         |GROUP BY l_returnflag, l_linestatus
         |ORDER BY l_returnflag, l_linestatus""".stripMargin), headline = true),

    Q("q02_revenue_by_nation", RelationalOps.revenueByNation, Some(
      s"""SELECT r_name, n_name, ${dsumSql("o_totalprice")} AS revenue, COUNT(*) AS n_orders
         |FROM orders
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON c_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |GROUP BY r_name, n_name ORDER BY r_name, n_name""".stripMargin), headline = true),

    Q("q03_top_orders_by_revenue", RelationalOps.topOrdersByRevenue, Some(
      s"""SELECT o_orderkey, o_orderstatus,
         |  ${dsumSql("l_extendedprice * (1.0 - l_discount)")} AS revenue,
         |  COUNT(*) AS n_lines
         |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         |GROUP BY o_orderkey, o_orderstatus
         |ORDER BY revenue DESC, o_orderkey LIMIT 100""".stripMargin), headline = true),

    Q("q04_semi_join_open_orders", RelationalOps.customersWithOpenOrders, Some(
      """SELECT c_custkey, c_name, c_mktsegment FROM customer
        |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'O')
        |ORDER BY c_custkey""".stripMargin)),

    Q("q05_anti_join_no_orders", RelationalOps.customersWithoutOrders, Some(
      """SELECT c_custkey, c_name FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
        |ORDER BY c_custkey""".stripMargin)),

    Q("q06_window_topk_per_supplier", RelationalOps.topLinesPerSupplier, Some(
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin)),

    Q("q07_window_running_sum", RelationalOps.runningValuePerUser, Some(
      """SELECT user_id, event_id,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (
        |    PARTITION BY user_id ORDER BY event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running_value
        |FROM events ORDER BY user_id, event_id""".stripMargin)),

    Q("q08_sort_limit", RelationalOps.topPricedLines, Some(
      """SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice
        |FROM lineitem ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber LIMIT 100""".stripMargin)),

    Q("q09_set_ops", RelationalOps.nationSetOps, Some(
      """WITH c AS (SELECT DISTINCT CAST(c_nationkey AS BIGINT) AS nationkey FROM customer),
        |     s AS (SELECT DISTINCT CAST(s_nationkey AS BIGINT) AS nationkey FROM supplier)
        |SELECT 'union' AS op, nationkey FROM (SELECT nationkey FROM c UNION SELECT nationkey FROM s)
        |UNION ALL
        |SELECT 'intersect' AS op, nationkey FROM (SELECT nationkey FROM c INTERSECT SELECT nationkey FROM s)
        |UNION ALL
        |SELECT 'except' AS op, nationkey FROM (SELECT nationkey FROM c EXCEPT SELECT nationkey FROM s)
        |ORDER BY op, nationkey""".stripMargin)),

    Q("q10_stats_distinct", RelationalOps.lineitemStats, Some(
      s"""SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
         |  CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts,
         |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS n_supps,
         |  MIN(l_extendedprice) AS min_price, MAX(l_extendedprice) AS max_price,
         |  ${dsumSql("l_tax")} AS sum_tax
         |FROM lineitem""".stripMargin)),

    Q("q11_rollup", RelationalOps.rollupByFlagStatus, Some(
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
         |  COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)
         |ORDER BY flag, status""".stripMargin)),

    Q("q12_events_hourly", RelationalOps.eventsHourly, Some(
      s"""SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:00:00') AS hour, event_type,
         |  COUNT(*) AS n, ${dsumSql("value")} AS sum_value
         |FROM events GROUP BY 1, 2 ORDER BY hour, event_type""".stripMargin), headline = true),

    Q("q13_sessionize", RelationalOps.userSessions, Some(
      """WITH e AS (
        |  SELECT user_id, event_id, epoch_ms(ts) AS ems FROM events),
        |f AS (
        |  SELECT user_id, event_id, ems,
        |    CASE WHEN lag(ems) OVER w IS NULL OR ems - lag(ems) OVER w > 1800000 THEN 1 ELSE 0 END AS new_sess
        |  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id)),
        |s AS (
        |  SELECT user_id, CAST(SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ems, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
        |  FROM f),
        |g AS (SELECT user_id, session_id, COUNT(*) AS len FROM s GROUP BY 1, 2)
        |SELECT user_id, MAX(session_id) AS n_sessions, CAST(SUM(len) AS BIGINT) AS n_events,
        |  MAX(len) AS max_session_len
        |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin), headline = true),

    Q("q14_latest_per_key", RelationalOps.latestEventPerUser, Some(
      """SELECT user_id, event_id, event_type, value FROM (
        |  SELECT user_id, event_id, event_type, value,
        |    ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY epoch_ms(ts) DESC, event_id DESC) AS rn
        |  FROM events) t
        |WHERE rn = 1 ORDER BY user_id""".stripMargin)),

    Q("q16_topk_native", RelationalOps.topLinesPerSupplierNative, Some(
      """SELECT l_suppkey, rn, l_orderkey, l_linenumber, l_extendedprice FROM (
        |  SELECT l_suppkey, l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber, l_extendedprice,
        |    CAST(ROW_NUMBER() OVER (PARTITION BY l_suppkey
        |      ORDER BY l_extendedprice DESC, l_orderkey, l_linenumber) AS BIGINT) AS rn
        |  FROM lineitem) t
        |WHERE rn <= 3 ORDER BY l_suppkey, rn""".stripMargin), headline = true),

    Q("q17_asof_join", RelationalOps.asofSignupForPurchase, Some(
      """WITH ev AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ems FROM events
        |  WHERE event_type IN ('purchase', 'signup')),
        |j AS (
        |  SELECT user_id, event_id, event_type, ems,
        |    last_value(CASE WHEN event_type = 'signup' THEN event_id END IGNORE NULLS)
        |      OVER w AS asof_signup_id,
        |    last_value(CASE WHEN event_type = 'signup' THEN ems END IGNORE NULLS)
        |      OVER w AS asof_signup_ems
        |  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ems, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
        |SELECT user_id, event_id, ems, asof_signup_id, asof_signup_ems
        |FROM j WHERE event_type = 'purchase' ORDER BY event_id""".stripMargin)),

    Q("q18_correlated_subquery", RelationalOps.aboveNationAvgBalance, Some(
      """SELECT c_custkey, c_name, CAST(c_nationkey AS BIGINT) AS c_nationkey, c_acctbal
        |FROM customer c
        |WHERE c_acctbal > (
        |  SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
        |  FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey)
        |ORDER BY c_custkey""".stripMargin)),

    Q("q19_median_rank", RelationalOps.medianValueByType, Some(
      """WITH r AS (
        |  SELECT event_type, value, event_id,
        |    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value, event_id) AS rn,
        |    COUNT(*) OVER (PARTITION BY event_type) AS n
        |  FROM events)
        |SELECT event_type, value AS median_value, n AS n_rows
        |FROM r WHERE rn = (n + 1) // 2 ORDER BY event_type""".stripMargin)),

    Q("q15_json_extract", RelationalOps.eventPropsJson, Some(
      """SELECT event_id, CAST(props->>'$.k' AS BIGINT) AS k
        |FROM events ORDER BY event_id""".stripMargin)),

    Q("q145_cube", RelationalOps.cubeByFlagStatus, Some(
      s"""SELECT COALESCE(l_returnflag, 'ALL') AS flag, COALESCE(l_linestatus, 'ALL') AS status,
         |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid,
         |  COUNT(*) AS n, ${dsumSql("l_quantity")} AS sum_qty
         |FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
         |ORDER BY gid, flag, status""".stripMargin)),

    Q("q146_range_join", RelationalOps.purchaseClickAttribution, Some(
      s"""WITH e AS (SELECT event_id, event_type, epoch_ms(ts) AS ems, value FROM events)
         |SELECT p.event_id, COUNT(c.event_id) AS n_clicks,
         |  CAST(SUM(CAST(c.value AS DECIMAL(38,6))) AS DOUBLE) AS click_value
         |FROM (SELECT * FROM e WHERE event_type = 'purchase') p
         |LEFT JOIN (SELECT * FROM e WHERE event_type = 'click') c
         |  ON c.ems >= p.ems - ${RelationalOps.RangeJoinWindowMs}
         |  AND c.ems < p.ems
         |GROUP BY p.event_id ORDER BY p.event_id""".stripMargin)),

    Q("q153_pivot", RelationalOps.revenuePivot, Some(
      s"""SELECT o_orderpriority,
         |  ${dsumSql("CASE WHEN o_orderstatus = 'F' THEN o_totalprice END")} AS "F",
         |  ${dsumSql("CASE WHEN o_orderstatus = 'O' THEN o_totalprice END")} AS "O",
         |  ${dsumSql("CASE WHEN o_orderstatus = 'P' THEN o_totalprice END")} AS "P"
         |FROM orders GROUP BY o_orderpriority
         |ORDER BY o_orderpriority""".stripMargin)),

    Q("q164_funnel", RelationalOps.funnel, Some(
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ems FROM events),
        |su AS (SELECT user_id, MIN(ems) AS t0 FROM ev WHERE event_type = 'signup' GROUP BY user_id),
        |vw AS (SELECT e.user_id, MIN(e.ems) AS t1 FROM ev e JOIN su USING (user_id)
        |  WHERE e.event_type = 'view' AND e.ems > su.t0 GROUP BY e.user_id),
        |pu AS (SELECT e.user_id, MIN(e.ems) AS t2 FROM ev e JOIN vw USING (user_id)
        |  WHERE e.event_type = 'purchase' AND e.ems > vw.t1 GROUP BY e.user_id),
        |c AS (
        |  SELECT '1_signup' AS stage, CAST(COUNT(*) AS BIGINT) AS n_users FROM su
        |  UNION ALL
        |  SELECT '2_view_after_signup', CAST(COUNT(*) AS BIGINT) FROM vw
        |  UNION ALL
        |  SELECT '3_purchase_after_view', CAST(COUNT(*) AS BIGINT) FROM pu)
        |SELECT stage, n_users,
        |  CASE WHEN prev > 0 THEN CAST(n_users AS DOUBLE) / CAST(prev AS DOUBLE) END AS conversion
        |FROM (
        |  SELECT stage, n_users, CAST(SUM(n_users) OVER (ORDER BY stage
        |    ROWS BETWEEN 1 PRECEDING AND 1 PRECEDING) AS BIGINT) AS prev
        |  FROM c) t
        |ORDER BY stage""".stripMargin)),

    Q("q165_cohort_retention", RelationalOps.cohortRetention, Some(
      """WITH ev AS (SELECT user_id, event_type, epoch_ms(ts) AS ems FROM events),
        |su AS (SELECT user_id, MIN(ems) AS t0, MIN(ems) // 604800000 AS cohort_week
        |  FROM ev WHERE event_type = 'signup' GROUP BY user_id)
        |SELECT cohort_week, (e.ems - su.t0) // 604800000 AS week_offset,
        |  CAST(COUNT(DISTINCT e.user_id) AS BIGINT) AS n_active
        |FROM ev e JOIN su USING (user_id)
        |WHERE e.ems >= su.t0
        |GROUP BY cohort_week, week_offset
        |ORDER BY cohort_week, week_offset""".stripMargin)),

    Q("q162_range_frame", RelationalOps.movingHourSum, Some(
      """SELECT event_id, user_id, ems,
        |  CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER (PARTITION BY user_id ORDER BY ems
        |    RANGE BETWEEN 3600000 PRECEDING AND CURRENT ROW) AS DOUBLE) AS moving_sum
        |FROM (SELECT event_id, user_id, epoch_ms(ts) AS ems, value FROM events) t
        |ORDER BY event_id""".stripMargin)),

    Q("q163_gap_fill", RelationalOps.gapFillHourly, Some(
      """WITH ev AS (SELECT user_id, epoch_ms(ts) AS ems, value, event_id FROM events),
        |bounds AS (SELECT user_id, MIN(ems) AS mn, MAX(ems) AS mx FROM ev GROUP BY user_id),
        |grid AS (
        |  SELECT user_id,
        |    unnest(generate_series(CAST(ceil(mn / 3600000.0) AS BIGINT) * 3600000, mx,
        |      CAST(3600000 AS BIGINT))) AS ems
        |  FROM bounds),
        |u AS (
        |  SELECT user_id, ems, 1 AS is_obs, value, event_id FROM ev
        |  UNION ALL
        |  SELECT user_id, ems, 0, NULL, NULL FROM grid),
        |f AS (
        |  SELECT user_id, ems, is_obs,
        |    last_value(value IGNORE NULLS) OVER (
        |      PARTITION BY user_id ORDER BY ems, is_obs DESC, event_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
        |  FROM u)
        |SELECT user_id, ems AS grid_ems, filled FROM f WHERE is_obs = 0
        |ORDER BY user_id, grid_ems""".stripMargin)),

    Q("q154_ranking_windows", RelationalOps.rankingWindows, Some(
      """SELECT event_id, event_type, value,
        |  CAST(NTILE(4) OVER w AS BIGINT) AS quartile,
        |  PERCENT_RANK() OVER w AS pct_rank,
        |  CUME_DIST() OVER w AS cume,
        |  LAG(value, 1) OVER w AS prev_value,
        |  LEAD(value, 1) OVER w AS next_value
        |FROM events
        |WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
        |ORDER BY event_id""".stripMargin))
  )
}
