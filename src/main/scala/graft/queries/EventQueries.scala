package graft.queries

import graft.Tables
import graft.functions.Canonical
import graft.operators.{AsOf, Discover, Drift, Scd2, Sessionize, Sketches}
import graft.streaming.StreamingDiff
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Events-stream, orchestration-parity, and join-shaped queries:
  * windowed chunk checksums (the batch answer the streaming diff
  * converges to), JSON property extraction, latest-per-key (P8/W1),
  * stale-config anti-join (J3/P7/U2), and a broadcast-joined revenue
  * rollup exercising Catalyst's join planning.
  */
object EventQueries {

  private def ev(s: SparkSession, dir: String) = Tables.load(s, dir, "events")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Batch face of the streaming windowed chunk checksum (§2.10): a
    // finished stream window equals this exact relation.
    "events_hourly_checksum" -> ((s, dir) =>
      StreamingDiff.windowedChecksums(ev(s, dir), "1 hour")
        .orderBy("window_start", "event_type")),

    // Batch face of the dual-stream windowed diff (§2.10's other half —
    // VERDICT r04 next #6): downstream is a deterministic, SQL-mirrorable
    // perturbation (every 97th event dropped, every 101st value bumped);
    // the one-aggregation conditional-sum shape must surface exactly the
    // windows that drifted, with per-side counts and checksums.
    "events_windowed_diff" -> ((s, dir) => {
      val up = ev(s, dir)
      val down = up.filter(col("event_id") % 97 =!= 0)
        .withColumn("value",
          when(col("event_id") % 101 === 0, col("value") + 1.0)
            .otherwise(col("value")))
      StreamingDiff.windowedDiff(up, down, "1 hour")
        .orderBy("window_start", "event_type")
    }),

    // Hierarchical rollup (grouping sets): per (event_type, hour), per
    // event_type, and grand total in ONE aggregation pass — Spark expands
    // the grouping sets before the exchange, so the three levels share a
    // single shuffle instead of three scans. Keys are coalesced to
    // sentinels ('ALL' / -1) and the level is the ANSI grouping_id bitmask.
    "events_rollup" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("hr", date_trunc("hour", col("ts")))
        .rollup(col("event_type"), col("hr"))
        .agg(grouping_id().cast("int").as("gid"),
          count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast(LongType)).as("cents"))
        .select(
          coalesce(col("event_type"), lit("ALL")).as("event_type_k"),
          coalesce(Canonical.epochMs(col("hr")), lit(-1L)).as("hr_ms"),
          col("gid"), col("cnt"), col("cents"))
        .orderBy("gid", "event_type_k", "hr_ms")),

    // Partition-pruned read: events written out partitioned by day (the
    // 100 TB layout), read back with a day filter that prunes at the FILE
    // level — the scan's PartitionFilters skip every other day's files
    // (spec-asserted); only the matching day is ever decoded.
    "events_partition_prune" -> ((s, dir) => {
      val out = graft.Scratch.dir("events_part_")
      ev(s, dir).withColumn("event_date", to_date(col("ts")))
        .write.mode("overwrite").partitionBy("event_date").parquet(out)
      s.read.parquet(out)
        .filter(col("event_date") === lit("2024-01-03"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(round(col("value") * 100).cast(LongType)).as("cents"))
        .orderBy("event_type")
    }),

    // At-least-once ingestion hygiene: every 9th event redelivered 5s
    // later; keep-first dedup surfaces each replayed id with its delivery
    // count and first-seen time (epoch millis — the canonical ts form).
    // One groupBy shuffle on event_id with map-side partial min/count.
    "events_dedup_replay" -> ((s, dir) => {
      val up = ev(s, dir)
      val replay = up.filter(col("event_id") % 9 === 0)
        .withColumn("ts", col("ts") + expr("INTERVAL 5 SECONDS"))
      up.unionByName(replay)
        .groupBy("event_id")
        .agg(count(lit(1)).as("n_deliveries"),
          Canonical.epochMs(min(col("ts"))).as("first_ts_ms"))
        .filter(col("n_deliveries") > 1)
        .orderBy("event_id")
    }),

    // SCD-2 interval build (CDC face of S6 snapshot semantics): each
    // user's consecutive same-type events collapse into versioned
    // validity intervals; the open interval is the current state. One
    // exchange services the run detection, the run rollup, AND the
    // lead(valid_to) stitch.
    "events_scd2" -> ((s, dir) =>
      Scd2.intervals(ev(s, dir)).orderBy("user_id", "version")),

    // Top session PATHS — the navigation census behind funnel design:
    // each session (same 12 h gap rule as events_sessionize) becomes its
    // ordered event-type string, and the corpus votes on the most common
    // journeys. Path assembly is per-session (bounded), the census is a
    // map-side-partial groupBy on the path string, top-10 is TakeOrdered.
    "events_top_paths" -> ((s, dir) => {
      val paths = Sessionize.assign(ev(s, dir), 43200L)
        .withColumn("ts_ms", Canonical.epochMs(col("ts")))
        .groupBy("user_id", "session_seq")
        .agg(expr("array_join(transform(array_sort(collect_list(" +
          "struct(ts_ms, event_id, event_type))), x -> x.event_type), '>')")
          .as("path"))
      paths.groupBy("path").agg(count(lit(1)).as("n_sessions"))
        .orderBy(col("n_sessions").desc, col("path")).limit(10)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("n_sessions").desc,
            col("path"))).cast(IntegerType))
        .orderBy("rank")
    }),

    // Per-user behavioral diversity as GINI IMPURITY in exact micro
    // units — the log-free entropy stand-in (1 − Σp² needs only integer
    // squares over a common denominator, where Shannon entropy's log is
    // library-dependent): gini_micro = (n² − Σc²)·1e6 div n². Squares
    // run in DECIMAL(38,0) (counts past ~3e9 wrap int64 silently — the
    // pmi precedent). Top-20 most-diverse users, TakeOrdered.
    "events_user_gini" -> ((s, dir) => {
      val perType = ev(s, dir).groupBy("user_id", "event_type")
        .agg(count(lit(1)).as("c"))
      val g = perType.groupBy("user_id")
        .agg(sum("c").as("n"),
          sum(expr("CAST(c AS DECIMAL(38,0)) * c")).as("sq"))
        .withColumn("gini_micro", expr(
          "CAST(((CAST(n AS DECIMAL(38,0)) * n - sq) * 1000000) " +
            "div (CAST(n AS DECIMAL(38,0)) * n) AS BIGINT)"))
        .select(col("user_id"), col("n").as("n_events"), col("gini_micro"))
      g.orderBy(col("gini_micro").desc, col("user_id")).limit(20)
        .withColumn("rank",
          row_number().over(Window.orderBy(col("gini_micro").desc,
            col("user_id"))).cast(IntegerType))
        .orderBy("rank")
    }),

    // Incremental view maintenance: the standing aggregate is NOT
    // rescanned when a delta arrives — the base partial (96/97ths of the
    // stream) and the delta partial (the rest) merge by sum, and the
    // oracle is the FULL recompute, so equality proves the algebraic
    // merge is lossless. This is the maintenance shape that makes a
    // 100 TB rollup affordable: per-ingest cost follows the delta, not
    // the table.
    "events_incremental_agg" -> ((s, dir) => {
      val e = ev(s, dir)
        .withColumn("cents", round(col("value") * 100).cast(LongType))
      def part(pred: org.apache.spark.sql.Column) = e.filter(pred)
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"), sum("cents").as("cents_sum"))
      part(col("event_id") % 97 =!= 0)
        .unionByName(part(col("event_id") % 97 === 0))
        .groupBy("event_type")
        .agg(sum("cnt").as("cnt"), sum("cents_sum").as("cents_sum"))
        .orderBy("event_type")
    }),

    // Distribution drift (Drift scaladoc): two-sample KS permille + χ²
    // micro between upstream values and the standard deterministic
    // perturbation — catches the systematic shift a row-count compare
    // can't see. Same downstream derivation as events_windowed_diff.
    "events_value_drift" -> ((s, dir) => {
      val up = ev(s, dir)
      val down = up.filter(col("event_id") % 97 =!= 0)
        .withColumn("value",
          when(col("event_id") % 101 === 0, col("value") + 1.0)
            .otherwise(col("value")))
      Drift.twoSampleDrift(up, down, 5000L)
    }),

    // Direct-follows graph (process mining): the OBSERVED event-type
    // transition structure per user stream — counts and integer-permille
    // transition probabilities for each (from, to) edge, plus the median-
    // free mean gap in exact ms. The funnel assumes an order; this
    // DISCOVERS it. One lead() window per user partition; edge aggregation
    // is map-side partial; the per-source totals broadcast back.
    "events_dfg" -> ((s, dir) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
      val e = ev(s, dir)
        .withColumn("ts_ms", Canonical.epochMs(col("ts")))
        .withColumn("next_type", lead("event_type", 1).over(w))
        .withColumn("next_ms", lead("ts_ms", 1).over(w))
        .filter(col("next_type").isNotNull)
      val edges = e.groupBy(col("event_type").as("from_type"),
        col("next_type").as("to_type"))
        .agg(count(lit(1)).as("transitions"),
          sum(col("next_ms") - col("ts_ms")).as("gap_ms_total"))
      val outTotals = edges.groupBy("from_type")
        .agg(sum("transitions").as("from_total"))
      edges.join(broadcast(outTotals), "from_type")
        .select(col("from_type"), col("to_type"), col("transitions"),
          expr("transitions * 1000 div from_total").as("permille"),
          expr("gap_ms_total div transitions").as("mean_gap_ms"))
        .orderBy("from_type", "to_type")
    }),

    // Zero-filled hourly time spine — the completeness audit a monitoring
    // pipeline runs before trusting any rate metric: a missing HOUR is
    // invisible to every groupBy (absent groups produce no row), so the
    // spine is generated from the observed bounds (1-row aggregate → a
    // sequence projection, no join) and the per-hour counts LEFT-join
    // onto it; `is_gap` marks silent outage windows.
    "events_gap_fill" -> ((s, dir) => {
      val e = ev(s, dir)
        .withColumn("hr_ms", Canonical.epochMs(date_trunc("hour", col("ts"))))
      val bounds = e.agg(min("hr_ms").as("h0"), max("hr_ms").as("h1"))
      val spine = bounds.select(
        explode(expr("sequence(h0, h1, 3600000L)")).as("hr_ms"))
      val counts = e.groupBy("hr_ms").agg(count(lit(1)).as("n"))
      spine.join(counts, Seq("hr_ms"), "left")
        .select(col("hr_ms"), coalesce(col("n"), lit(0L)).as("cnt"),
          (coalesce(col("n"), lit(0L)) === 0L).as("is_gap"))
        .orderBy("hr_ms")
    }),

    // Equi-width value histogram in exact cents (the money-canonical
    // round(x*100) lane): 50.00-wide bins with per-bin count/min/max/sum
    // — the distribution shape equi-depth deciles can't show (empty and
    // sparse regions disappear under equi-depth).
    "events_value_histogram" -> ((s, dir) =>
      ev(s, dir)
        .select(round(col("value") * 100).cast(LongType).as("cents"))
        .withColumn("bin", expr("cents div 5000L"))
        .groupBy("bin")
        .agg(count(lit(1)).as("cnt"), min("cents").as("min_cents"),
          max("cents").as("max_cents"), sum("cents").as("sum_cents"))
        .orderBy("bin")),

    // Mergeable quantile sketch (hash-Bernoulli sample at 200‰) with the
    // exact rank-error audit — the approximate quantile lane next to the
    // exact length_quantiles, deterministic and order-free by
    // construction (see Quantiles.sampleQuantiles scaladoc).
    "events_quantile_sketch" -> ((s, dir) =>
      graft.operators.Quantiles.sampleQuantiles(
        ev(s, dir).select(col("event_type"), col("event_id"),
          round(col("value") * 100).cast(LongType).as("cents")),
        "event_type", "event_id", "cents")
        .orderBy("event_type", "q")),

    // Sketch-merge face (Quantiles.sampleRelation scaladoc): two
    // shard-local sample relations (event_id parity split), merged by
    // UNION, quantiles re-extracted — oracled against the one-pass
    // sketch over the whole table, so the green row IS the proof that
    // sample-union == union-sample.
    "quantile_sketch_merge" -> ((s, dir) => {
      val base = ev(s, dir).select(col("event_type"), col("event_id"),
        round(col("value") * 100).cast(LongType).as("cents"))
      val shardA = graft.operators.Quantiles.sampleRelation(
        base.filter(col("event_id") % 2 === 0),
        "event_type", "event_id", "cents")
      val shardB = graft.operators.Quantiles.sampleRelation(
        base.filter(col("event_id") % 2 =!= 0),
        "event_type", "event_id", "cents")
      graft.operators.Quantiles
        .quantilesFromSample(shardA.unionByName(shardB))
        .select(col("g").as("event_type"), col("q"), col("n_sample"),
          col("est_v"), col("est_id"))
        .orderBy("event_type", "q")
    }),

    // Behavioral co-occurrence: Jaccard (integer micro-units) between the
    // user sets of every event-type pair — the audience-overlap diagnostic
    // behind mixture/dedup decisions. The self-join keys on user_id (the
    // distinct relation is |users|x|types|, tiny after dedup) and both
    // per-type size lookups broadcast.
    "events_type_affinity" -> ((s, dir) => {
      val ut = ev(s, dir).select("user_id", "event_type").distinct()
      val sizes = ut.groupBy("event_type").agg(count(lit(1)).as("nu"))
      ut.as("x").join(ut.as("y"), Seq("user_id"))
        .filter(col("x.event_type") < col("y.event_type"))
        .groupBy(col("x.event_type").as("type_a"),
          col("y.event_type").as("type_b"))
        .agg(count(lit(1)).as("both_users"))
        .join(broadcast(sizes.select(col("event_type").as("type_a"),
          col("nu").as("users_a"))), "type_a")
        .join(broadcast(sizes.select(col("event_type").as("type_b"),
          col("nu").as("users_b"))), "type_b")
        .withColumn("jaccard_micro",
          expr("both_users * 1000000 div (users_a + users_b - both_users)"))
        .select("type_a", "type_b", "users_a", "users_b", "both_users",
          "jaccard_micro")
        .orderBy("type_a", "type_b")
    }),

    // Point-in-time lookup: every event joined to the user's latest
    // purchase at-or-before its timestamp via the union-trick as-of join
    // (one key shuffle, no range-join blowup); DuckDB's native ASOF JOIN
    // is the oracle.
    "events_asof" -> ((s, dir) => {
      val e = ev(s, dir)
      AsOf.asOf(e, e.filter(col("event_type") === "purchase"),
        "user_id", "ts", Seq("event_id", "value"))
        .select(col("user_id"), col("event_id"),
          Canonical.epochMs(col("ts")).as("ts_ms"), col("event_type"),
          col("asof_event_id"), col("asof_value"))
        .orderBy("event_id")
    }),

    // Staleness-bounded as-of (AsOf.asOfWithin scaladoc): each click
    // attaches its user's most recent view ONLY if at most 1 hour old —
    // an older match is as good as none. Same one-shuffle union-trick
    // plan; the bound is a projection, not a join predicate.
    "events_asof_tolerance" -> ((s, dir) => {
      val e = ev(s, dir)
      AsOf.asOfWithin(e.filter(col("event_type") === "click"),
        e.filter(col("event_type") === "view"),
        "user_id", "ts", Seq("event_id", "value"), 3600000L)
        .select(col("user_id"), col("event_id"),
          Canonical.epochMs(col("ts")).as("ts_ms"),
          col("asof_event_id"), col("asof_value"))
        .orderBy("event_id")
    }),

    "events_json" -> ((s, dir) =>
      ev(s, dir)
        .withColumn("k",
          get_json_object(col("props"), "$.k").cast(LongType))
        .groupBy("event_type")
        .agg(count(lit(1)).as("cnt"),
          sum(col("k")).as("sum_k"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("sum_value"))
        .orderBy("event_type")),

    // Trailing-window range join via bucket binning: each purchase
    // against the same user's clicks in the preceding 24 h. The θ-join
    // (BETWEEN) would plan as a per-key cartesian; binning restores an
    // AQE-eligible equi-join on (user, day-bucket) with the interval as
    // a residual filter — see RangeJoin's scale note.
    "events_range_join" -> ((s, dir) => {
      val e = ev(s, dir)
      graft.operators.RangeJoin.trailingAgg(
        e.filter(col("event_type") === "purchase"),
        e.filter(col("event_type") === "click"),
        "user_id", "ts", "value", 86400000L, Seq("event_id"))
        .orderBy("event_id")
    }),

    // Salted equi-join (the JOIN face of events_salted_agg's two-phase
    // aggregation): the big skewed side salts, the per-user profile
    // replicates once per salt, and the result must be IDENTICAL to the
    // plain join — the oracle is that plain join.
    "events_skew_join" -> ((s, dir) => {
      val e = ev(s, dir)
      val profile = e.groupBy("user_id")
        .agg(Canonical.epochMs(min(col("ts"))).as("first_ms"),
          count(lit(1)).as("user_events"))
      graft.functions.Salt.saltedJoin(e, profile, "user_id", 8)
        .select(col("event_id"), col("user_id"), col("event_type"),
          col("first_ms"), col("user_events"))
        .orderBy("event_id")
    }),

    // First-touch attribution: sessions credited to their opening
    // event_type, purchases rolled up per channel — the channel rides
    // the SAME user-key window exchange that numbers the sessions.
    "session_attribution" -> ((s, dir) =>
      graft.operators.Sessionize.attribution(ev(s, dir), 43200L)
        .orderBy("channel")),

    // Z-order (Morton) layout: events clustered along the interleaved
    // (user_id, hour) curve into 16 equal-depth files; the output is each
    // file's bounding box over BOTH dimensions — the min/max footer stats
    // a scan would prune on. Bit-exact integer arithmetic end to end.
    "zorder_layout" -> ((s, dir) =>
      graft.operators.ZOrder.layout(
        ev(s, dir)
          .select(col("event_id"), col("user_id"),
            Canonical.epochMs(col("ts")).as("__ms"))
          .select(col("event_id"), col("user_id"),
            expr("__ms div 3600000").as("hr")),
        "user_id", "hr", "event_id", 16)
        .orderBy("file_id")),

    // Gap-based sessionization rollup (12 h gap — the fixture's per-user
    // event density is ~1/11 h, so a web-style 30-min gap would make
    // nearly every event its own session): one user-key shuffle
    // serves the lag window, the session-seq running sum, AND the
    // per-session aggregate (grouping by (user, session_seq) reuses the
    // user-hash exchange).
    "events_sessionize" -> ((s, dir) =>
      graft.operators.Sessionize.sessions(ev(s, dir), 43200L)
        .orderBy("user_id", "session_seq")),

    // Rolling per-user aggregates over the previous 5 events; the summed
    // value is canonical cents so the windowed sum is integral (float
    // window sums would depend on the engine's accumulation order).
    "events_rolling" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").asc, col("event_id").asc)
        .rowsBetween(-4, Window.currentRow)
      ev(s, dir).select(
        col("event_id"), col("user_id"), Canonical.epochMs(col("ts")).as("ts_ms"),
        count(lit(1)).over(w).as("roll_cnt"),
        sum(expr("CAST(round(value * 100) AS BIGINT)")).over(w)
          .as("roll_cents"))
        .orderBy("event_id")
    }),

    // Heavy-hitter diagnostic: which keys would need the salting in
    // `events_salted_agg`, and how hot they are.
    "events_key_skew" -> ((s, dir) =>
      graft.functions.Salt.keyStats(ev(s, dir), "user_id", 20)),

    // Volume-anomaly flags: hours whose event count exceeds 2x the
    // type's average hour, all-integer (cnt * n_hours > 2 * total) so the
    // threshold is exact in both engines — the monitoring pass a pipeline
    // runs over ingest rates. The raw log collapses to (type, hour)
    // partials map-side; the per-type window then sees |hours| rows per
    // type, never events, so the plan scales with the calendar, not the
    // corpus.
    "events_hourly_anomaly" -> ((s, dir) => {
      val w = Window.partitionBy("event_type")
      ev(s, dir)
        .groupBy(col("event_type"), date_trunc("hour", col("ts")).as("hour_ts"))
        .agg(count(lit(1)).as("cnt"))
        .withColumn("anomaly",
          col("cnt") * count(lit(1)).over(w) > sum(col("cnt")).over(w) * 2)
        .select(col("event_type"), Canonical.epochMs(col("hour_ts")).as("hour_ms"),
          col("cnt"), col("anomaly"))
        .orderBy("event_type", "hour_ms")
    }),

    // Ordered conversion funnel: users reaching view -> click -> purchase
    // in order, counted in one aggregation over the per-user reach times.
    "events_funnel" -> ((s, dir) =>
      graft.operators.Funnel.reach(ev(s, dir),
        Seq("view", "click", "purchase")).orderBy("step")),

    // Cohort retention: users bucketed by first-activity week, counted at
    // each later active week offset. Weeks are integer epoch-week indexes
    // (epoch_ms div week_ms) — no calendar/timezone arithmetic, so the
    // oracle mirrors it exactly. The (user, week) distinct relation is
    // the only pass over the raw log.
    "events_retention" -> ((s, dir) => {
      val uw = ev(s, dir)
        .select(col("user_id"), Canonical.epochMs(col("ts")).as("__ms"))
        .select(col("user_id"), expr("__ms div 604800000").as("wk"))
        .distinct()
      val w = Window.partitionBy("user_id")
      uw.withColumn("cohort_wk", min(col("wk")).over(w))
        .groupBy(col("cohort_wk"), (col("wk") - col("cohort_wk")).as("week_offset"))
        .agg(count(lit(1)).as("users"))
        .orderBy("cohort_wk", "week_offset")
    }),

    "latest_per_key" -> ((s, dir) => {
      val w = Window.partitionBy("user_id")
        .orderBy(col("ts").desc, col("event_id").desc)
      ev(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          Canonical.epochMs(col("ts")).as("ts_ms"))
        .orderBy("user_id")
    }),

    // J3/P7: configs-on-disk \ currently-discovered tables -> stale list.
    // "On disk" = one config per fixture table (what a previous, broader
    // run would have generated).
    "stale_configs" -> ((s, dir) => {
      import s.implicits._
      val onDisk = Tables.all.map(t => ("main", t, s"main_$t.toml"))
        .toDF("schema_name", "table_name", "config_file")
      val current = Discover.discover(s, dir, Discover.defaultCheckSql(5000))
      onDisk.join(current, Seq("schema_name", "table_name"), "left_anti")
        .orderBy("table_name")
    }),

    // Skew-salted two-phase aggregation must be SEMANTICS-INVARIANT:
    // the oracle is the plain GROUP BY. Summed value is the canonical
    // money integer (round(value*100) as bigint) — integer partial sums
    // re-combine exactly, which is WHY the engine's checksum lanes are
    // integral (float sums would drift under salting).
    "events_salted_agg" -> ((s, dir) => {
      val e = ev(s, dir)
        .withColumn("value_c", expr("CAST(round(value * 100) AS BIGINT)"))
      graft.functions.Salt.saltedSum(e, "event_type", "value_c", 8)
        .withColumnRenamed("sum", "value_sum")
        .join(graft.functions.Salt.saltedCount(e, "event_type", 8),
          Seq("event_type"))
        .orderBy("event_type")
    }),

    // Broadcast-join revenue rollup (small dims broadcast; exact decimal
    // revenue for deterministic top-k).
    "q3_segment_revenue" -> ((s, dir) => {
      val customer = Tables.load(s, dir, "customer")
      val orders = Tables.load(s, dir, "orders")
      val lineitem = Tables.load(s, dir, "lineitem")
      val revenue = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(30,4)")
      lineitem
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(customer.filter(col("c_mktsegment") === "BUILDING")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("o_orderkey")
        .agg(sum(revenue).as("rev_dec"),
          first(Canonical.epochMs(col("o_orderdate").cast("timestamp")))
            .as("o_orderdate_ms"))
        // rank on the exact decimal, then cast for display — a double tie
        // at the top-10 boundary could otherwise disagree with the oracle
        .orderBy(col("rev_dec").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("rev_dec").cast("double").as("revenue"),
          col("o_orderdate_ms"))
    }),

    // TPC-H Q5-shaped multiway star join (local-supplier volume): the
    // c_nationkey = s_nationkey twist makes the customer join a TWO-key
    // equi-join, so the plan must thread the supplier nation through the
    // fact chain. Dims (supplier/nation/region) broadcast — at 100 TB the
    // lineitem-orders-customer spine shuffles on its keys and nothing
    // else moves. Exact decimal revenue, cast for display.
    "q5_region_revenue" -> ((s, dir) => {
      val li = Tables.load(s, dir, "lineitem")
      val ord = Tables.load(s, dir, "orders")
      val cust = Tables.load(s, dir, "customer")
      val supp = Tables.load(s, dir, "supplier")
      val nat = Tables.load(s, dir, "nation")
      val reg = Tables.load(s, dir, "region")
      val revenue = (col("l_extendedprice").cast("decimal(18,2)") *
        (lit(1).cast("decimal(18,2)") - col("l_discount").cast("decimal(18,2)")))
        .cast("decimal(30,4)")
      li.join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(sum(revenue).as("rev_dec"), count(lit(1)).as("n_lineitems"))
        .orderBy(col("r_name"), col("n_name"))
        .select(col("r_name"), col("n_name"),
          col("rev_dec").cast("double").as("revenue"), col("n_lineitems"))
    }),

    // Deterministic HLL sketch (md5-hash registers — Sketches scaladoc):
    // per-event-type user cardinality estimate, oracle-exact including
    // the estimate itself, with the realized error reported alongside.
    "hll_distinct" -> ((s, dir) =>
      Sketches.hllDistinct(ev(s, dir), "user_id", "event_type")
        .orderBy("event_type")),

    // Sketch associativity as a relation: the __ALL__ row's registers are
    // bucket-wise maxes of the per-type registers — no second scan of the
    // data — and its estimate is still oracle-exact.
    "hll_rollup" -> ((s, dir) =>
      Sketches.hllRollup(ev(s, dir), "user_id", "event_type")
        .orderBy("event_type")),

    // Count-min sketch (md5-salted depth hashes — Sketches scaladoc):
    // top-10 heavy hitters' frequency estimates from 4096 counters, the
    // exact lane alongside only to pin the one-sided error.
    "cms_heavy_hitters" -> ((s, dir) =>
      Sketches.cmsHeavyHitters(ev(s, dir), "user_id", k = 10)),

    // CMS merge-by-sum associativity as a relation: the __ALL__ row's
    // counters are bucket-wise sums of the per-type counters — no second
    // scan — and each group's top-1 key estimate is oracle-exact.
    "cms_rollup" -> ((s, dir) =>
      Sketches.cmsRollup(ev(s, dir), "user_id", "event_type")),

    // Sketch algebra, step 3: intersection by inclusion-exclusion over
    // the SAME registers that answer the per-set cardinalities — how many
    // customers ordered in both 1995 and 1996, without a distinct-join.
    "hll_overlap" -> ((s, dir) => {
      // sargable two-year window (OlapQueries.tsRange rationale): the
      // range pushes to the scan; the per-row year() stays only in the
      // set-label projection where it prunes nothing
      val o = Tables.load(s, dir, "orders")
        .filter(col("o_orderdate") >= lit("1995-01-01").cast("timestamp_ntz")
          && col("o_orderdate") < lit("1997-01-01").cast("timestamp_ntz"))
      Sketches.hllOverlap(o, "o_custkey",
        when(year(col("o_orderdate")) === 1995, "A").otherwise("B"))
    }),

    // CDC MERGE apply — the upsert face of the SCD-2 interval build
    // above: a versioned changelog (insert + two update waves + deletes,
    // derived deterministically from the key so the oracle replays it)
    // collapses to latest-version-wins per key, deletes drop out, and the
    // survivors aggregate. latest-wins is max_by(payload, version) — ONE
    // groupBy shuffle with map-side partials, not a window sort (at 100 TB
    // the changelog is append-heavy and the aggregate form spills better
    // than per-key sorted windows). Versions are unique per key by
    // construction, so max_by is deterministic.
    "orders_cdc_merge" -> ((s, dir) => {
      val o = Tables.load(s, dir, "orders").select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        round(col("o_totalprice") * 100).cast(LongType).as("cents"))
      val base = o.select(col("k"), col("status"), col("cents"),
        lit(0L).as("version"), lit("I").as("op"))
      val upd1 = o.filter(col("k") % 10 >= 1 && col("k") % 10 <= 3)
        .select(col("k"), col("status"), (col("cents") + 500L).as("cents"),
          lit(1L).as("version"), lit("U").as("op"))
      val upd2 = o.filter(col("k") % 10 === 1)
        .select(col("k"), col("status"), (col("cents") + 1500L).as("cents"),
          lit(2L).as("version"), lit("U").as("op"))
      val del = o.filter(col("k") % 10 === 0)
        .select(col("k"), col("status"), col("cents"),
          lit(1L).as("version"), lit("D").as("op"))
      base.unionByName(upd1).unionByName(upd2).unionByName(del)
        .groupBy("k")
        .agg(max_by(struct(col("op"), col("status"), col("cents")),
          col("version")).as("last"))
        .filter(col("last.op") =!= "D")
        .groupBy(col("last.status").as("status"))
        .agg(count(lit(1)).as("n_rows"), sum(col("last.cents")).as("sum_cents"))
        .orderBy("status")
    }),

    // Semi-additive period-end balance — the financial-warehouse
    // aggregate where SUM over time is wrong: each user's balance is
    // their LAST tick in the period (day here — the fixture spans one
    // month of days), carried forward through silent periods (LOCF),
    // then summed ACROSS users per period. The day spine attaches to the
    // user dimension by a 1-row-bounds broadcast + explode (per-user
    // sequence), NOT a cross join — same row count, no CartesianProduct
    // (the plan audit forbids one). The LOCF window partitions by user
    // over a spine-bounded frame — never corpus-wide.
    "events_day_balance" -> ((s, dir) => {
      val e = ev(s, dir)
      val ticks = e.select(col("user_id"),
          date_trunc("day", col("ts")).as("mon"),
          col("ts"), col("event_id"),
          round(col("value") * 100).cast(LongType).as("cents"))
        .withColumn("rn", row_number().over(Window
          .partitionBy("user_id", "mon")
          .orderBy(col("ts").desc, col("event_id").desc)))
        .filter(col("rn") === 1)
        .select("user_id", "mon", "cents")
      val bounds = e.agg(date_trunc("day", min(col("ts"))).as("m0"),
          date_trunc("day", max(col("ts"))).as("m1"))
        .withColumn("j", pmod(unix_micros(col("m0")), lit(1L)))
      val grid = e.select("user_id").distinct()
        .withColumn("j", pmod(col("user_id").cast(LongType), lit(1L)))
        .join(broadcast(bounds), "j")
        .select(col("user_id"),
          explode(expr("sequence(m0, m1, interval 1 day)")).as("mon"))
      grid.join(ticks, Seq("user_id", "mon"), "left")
        .withColumn("bal", last(col("cents"), ignoreNulls = true).over(Window
          .partitionBy("user_id").orderBy("mon")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .filter(col("bal").isNotNull)
        .groupBy("mon")
        .agg(count(lit(1)).as("n_users"), sum(col("bal")).as("total_cents"))
        .select(Canonical.epochMs(col("mon")).as("day_ms"),
          col("n_users"), col("total_cents"))
        .orderBy("day_ms")
    }))

  // ---------------------------------------------------------------- oracle

  private val evFp48 = Oracle.fp48Sql(Oracle.serialSql(Oracle.eventsCols))

  /** 2x16-bit Morton interleave terms (mirror of ZOrder.zValue). */
  private val zTermsSql: String = (0 until 16).map { i =>
    s"(CAST((((user_id & 65535) >> $i) & 1) << ${2 * i} AS BIGINT) + " +
      s"CAST((((hr & 65535) >> $i) & 1) << ${2 * i + 1} AS BIGINT))"
  }.mkString(" + ")

  val oracle: Map[String, String] = Map(
    // Path mirror: identical session assignment (the events_sessionize
    // CTE) + string_agg ORDER BY == array_sort-then-join.
    "events_top_paths" ->
      """WITH a AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
        |      AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_ms(ts) - epoch_ms(prev_ts) > 43200000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM a),
        |c AS (
        |  SELECT user_id, event_id, ts, event_type,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id
        |      ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT)
        |      AS session_seq
        |  FROM b),
        |p AS (
        |  SELECT user_id, session_seq,
        |    string_agg(event_type, '>' ORDER BY ts, event_id) AS path
        |  FROM c GROUP BY 1, 2),
        |n AS (SELECT path, CAST(count(*) AS BIGINT) AS n_sessions
        |      FROM p GROUP BY 1),
        |r AS (SELECT *, row_number() OVER
        |        (ORDER BY n_sessions DESC, path) AS rank FROM n)
        |SELECT path, n_sessions, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 10 ORDER BY rank""".stripMargin,

    // Gini mirror: BIGINT lane (fixture-safe; Spark runs DECIMAL for
    // the 100 TB counts), identical floor division and rank order.
    "events_user_gini" ->
      """WITH pt AS (SELECT user_id, event_type,
        |              CAST(count(*) AS BIGINT) AS c
        |            FROM events GROUP BY 1, 2),
        |g AS (SELECT user_id, CAST(sum(c) AS BIGINT) AS n_events,
        |        CAST(sum(c * c) AS BIGINT) AS sq
        |      FROM pt GROUP BY 1),
        |sc AS (SELECT user_id, n_events,
        |         CAST(((n_events * n_events - sq) * 1000000)
        |              // (n_events * n_events) AS BIGINT) AS gini_micro
        |       FROM g),
        |r AS (SELECT *, row_number() OVER
        |        (ORDER BY gini_micro DESC, user_id) AS rank FROM sc)
        |SELECT user_id, n_events, gini_micro, CAST(rank AS INTEGER) AS rank
        |FROM r WHERE rank <= 20 ORDER BY rank""".stripMargin,

    // Incremental-agg mirror: the FULL recompute the partial merge must
    // equal exactly.
    "events_incremental_agg" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |         AS cents_sum
        |FROM events GROUP BY event_type
        |ORDER BY event_type""".stripMargin,

    // Drift mirror: HUGEINT lane (int128 — the DuckDB twin of the
    // Spark side's DECIMAL(38,0); the r13 sf1 run caught the earlier
    // BIGINT lane overflowing at diff² × 1e6 once bin counts reach
    // ~1e6), identical per-bin floor divisions before max/sum.
    "events_value_drift" ->
      """WITH u AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events),
        |d0 AS (SELECT CASE WHEN event_id % 101 = 0 THEN value + 1.0
        |              ELSE value END AS value
        |       FROM events WHERE event_id % 97 <> 0),
        |d AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents FROM d0),
        |ub AS (SELECT cents // 5000 AS bin, CAST(count(*) AS BIGINT) AS n_up
        |       FROM u GROUP BY 1),
        |db AS (SELECT cents // 5000 AS bin,
        |         CAST(count(*) AS BIGINT) AS n_down
        |       FROM d GROUP BY 1),
        |j AS (SELECT COALESCE(ub.bin, db.bin) AS bin,
        |        COALESCE(n_up, 0) AS n_up, COALESCE(n_down, 0) AS n_down
        |      FROM ub FULL JOIN db ON ub.bin = db.bin),
        |c AS (SELECT *,
        |        sum(n_up) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |          AS cum_up,
        |        sum(n_down) OVER (ORDER BY bin ROWS UNBOUNDED PRECEDING)
        |          AS cum_down
        |      FROM j),
        |t AS (SELECT CAST(sum(n_up) AS BIGINT) AS t_up,
        |        CAST(sum(n_down) AS BIGINT) AS t_down FROM j)
        |SELECT t.t_up AS n_up, t.t_down AS n_down,
        |       CAST(count(*) AS BIGINT) AS n_bins,
        |       CAST(max(abs(CAST(cum_up AS HUGEINT) * t_down
        |                    - CAST(cum_down AS HUGEINT) * t_up) * 1000
        |                // (CAST(t_up AS HUGEINT) * t_down)) AS BIGINT)
        |         AS ks_permille,
        |       CAST(sum(CASE WHEN c.n_up > 0 THEN
        |             ((CAST(c.n_down AS HUGEINT) * t_up
        |               - CAST(c.n_up AS HUGEINT) * t_down) *
        |              (CAST(c.n_down AS HUGEINT) * t_up
        |               - CAST(c.n_up AS HUGEINT) * t_down) * 1000000)
        |             // (CAST(c.n_up AS HUGEINT) * t_down * t_up)
        |           ELSE 0 END) AS BIGINT) AS chi2_micro
        |FROM c, t GROUP BY t.t_up, t.t_down""".stripMargin,

    // DFG mirror: identical lead() windows (ts, event_id total order)
    // and integer permille/mean divisions.
    "events_dfg" ->
      """WITH e AS (SELECT user_id, event_type, epoch_ms(ts) AS ts_ms,
        |    lead(event_type) OVER w AS next_type,
        |    lead(epoch_ms(ts)) OVER w AS next_ms
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |ed AS (SELECT event_type AS from_type, next_type AS to_type,
        |         CAST(count(*) AS BIGINT) AS transitions,
        |         CAST(sum(next_ms - ts_ms) AS BIGINT) AS gap_total
        |       FROM e WHERE next_type IS NOT NULL GROUP BY 1, 2),
        |t AS (SELECT from_type, CAST(sum(transitions) AS BIGINT)
        |        AS from_total FROM ed GROUP BY 1)
        |SELECT ed.from_type, ed.to_type, ed.transitions,
        |       CAST(ed.transitions * 1000 // t.from_total AS BIGINT)
        |         AS permille,
        |       CAST(ed.gap_total // ed.transitions AS BIGINT)
        |         AS mean_gap_ms
        |FROM ed JOIN t USING (from_type)
        |ORDER BY from_type, to_type""".stripMargin,

    // Spine mirror: DuckDB range(h0, h1+step, step) == Spark's inclusive
    // sequence(h0, h1, step) for aligned bounds.
    "events_gap_fill" ->
      """WITH b AS (SELECT epoch_ms(date_trunc('hour', min(ts))) AS h0,
        |             epoch_ms(date_trunc('hour', max(ts))) AS h1
        |           FROM events),
        |spine AS (SELECT CAST(u.h AS BIGINT) AS hr_ms
        |          FROM b, UNNEST(range(h0, h1 + 3600000, 3600000)) AS u(h)),
        |c AS (SELECT epoch_ms(date_trunc('hour', ts)) AS hr_ms,
        |        CAST(count(*) AS BIGINT) AS cnt
        |      FROM events GROUP BY 1)
        |SELECT spine.hr_ms, COALESCE(c.cnt, 0) AS cnt,
        |       (COALESCE(c.cnt, 0) = 0) AS is_gap
        |FROM spine LEFT JOIN c USING (hr_ms)
        |ORDER BY hr_ms""".stripMargin,

    // Histogram mirror: identical cents rounding and floor division.
    "events_value_histogram" ->
      """WITH c AS (SELECT CAST(round(value * 100) AS BIGINT) AS cents
        |           FROM events)
        |SELECT CAST(cents // 5000 AS BIGINT) AS bin,
        |       CAST(count(*) AS BIGINT) AS cnt,
        |       CAST(min(cents) AS BIGINT) AS min_cents,
        |       CAST(max(cents) AS BIGINT) AS max_cents,
        |       CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM c GROUP BY 1 ORDER BY 1""".stripMargin,

    // Quantile-sketch mirror: identical 48-bit hash gate (2^48·200/1000 =
    // 56294995342131), identical integer rank selection and audit, and
    // the same EVERY-group contract — a group with no sampled rows still
    // emits its (g, q) rows with n_sample 0 and NULL estimate (the r10
    // advice left-join fix, mirrored).
    "events_quantile_sketch" ->
      """WITH base AS (SELECT event_type AS g, CAST(event_id AS BIGINT) AS id,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |samp AS (SELECT * FROM base
        |  WHERE CAST(('0x' || substr(md5('qs:' || CAST(id AS VARCHAR)), 1, 12))
        |        AS BIGINT) < 56294995342131),
        |r AS (SELECT g, v, id,
        |    row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
        |    count(*) OVER (PARTITION BY g) AS ns FROM samp),
        |e AS (SELECT g, q, ns AS n_sample, v AS est_v, id AS est_id
        |  FROM r, (VALUES (50), (90)) AS qq(q)
        |  WHERE rn = (q * ns + 99) // 100),
        |a AS (SELECT b.g, e.q, e.n_sample, e.est_v, e.est_id,
        |    CAST(sum(CASE WHEN b.v < e.est_v
        |                    OR (b.v = e.est_v AND b.id <= e.est_id)
        |             THEN 1 ELSE 0 END) AS BIGINT) AS true_rank
        |  FROM base b JOIN e ON b.g = e.g GROUP BY 1, 2, 3, 4, 5),
        |grp AS (SELECT g, CAST(count(*) AS BIGINT) AS cnt FROM base
        |        GROUP BY 1),
        |gq AS (SELECT g, cnt, q FROM grp, (VALUES (50), (90)) AS qq(q))
        |SELECT gq.g AS event_type, gq.q, gq.cnt,
        |  CAST(COALESCE(a.n_sample, 0) AS BIGINT) AS n_sample,
        |  a.est_v, a.true_rank,
        |  (gq.q * gq.cnt + 99) // 100 AS target_rank,
        |  CASE WHEN a.est_v IS NULL THEN NULL
        |       ELSE abs(a.true_rank - (gq.q * gq.cnt + 99) // 100)
        |            * 1000000 // gq.cnt END AS err_ppm
        |FROM gq LEFT JOIN a ON a.g = gq.g AND a.q = gq.q
        |ORDER BY event_type, gq.q""".stripMargin,

    // Merge-algebra proof for the quantile sketch (the r10 verdict item:
    // hll_rollup/cms_rollup/shard_bloom_merge prove their sketches'
    // algebra relationally; this does the same for the sample sketch):
    // the Spark side builds TWO shard-local sample relations (events
    // split by event_id parity), merges them by plain UNION, and
    // extracts quantiles; the oracle is the ONE-PASS sketch over the
    // whole table. Equality IS the mergeability claim — the hash gate
    // decides membership per row, so sample(A ∪ B) = sample(A) ∪
    // sample(B) exactly.
    "quantile_sketch_merge" ->
      """WITH base AS (SELECT event_type AS g, CAST(event_id AS BIGINT) AS id,
        |    CAST(round(value * 100) AS BIGINT) AS v FROM events),
        |samp AS (SELECT * FROM base
        |  WHERE CAST(('0x' || substr(md5('qs:' || CAST(id AS VARCHAR)), 1, 12))
        |        AS BIGINT) < 56294995342131),
        |r AS (SELECT g, v, id,
        |    row_number() OVER (PARTITION BY g ORDER BY v, id) AS rn,
        |    count(*) OVER (PARTITION BY g) AS ns FROM samp)
        |SELECT g AS event_type, q, CAST(ns AS BIGINT) AS n_sample,
        |       v AS est_v, id AS est_id
        |FROM r, (VALUES (50), (90)) AS qq(q)
        |WHERE rn = (q * ns + 99) // 100
        |ORDER BY event_type, q""".stripMargin,

    "events_range_join" ->
      """SELECT p.event_id, p.user_id, epoch_ms(p.ts) AS ts_ms,
        |  CAST(SUM(CASE WHEN c.event_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_in_window,
        |  CAST(SUM(CASE WHEN c.event_id IS NOT NULL
        |                THEN CAST(round(c.value * 100) AS BIGINT)
        |                ELSE 0 END) AS BIGINT) AS cents_in_window
        |FROM events p LEFT JOIN events c
        |  ON c.user_id = p.user_id AND c.event_type = 'click'
        | AND epoch_ms(c.ts) > epoch_ms(p.ts) - 86400000
        | AND epoch_ms(c.ts) <= epoch_ms(p.ts)
        |WHERE p.event_type = 'purchase'
        |GROUP BY 1, 2, 3 ORDER BY p.event_id""".stripMargin,

    "events_skew_join" ->
      """WITH prof AS (SELECT user_id, epoch_ms(min(ts)) AS first_ms,
        |                     count(*) AS user_events
        |              FROM events GROUP BY 1)
        |SELECT e.event_id, e.user_id, e.event_type, p.first_ms,
        |       CAST(p.user_events AS BIGINT) AS user_events
        |FROM events e JOIN prof p USING (user_id)
        |ORDER BY e.event_id""".stripMargin,

    "session_attribution" ->
      """WITH a AS (
        |  SELECT user_id, event_id, ts, event_type, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT *, CASE WHEN prev_ts IS NULL
        |         OR epoch_ms(ts) - epoch_ms(prev_ts) > 43200000
        |       THEN 1 ELSE 0 END AS is_new
        |  FROM a),
        |c AS (
        |  SELECT user_id, event_type, value,
        |    CAST(SUM(is_new) OVER w AS BIGINT) AS session_seq,
        |    last_value(CASE WHEN is_new = 1 THEN event_type END IGNORE NULLS)
        |      OVER w AS channel
        |  FROM b
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |               ROWS UNBOUNDED PRECEDING)),
        |s AS (
        |  SELECT user_id, session_seq, min(channel) AS channel,
        |    SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS n_purch,
        |    SUM(CASE WHEN event_type = 'purchase'
        |             THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS cents
        |  FROM c GROUP BY 1, 2)
        |SELECT channel, CAST(count(*) AS BIGINT) AS n_sessions,
        |  CAST(SUM(n_purch) AS BIGINT) AS n_purchases,
        |  CAST(SUM(cents) AS BIGINT) AS purchase_cents
        |FROM s GROUP BY 1 ORDER BY channel""".stripMargin,

    "zorder_layout" ->
      s"""WITH b AS (SELECT event_id, user_id,
         |  epoch_ms(ts) // 3600000 AS hr FROM events),
         |z AS (SELECT event_id, user_id, hr,
         |  CAST($zTermsSql AS BIGINT) AS zv FROM b),
         |f AS (SELECT *, ntile(16) OVER (ORDER BY zv, event_id) AS file_id FROM z)
         |SELECT CAST(file_id AS INTEGER) AS file_id, count(*) AS n_rows,
         |  min(zv) AS z_min, max(zv) AS z_max,
         |  min(user_id) AS x_min, max(user_id) AS x_max,
         |  min(hr) AS y_min, max(hr) AS y_max
         |FROM f GROUP BY 1 ORDER BY file_id""".stripMargin,

    "events_hourly_checksum" ->
      s"""SELECT date_trunc('hour', ts) AS window_start, event_type,
         |       count(*) AS cnt, CAST(SUM($evFp48) AS BIGINT) AS checksum
         |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_windowed_diff" ->
      s"""WITH down AS (
         |  SELECT event_id, user_id, event_type, ts,
         |         CASE WHEN event_id % 101 = 0 THEN value + 1 ELSE value END AS value
         |  FROM events WHERE event_id % 97 <> 0),
         |u AS (SELECT *, 0 AS side FROM (SELECT event_id, user_id, event_type, ts, value FROM events)
         |      UNION ALL SELECT *, 1 AS side FROM down),
         |agg AS (
         |  SELECT date_trunc('hour', ts) AS window_start, event_type,
         |    CAST(SUM(CASE WHEN side = 0 THEN 1 ELSE 0 END) AS BIGINT) AS up_cnt,
         |    CAST(SUM(CASE WHEN side = 0 THEN $evFp48 ELSE 0 END) AS BIGINT) AS up_checksum,
         |    CAST(SUM(CASE WHEN side = 1 THEN 1 ELSE 0 END) AS BIGINT) AS down_cnt,
         |    CAST(SUM(CASE WHEN side = 1 THEN $evFp48 ELSE 0 END) AS BIGINT) AS down_checksum
         |  FROM u GROUP BY 1, 2)
         |SELECT * FROM agg
         |WHERE up_cnt <> down_cnt OR up_checksum <> down_checksum
         |ORDER BY window_start, event_type""".stripMargin,

    "events_rollup" ->
      """SELECT coalesce(event_type, 'ALL') AS event_type_k,
        |  coalesce(epoch_ms(date_trunc('hour', ts)), -1) AS hr_ms,
        |  CAST(GROUPING(event_type, date_trunc('hour', ts)) AS INTEGER) AS gid,
        |  CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events
        |GROUP BY ROLLUP(event_type, date_trunc('hour', ts))
        |ORDER BY gid, event_type_k, hr_ms""".stripMargin,

    "events_partition_prune" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS cnt,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS cents
        |FROM events WHERE CAST(ts AS DATE) = DATE '2024-01-03'
        |GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_dedup_replay" ->
      """WITH all_ev AS (
        |  SELECT event_id, ts FROM events
        |  UNION ALL
        |  SELECT event_id, ts + INTERVAL 5 SECOND FROM events WHERE event_id % 9 = 0)
        |SELECT event_id, CAST(count(*) AS BIGINT) AS n_deliveries,
        |       epoch_ms(min(ts)) AS first_ts_ms
        |FROM all_ev GROUP BY event_id HAVING count(*) > 1
        |ORDER BY event_id""".stripMargin,

    "events_scd2" ->
      """WITH o AS (SELECT user_id, ts, event_id, event_type,
        |    CASE WHEN lag(event_type) OVER w IS NULL
        |           OR lag(event_type) OVER w <> event_type
        |         THEN 1 ELSE 0 END AS chg
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |v AS (SELECT *, SUM(chg) OVER (
        |        PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS version FROM o),
        |r AS (SELECT user_id, CAST(version AS BIGINT) AS version,
        |        min(event_type) AS state, min(ts) AS f,
        |        CAST(count(*) AS BIGINT) AS n_events
        |      FROM v GROUP BY user_id, version),
        |x AS (SELECT user_id, version, state,
        |        epoch_ms(f) AS valid_from_ms,
        |        epoch_ms(lead(f) OVER (
        |          PARTITION BY user_id ORDER BY version)) AS valid_to_ms,
        |        n_events
        |      FROM r)
        |SELECT user_id, version, state, valid_from_ms, valid_to_ms,
        |       n_events, valid_to_ms IS NULL AS is_current
        |FROM x ORDER BY user_id, version""".stripMargin,

    "events_type_affinity" ->
      """WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
        |s AS (SELECT event_type, CAST(count(*) AS BIGINT) AS nu
        |      FROM ut GROUP BY 1),
        |i AS (SELECT x.event_type AS type_a, y.event_type AS type_b,
        |        CAST(count(*) AS BIGINT) AS both_users
        |      FROM ut x JOIN ut y
        |        ON x.user_id = y.user_id AND x.event_type < y.event_type
        |      GROUP BY 1, 2)
        |SELECT type_a, type_b, sa.nu AS users_a, sb.nu AS users_b, both_users,
        |  CAST(both_users * 1000000 // (sa.nu + sb.nu - both_users) AS BIGINT)
        |    AS jaccard_micro
        |FROM i JOIN s sa ON i.type_a = sa.event_type
        |       JOIN s sb ON i.type_b = sb.event_type
        |ORDER BY type_a, type_b""".stripMargin,

    "events_asof" ->
      """WITH r AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'purchase')
        |SELECT l.user_id, l.event_id, epoch_ms(l.ts) AS ts_ms, l.event_type,
        |       r.event_id AS asof_event_id, r.value AS asof_value
        |FROM events l ASOF LEFT JOIN r
        |  ON l.user_id = r.user_id AND l.ts >= r.ts
        |ORDER BY l.event_id""".stripMargin,

    // Tolerance mirror: plain ASOF join, staleness nulled after the fact
    // (NULL gap falls through the CASE to NULL on its own).
    "events_asof_tolerance" ->
      """WITH r AS (SELECT user_id, ts, event_id, value FROM events
        |           WHERE event_type = 'view'),
        |j AS (SELECT l.user_id, l.event_id, epoch_ms(l.ts) AS ts_ms,
        |        r.event_id AS r_eid, r.value AS r_val,
        |        epoch_ms(r.ts) AS r_ms
        |      FROM (SELECT * FROM events WHERE event_type = 'click') l
        |      ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts)
        |SELECT user_id, event_id, ts_ms,
        |  CASE WHEN ts_ms - r_ms <= 3600000 THEN r_eid END
        |    AS asof_event_id,
        |  CASE WHEN ts_ms - r_ms <= 3600000 THEN r_val END
        |    AS asof_value
        |FROM j ORDER BY event_id""".stripMargin,

    "events_json" ->
      """SELECT event_type, count(*) AS cnt,
        |       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
        |       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "events_funnel" ->
      """WITH v AS (SELECT user_id, min(epoch_ms(ts)) AS t_view
        |  FROM events WHERE event_type = 'view' GROUP BY 1),
        |c AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t_click
        |  FROM events e JOIN v ON e.user_id = v.user_id
        |  WHERE e.event_type = 'click' AND epoch_ms(e.ts) >= v.t_view
        |  GROUP BY 1),
        |p AS (SELECT e.user_id, min(epoch_ms(e.ts)) AS t_purchase
        |  FROM events e JOIN c ON e.user_id = c.user_id
        |  WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= c.t_click
        |  GROUP BY 1)
        |SELECT 1 AS step, 'view' AS event_type,
        |       (SELECT count(*) FROM v) AS users
        |UNION ALL SELECT 2, 'click', (SELECT count(*) FROM c)
        |UNION ALL SELECT 3, 'purchase', (SELECT count(*) FROM p)
        |ORDER BY step""".stripMargin,

    "events_retention" ->
      """WITH uw AS (SELECT DISTINCT user_id,
        |  epoch_ms(ts) // 604800000 AS wk FROM events),
        |c AS (SELECT user_id, wk,
        |  min(wk) OVER (PARTITION BY user_id) AS cohort_wk FROM uw)
        |SELECT cohort_wk, wk - cohort_wk AS week_offset, count(*) AS users
        |FROM c GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,

    "events_sessionize" ->
      """WITH a AS (
        |  SELECT user_id, event_id, ts, value,
        |    lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
        |  FROM events),
        |b AS (
        |  SELECT user_id, event_id, ts, value,
        |    CASE WHEN prev_ts IS NULL
        |           OR epoch_ms(ts) - epoch_ms(prev_ts) > 43200000
        |         THEN 1 ELSE 0 END AS is_new
        |  FROM a),
        |c AS (
        |  SELECT user_id, ts, value,
        |    CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |  FROM b)
        |SELECT user_id, session_seq, count(*) AS n_events,
        |  min(epoch_ms(ts)) AS start_ms, max(epoch_ms(ts)) AS end_ms,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  max(epoch_ms(ts)) - min(epoch_ms(ts)) AS duration_ms
        |FROM c GROUP BY 1, 2 ORDER BY user_id, session_seq""".stripMargin,

    "events_rolling" ->
      """SELECT event_id, user_id, epoch_ms(ts) AS ts_ms,
        |  count(*) OVER w AS roll_cnt,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) OVER w AS BIGINT)
        |    AS roll_cents
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
        |             ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)
        |ORDER BY event_id""".stripMargin,

    "events_hourly_anomaly" ->
      """WITH h AS (
        |  SELECT event_type, date_trunc('hour', ts) AS hour_ts,
        |         count(*) AS cnt
        |  FROM events GROUP BY 1, 2)
        |SELECT event_type, epoch_ms(hour_ts) AS hour_ms, CAST(cnt AS BIGINT) AS cnt,
        |  (cnt * (COUNT(*) OVER w) > 2 * (SUM(cnt) OVER w)) AS anomaly
        |FROM h
        |WINDOW w AS (PARTITION BY event_type)
        |ORDER BY event_type, hour_ms""".stripMargin,

    "events_key_skew" ->
      """WITH c AS (SELECT user_id, count(*) AS cnt FROM events GROUP BY 1)
        |SELECT user_id, cnt,
        |  round(cnt * 1.0 / SUM(cnt) OVER (), 6) AS share
        |FROM c ORDER BY cnt DESC, user_id LIMIT 20""".stripMargin,

    "latest_per_key" ->
      """WITH r AS (
        |  SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms,
        |         row_number() OVER (PARTITION BY user_id
        |                            ORDER BY ts DESC, event_id DESC) AS rn
        |  FROM events)
        |SELECT user_id, event_id, event_type, ts_ms
        |FROM r WHERE rn = 1 ORDER BY user_id""".stripMargin,

    "stale_configs" -> {
      val onDisk = Tables.all
        .map(t => s"SELECT 'main' AS schema_name, '$t' AS table_name, 'main_$t.toml' AS config_file")
        .mkString("\n  UNION ALL ")
      s"""WITH ${CoreQueries.manifestCteSql},
         |disc AS (SELECT schema_name, table_name FROM manifest
         |         WHERE table_rows > 5000 AND pk_kind = 'NONCLUSTERED'),
         |ondisk AS ($onDisk)
         |SELECT o.schema_name, o.table_name, o.config_file FROM ondisk o
         |WHERE NOT EXISTS (SELECT 1 FROM disc d
         |  WHERE d.schema_name = o.schema_name AND d.table_name = o.table_name)
         |ORDER BY o.table_name""".stripMargin
    },

    "events_salted_agg" ->
      """SELECT event_type,
        |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS value_sum,
        |  count(*) AS cnt
        |FROM events GROUP BY event_type ORDER BY event_type""".stripMargin,

    "q3_segment_revenue" ->
      """SELECT o_orderkey,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |       AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
        |  any_value(epoch_ms(o_orderdate)) AS o_orderdate_ms
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey
        |ORDER BY SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |       AS DECIMAL(30,4))) DESC, o_orderkey
        |LIMIT 10""".stripMargin,

    "q5_region_revenue" ->
      """SELECT r_name, n_name,
        |  CAST(SUM(CAST(CAST(l_extendedprice AS DECIMAL(18,2))
        |       * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))
        |       AS DECIMAL(30,4))) AS DOUBLE) AS revenue,
        |  count(*) AS n_lineitems
        |FROM lineitem
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey AND c_nationkey = s_nationkey
        |JOIN nation ON s_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name
        |ORDER BY r_name, n_name""".stripMargin,

    // HLL mirror: identical md5-derived registers, harmonic estimate, and
    // linear-counting branch — the ESTIMATE is oracle-compared, not just
    // the exact count.
    "hll_distinct" ->
      """WITH h AS (SELECT event_type AS grp,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS hh
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT grp, hh // 1099511627776 AS bucket,
        |             hh % 1099511627776 AS rem FROM h),
        |r AS (SELECT grp, bucket,
        |    max(CASE WHEN rem = 0 THEN 41
        |             ELSE strpos(lpad(bin(rem), 40, '0'), '1') END) AS mreg
        |  FROM b GROUP BY 1, 2),
        |g AS (SELECT grp, sum(power(2.0, -mreg)) AS sum_inv,
        |             count(*) AS present FROM r GROUP BY 1),
        |e AS (SELECT grp, 256 - present AS zeros,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |      / (sum_inv + (256 - present)) AS raw FROM g),
        |est AS (SELECT grp,
        |    round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
        |               THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4)
        |      AS hll_estimate
        |  FROM e),
        |x AS (SELECT event_type AS grp,
        |             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |      FROM events GROUP BY 1)
        |SELECT est.grp AS event_type, exact_distinct, hll_estimate,
        |  CAST(floor(abs(hll_estimate - exact_distinct) * 1000.0
        |       / exact_distinct) AS BIGINT) AS err_permille
        |FROM est JOIN x USING (grp) ORDER BY event_type""".stripMargin,

    "hll_rollup" ->
      """WITH h AS (SELECT event_type AS grp,
        |    CAST(('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) AS hh
        |  FROM events WHERE user_id IS NOT NULL),
        |b AS (SELECT grp, hh // 1099511627776 AS bucket,
        |             hh % 1099511627776 AS rem FROM h),
        |r0 AS (SELECT grp, bucket,
        |    max(CASE WHEN rem = 0 THEN 41
        |             ELSE strpos(lpad(bin(rem), 40, '0'), '1') END) AS mreg
        |  FROM b GROUP BY 1, 2),
        |r AS (SELECT * FROM r0
        |      UNION ALL
        |      SELECT '__ALL__', bucket, max(mreg) FROM r0 GROUP BY 2),
        |g AS (SELECT grp, sum(power(2.0, -mreg)) AS sum_inv,
        |             count(*) AS present FROM r GROUP BY 1),
        |e AS (SELECT grp, 256 - present AS zeros,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |      / (sum_inv + (256 - present)) AS raw FROM g),
        |est AS (SELECT grp,
        |    round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
        |               THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4)
        |      AS hll_estimate
        |  FROM e),
        |x AS (SELECT event_type AS grp,
        |             CAST(count(DISTINCT user_id) AS BIGINT) AS exact_distinct
        |      FROM events GROUP BY 1
        |      UNION ALL
        |      SELECT '__ALL__', CAST(count(DISTINCT user_id) AS BIGINT)
        |      FROM events)
        |SELECT est.grp AS event_type, exact_distinct, hll_estimate,
        |  CAST(floor(abs(hll_estimate - exact_distinct) * 1000.0
        |       / exact_distinct) AS BIGINT) AS err_permille
        |FROM est JOIN x USING (grp) ORDER BY event_type""".stripMargin,

    // CMS mirror: identical md5-salted depth hashes and min-over-depths
    // point queries — the ESTIMATES are oracle-compared, not just the
    // exact counts.
    "cms_heavy_hitters" ->
      """WITH d AS (SELECT unnest([0, 1, 2, 3]) AS depth),
        |h AS (SELECT depth,
        |    CAST(('0x' || substr(md5(CAST(depth AS VARCHAR) || ':'
        |          || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) % 1024
        |      AS bucket
        |  FROM events, d WHERE user_id IS NOT NULL),
        |r AS (SELECT depth, bucket, CAST(count(*) AS BIGINT) AS cnt
        |      FROM h GROUP BY 1, 2),
        |x AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_cnt
        |      FROM events WHERE user_id IS NOT NULL GROUP BY 1
        |      ORDER BY exact_cnt DESC, user_id LIMIT 10),
        |p AS (SELECT x.user_id, x.exact_cnt, d.depth,
        |    CAST(('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':'
        |          || CAST(x.user_id AS VARCHAR)), 1, 12)) AS BIGINT) % 1024
        |      AS bucket
        |  FROM x, d),
        |e AS (SELECT p.user_id, p.exact_cnt, min(r.cnt) AS cms_estimate
        |      FROM p JOIN r USING (depth, bucket) GROUP BY 1, 2)
        |SELECT user_id, exact_cnt, cms_estimate,
        |  CAST(floor((cms_estimate - exact_cnt) * 1000.0 / exact_cnt)
        |       AS BIGINT) AS over_permille
        |FROM e ORDER BY exact_cnt DESC, user_id""".stripMargin,

    "cms_rollup" ->
      """WITH d AS (SELECT unnest([0, 1, 2, 3]) AS depth),
        |h AS (SELECT event_type AS grp, depth,
        |    CAST(('0x' || substr(md5(CAST(depth AS VARCHAR) || ':'
        |          || CAST(user_id AS VARCHAR)), 1, 12)) AS BIGINT) % 1024
        |      AS bucket
        |  FROM events, d WHERE user_id IS NOT NULL),
        |r0 AS (SELECT grp, depth, bucket, CAST(count(*) AS BIGINT) AS cnt
        |       FROM h GROUP BY 1, 2, 3),
        |r AS (SELECT * FROM r0
        |      UNION ALL
        |      SELECT '__ALL__', depth, bucket, CAST(sum(cnt) AS BIGINT)
        |      FROM r0 GROUP BY 2, 3),
        |xu AS (SELECT event_type AS grp, user_id,
        |              CAST(count(*) AS BIGINT) AS exact_cnt
        |       FROM events WHERE user_id IS NOT NULL GROUP BY 1, 2
        |       UNION ALL
        |       SELECT '__ALL__', user_id, CAST(count(*) AS BIGINT)
        |       FROM events WHERE user_id IS NOT NULL GROUP BY 2),
        |p0 AS (SELECT grp, user_id, exact_cnt, row_number() OVER
        |         (PARTITION BY grp ORDER BY exact_cnt DESC, user_id) AS rn
        |       FROM xu),
        |p AS (SELECT grp, user_id, exact_cnt FROM p0 WHERE rn = 1),
        |pb AS (SELECT p.grp, p.user_id, p.exact_cnt, d.depth,
        |    CAST(('0x' || substr(md5(CAST(d.depth AS VARCHAR) || ':'
        |          || CAST(p.user_id AS VARCHAR)), 1, 12)) AS BIGINT) % 1024
        |      AS bucket
        |  FROM p, d),
        |e AS (SELECT pb.grp, pb.user_id, pb.exact_cnt,
        |             min(r.cnt) AS cms_estimate
        |      FROM pb JOIN r ON r.grp = pb.grp AND r.depth = pb.depth
        |                    AND r.bucket = pb.bucket
        |      GROUP BY 1, 2, 3)
        |SELECT grp AS event_type, user_id, exact_cnt, cms_estimate,
        |  CAST(floor((cms_estimate - exact_cnt) * 1000.0 / exact_cnt)
        |       AS BIGINT) AS over_permille
        |FROM e ORDER BY event_type""".stripMargin,

    // HLL inclusion-exclusion mirror: same registers, same max-merge
    // union, intersection = A + B - U on the rounded estimates.
    "hll_overlap" ->
      """WITH t AS (SELECT CASE WHEN year(o_orderdate) = 1995 THEN 'A'
        |                  ELSE 'B' END AS tag, o_custkey AS k
        |  FROM orders
        |  WHERE o_custkey IS NOT NULL AND year(o_orderdate) IN (1995, 1996)),
        |h AS (SELECT tag,
        |    CAST(('0x' || substr(md5(CAST(k AS VARCHAR)), 1, 12)) AS BIGINT)
        |      AS hh FROM t),
        |b AS (SELECT tag AS grp, hh // 1099511627776 AS bucket,
        |             hh % 1099511627776 AS rem FROM h),
        |r0 AS (SELECT grp, bucket,
        |    max(CASE WHEN rem = 0 THEN 41
        |             ELSE strpos(lpad(bin(rem), 40, '0'), '1') END) AS mreg
        |  FROM b GROUP BY 1, 2),
        |r AS (SELECT * FROM r0
        |      UNION ALL
        |      SELECT 'U', bucket, max(mreg) FROM r0 GROUP BY 2),
        |g AS (SELECT grp, sum(power(2.0, -mreg)) AS sum_inv,
        |             count(*) AS present FROM r GROUP BY 1),
        |e AS (SELECT grp, 256 - present AS zeros,
        |    (0.7213 / (1.0 + 1.079 / 256.0)) * 65536.0
        |      / (sum_inv + (256 - present)) AS raw FROM g),
        |est AS (SELECT grp,
        |    round(CASE WHEN raw <= 2.5 * 256 AND zeros > 0
        |               THEN 256.0 * ln(256.0 / zeros) ELSE raw END, 4)
        |      AS hll_estimate
        |  FROM e),
        |w AS (SELECT
        |    max(CASE WHEN grp = 'A' THEN hll_estimate END) AS est_a,
        |    max(CASE WHEN grp = 'B' THEN hll_estimate END) AS est_b,
        |    max(CASE WHEN grp = 'U' THEN hll_estimate END) AS est_union
        |  FROM est),
        |x AS (SELECT
        |    CAST(count(DISTINCT CASE WHEN tag = 'A' THEN k END) AS BIGINT)
        |      AS exact_a,
        |    CAST(count(DISTINCT CASE WHEN tag = 'B' THEN k END) AS BIGINT)
        |      AS exact_b,
        |    CAST(count(DISTINCT k) AS BIGINT) AS exact_union
        |  FROM t)
        |SELECT exact_a, est_a, exact_b, est_b, exact_union, est_union,
        |  exact_a + exact_b - exact_union AS exact_inter,
        |  round(greatest(est_a + est_b - est_union, 0.0), 4) AS est_inter,
        |  CAST(floor(abs(round(greatest(est_a + est_b - est_union, 0.0), 4)
        |       - (exact_a + exact_b - exact_union)) * 1000.0
        |       / (exact_a + exact_b - exact_union)) AS BIGINT)
        |    AS inter_err_permille
        |FROM w, x""".stripMargin,

    // CDC mirror: identical deterministic changelog; latest-wins via
    // windowed row_number (versions unique per key, so it equals max_by).
    "orders_cdc_merge" ->
      """WITH o AS (SELECT o_orderkey AS k, o_orderstatus AS status,
        |             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
        |           FROM orders),
        |log AS (
        |  SELECT k, status, cents, 0 AS version, 'I' AS op FROM o
        |  UNION ALL
        |  SELECT k, status, cents + 500, 1, 'U' FROM o
        |  WHERE k % 10 BETWEEN 1 AND 3
        |  UNION ALL
        |  SELECT k, status, cents + 1500, 2, 'U' FROM o WHERE k % 10 = 1
        |  UNION ALL
        |  SELECT k, status, cents, 1, 'D' FROM o WHERE k % 10 = 0),
        |latest AS (SELECT k, op, status, cents,
        |             row_number() OVER (PARTITION BY k ORDER BY version DESC)
        |               AS rn
        |           FROM log)
        |SELECT status, count(*) AS n_rows,
        |  CAST(sum(cents) AS BIGINT) AS sum_cents
        |FROM latest WHERE rn = 1 AND op <> 'D'
        |GROUP BY 1 ORDER BY 1""".stripMargin,

    // Semi-additive mirror: same last-tick-per-day + LOCF over the day
    // spine; the spine cross join is fine HERE (oracle-side only —
    // DuckDB has no plan audit and the spine is span-bounded).
    "events_day_balance" ->
      """WITH t AS (SELECT user_id, date_trunc('day', ts) AS mon_ns,
        |             CAST(round(value * 100) AS BIGINT) AS cents,
        |             row_number() OVER (
        |               PARTITION BY user_id, date_trunc('day', ts)
        |               ORDER BY ts DESC, event_id DESC) AS rn
        |           FROM events),
        |ticks AS (SELECT user_id, CAST(mon_ns AS TIMESTAMP) AS mon, cents
        |          FROM t WHERE rn = 1),
        |b AS (SELECT CAST(date_trunc('day', min(ts)) AS TIMESTAMP) AS m0,
        |             CAST(date_trunc('day', max(ts)) AS TIMESTAMP) AS m1
        |      FROM events),
        |spine AS (SELECT unnest(generate_series(m0, m1, INTERVAL 1 DAY))
        |            AS mon FROM b),
        |grid AS (SELECT u.user_id, s.mon
        |         FROM (SELECT DISTINCT user_id FROM events) u, spine s),
        |filled AS (SELECT g.user_id, g.mon,
        |             last_value(t2.cents IGNORE NULLS) OVER (
        |               PARTITION BY g.user_id ORDER BY g.mon
        |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |               AS bal
        |           FROM grid g LEFT JOIN ticks t2
        |             ON g.user_id = t2.user_id AND g.mon = t2.mon)
        |SELECT epoch_ms(mon) AS day_ms, count(*) AS n_users,
        |  CAST(sum(bal) AS BIGINT) AS total_cents
        |FROM filled WHERE bal IS NOT NULL
        |GROUP BY 1 ORDER BY 1""".stripMargin)
}
