package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Spatial binning operators: point-in-rectangle containment as a
  * GRID-BUCKETED equi join, and grid-cell density aggregation.
  *
  * The testdata has no geometry columns, so both sides are derived
  * deterministically (md5 — identical hex in Spark and DuckDB, the
  * repo's established cross-engine hash) on a 10000×10000 integer
  * plane: events become points, parts become rectangles of side
  * 100–499.
  *
  * Scale design: the naive containment join is a theta join (BNL —
  * quadratic). Instead both sides map to 250-unit grid cells — points
  * to exactly ONE cell, each rectangle replicated to the ≤3×3 cells it
  * covers — so the join is a plain (cx, cy) hash equi-join with the
  * exact containment predicate as a residual. Shuffle is
  * |points| + 9·|boxes|, never |points|×|boxes|; a (point, box) pair
  * can only meet in the point's single cell, so no dedup pass is
  * needed. Cell size is chosen ≈ the box-size scale — at 100 TB you'd
  * pick it from the box-extent histogram the same way; a hot cell is
  * bounded by geometry density, and AQE's skew split handles the rest.
  */
object GeoOps extends OpPack {

  private val Cell = 250

  /** Derived points: one per event, md5-placed on the integer plane. */
  private def points(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "events")
      .select(col("event_id"),
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8), " +
          "16, 10) AS BIGINT) % 10000").as("x"),
        expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, 8), " +
          "16, 10) AS BIGINT) % 10000").as("y"))

  /** Derived rectangles: one per part, origin md5-placed in [0, 9400),
    * width/height 100 + key-derived in [100, 500) — always in-bounds. */
  private def boxes(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "part")
      .select(col("p_partkey").as("box_id"),
        expr("CAST(conv(substring(md5(concat('bx', CAST(p_partkey AS " +
          "STRING))), 1, 8), 16, 10) AS BIGINT) % 9400").as("x0"),
        expr("CAST(conv(substring(md5(concat('by', CAST(p_partkey AS " +
          "STRING))), 1, 8), 16, 10) AS BIGINT) % 9400").as("y0"))
      .withColumn("x1", col("x0") + lit(100) + col("box_id") % 400)
      .withColumn("y1", col("y0") + lit(100) + (col("box_id") * 7) % 400)

  def queries: Map[String, Q] = Map(

    // Point-in-rectangle containment join via grid bucketing: boxes
    // explode to their ≤9 covering cells, points map to their one cell,
    // equi-join on the cell + exact residual. Per-box point count out.
    "join_spatial_grid" -> ((s, dir) => {
      val b = boxes(s, dir)
        .withColumn("cx", explode(expr(s"sequence(x0 div $Cell, x1 div $Cell)")))
        .withColumn("cy", explode(expr(s"sequence(y0 div $Cell, y1 div $Cell)")))
      val p = points(s, dir)
        .withColumn("cx", expr(s"x div $Cell"))
        .withColumn("cy", expr(s"y div $Cell"))
      p.join(b, Seq("cx", "cy"))
        .filter(col("x").between(col("x0"), col("x1")) &&
          col("y").between(col("y0"), col("y1")))
        .groupBy(col("box_id"))
        .agg(count(lit(1)).as("n_points"), min(col("event_id")).as("first_event"))
        .orderBy(col("box_id"))
    }),

    // Grid-cell density histogram (spatial binning agg): points →
    // cell → two-phase count. Narrow map + one ≤1600-group hash agg.
    "geo_grid_density" -> ((s, dir) => {
      points(s, dir)
        .groupBy(expr(s"x div $Cell").as("cx"), expr(s"y div $Cell").as("cy"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("cx"), col("cy"))
    }),

    // Spatial visitor-diversity surface (the mixing index urban
    // analytics reads next to raw density: a cell 1000 events deep
    // from ONE user is a stuck device, the same depth across 200
    // users is a venue): Shannon entropy of each cell's USER mix in
    // the engine's DECLARED floor-log2 milli-bits (LB = bit length;
    // H_milli = 1000·(N·LB(N) − Σ c·LB(c)) div N — diag_entropy's
    // exact integer idiom on a spatial key). TWO map-side-combined
    // hash aggs ((cell, user) → cell), key-proportional exchanges
    // only; the output frame is ≤1600 cells at any data volume.
    "geo_cell_diversity" -> ((s, dir) => {
      val pts = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, " +
            "8), 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, " +
            "8), 16, 10) AS BIGINT) % 10000").as("y"))
      val per = pts
        .groupBy(expr(s"x div $Cell").as("cx"),
          expr(s"y div $Cell").as("cy"), col("user_id"))
        .agg(count(lit(1)).as("c"))
      per.groupBy(col("cx"), col("cy"))
        .agg(sum(col("c")).as("n_events"),
          count(lit(1)).as("n_users"),
          sum(col("c") * length(expr("bin(c)"))).as("sum_clb"))
        .select(col("cx"), col("cy"), col("n_events"), col("n_users"),
          expr("CAST((1000 * (n_events * length(bin(n_events)) " +
            "- sum_clb)) div n_events AS BIGINT)")
            .as("diversity_millibits"))
        .orderBy(col("cx"), col("cy"))
    }),

    // Multi-resolution quadkey roll-up (the Bing-maps tile-pyramid
    // index: one STRING key whose prefixes ARE the coarser tiles, so
    // a zoom-out is a substring, never a re-scan of the geometry):
    // each point maps to its depth-5 quadkey over the 2¹⁴-unit plane
    // (digit_i = 2·bit_i(x) + bit_i(y), top bit first — pure integer
    // div/mod, identical both engines), counts per depth-5 tile, and
    // each tile's share of its depth-3 parent in permille via a
    // window over the BOUNDED ≤4⁵-tile frame. At 100 TB the scan is
    // narrow (two div/mod chains + concat), the agg is map-side
    // combined into ≤1024 groups, and every coarser zoom level is a
    // prefix aggregate of this one output — the pyramid costs one
    // scan, not one per level.
    "geo_quadkey" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val digit = (p: Int) =>
        s"CAST(2 * ((x div $p) % 2) + ((y div $p) % 2) AS STRING)"
      val qk5 = (1 to 5).map(i => digit(1 << (14 - i)))
        .mkString("concat(", ", ", ")")
      points(s, dir)
        .withColumn("qk5", expr(qk5))
        .groupBy(col("qk5"))
        .agg(count(lit(1)).as("n"))
        .withColumn("qk3", substring(col("qk5"), 1, 3))
        .withColumn("n_parent",
          sum(col("n")).over(Window.partitionBy(col("qk3"))))
        .select(col("qk5"), col("qk3"), col("n"), col("n_parent"),
          expr("(n * 1000) div n_parent").as("share_pm"))
        .orderBy(col("qk5"))
    }),

    // Within-distance spatial SELF-join (L2 <= D): customers md5-placed
    // on a 4000×4000 plane, pairs closer than D=60. Cell size == D, so
    // any qualifying pair sits in the same or an adjacent cell: side A
    // keeps its one home cell, side B replicates to its 3×3
    // neighborhood, the join is a plain (cx,cy) hash equi-join with the
    // exact integer dist² residual. Shuffle |A| + 9·|B|, never |A|·|B|;
    // (a,b) can meet only in a's single home cell ⇒ no dedup needed.
    // The oracle brute-forces the same result with a band theta join
    // (DuckDB IEJoin) — viable at test scale, which is exactly what the
    // grid plan replaces at 100 TB.
    "geo_distance_join" -> ((s, dir) => {
      val D = 60
      val c = custPoints(s, dir)
      val a = c.select(col("cust_id").as("id_a"), col("x").as("xa"),
          col("y").as("ya"))
        .withColumn("cx", expr(s"xa div $D"))
        .withColumn("cy", expr(s"ya div $D"))
      val b = c.select(col("cust_id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"))
        .withColumn("cx", explode(expr(s"sequence(xb div $D - 1, xb div $D + 1)")))
        .withColumn("cy", explode(expr(s"sequence(yb div $D - 1, yb div $D + 1)")))
      a.join(b, Seq("cx", "cy"))
        .filter(col("id_a") < col("id_b"))
        .withColumn("dist2",
          (col("xa") - col("xb")) * (col("xa") - col("xb")) +
            (col("ya") - col("yb")) * (col("ya") - col("yb")))
        .filter(col("dist2") <= lit(D * D))
        .select(col("id_a"), col("id_b"), col("dist2"))
        .orderBy(col("id_a"), col("id_b"))
    }),

    // Bounded nearest-neighbor (the "nearest POI within D" lookup):
    // for each point, its closest OTHER point at L2 ≤ D=60, exact by
    // the same 3×3-cell argument as geo_distance_join (any qualifying
    // neighbor sits in an adjacent cell; points with none in range
    // drop out — declared: unbounded nearest needs an expanding-ring
    // search, the D-bounded form is the one that grid-joins at
    // 100 TB). Ranking is (dist², id) per home point over the
    // density-bounded candidate set — row_number()==1 collapses to
    // WindowGroupLimit, so no candidate list ever materializes past
    // the per-partition top-1 heap. Ties break on id ascending:
    // deterministic in both engines.
    // Per-entity trajectory length (fleet/telemetry mileage report):
    // each user's events become an ordered path on the integer plane
    // (md5-derived coords joined back to the event stream), and the
    // path length is Σ L1 hop distances via one lag window — exact
    // integers, no floats. Shape: the window rides ONE user_id
    // exchange; at 100 TB trajectory length is a windowed scan, never
    // a self-join.
    "geo_trajectory" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("y"))
        .withColumn("hop", expr(
          "abs(x - lag(x) OVER (PARTITION BY user_id ORDER BY event_id))" +
            " + abs(y - lag(y) OVER (PARTITION BY user_id ORDER BY " +
            "event_id))"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("hop")).as("path_l1"),
          max(col("hop")).as("max_hop"))
        .orderBy(col("user_id"))
    }),

    // Impossible-speed audit (the telematics data-quality screen: a
    // vehicle that "moved" 5000 grid units in one second is a GPS
    // glitch or spoofed data, and it poisons every downstream
    // trajectory metric): consecutive per-user hops get an L1
    // speed in milli-units/second (dist·1000 div max(1, Δt) — zero
    // and negative Δt clamp to 1s, declared: same-timestamp bursts
    // count as 1s), reported per user as hop count, max speed, and
    // hops past a 10 000 milli-u/s plausibility threshold. ONE lag
    // window on the user_id exchange (coords + seconds share it) +
    // one map-side-combined hash agg — the geo_trajectory shape with
    // a time axis.
    "geo_speed_audit" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          floor(unix_timestamp(col("ts"))).cast("long").as("es"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("y"))
        .withColumn("dist",
          abs(col("x") - lag(col("x"), 1).over(w)) +
            abs(col("y") - lag(col("y"), 1).over(w)))
        .withColumn("dt", col("es") - lag(col("es"), 1).over(w))
        .filter(col("dist").isNotNull)
        .withColumn("speed_milli",
          expr("(dist * 1000) div greatest(dt, 1)"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_hops"),
          max(col("speed_milli")).as("max_speed_milli"),
          sum(when(col("speed_milli") > 10000L, 1L).otherwise(0L))
            .as("n_implausible"))
        .orderBy(col("user_id"))
    }),

    // Origin-destination flow matrix (the mobility/routing demand
    // report): each user's consecutive event positions become
    // cell→cell transitions (250-unit grid, same-cell dwells dropped),
    // counted globally and reported as the top-20 flows — where demand
    // concentrates. ONE lag window on the user_id exchange (the
    // geo_trajectory shape — never a self-join), one map-side-combined
    // hash agg on the ≤1600² flow key space, and the top-20 rides
    // orderBy+limit ⇒ TakeOrderedAndProject (per-partition heaps, no
    // global sort at any log size). Total order (n desc, from, to) is
    // deterministic.
    "geo_od_matrix" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("y"))
        .withColumn("cell", expr(s"(x div $Cell) * 40 + (y div $Cell)"))
        .withColumn("prev", lag(col("cell"), 1).over(w))
        .filter(col("prev").isNotNull && col("prev") =!= col("cell"))
        .groupBy(col("prev").as("cell_from"), col("cell").as("cell_to"))
        .agg(count(lit(1)).as("n_trips"))
        .orderBy(desc("n_trips"), col("cell_from"), col("cell_to"))
        .limit(20)
    }),

    // Per-entity bounding-box extent report (the fleet/geofence audit
    // beside geo_trajectory's mileage): each user's md5-placed points
    // collapse to min/max on both axes, the bbox area, and the number
    // of DISTINCT 250-unit grid cells actually visited — area vs
    // n_cells is the "tight route or wandering" dial (a commuter's box
    // is small and dense, a courier's is huge and sparse). ONE
    // map-side-combined hash agg (min/max/count are single-value
    // partials; the cell count is the standard two-phase distinct) —
    // at 100 TB the extent audit is a scan with key-proportional
    // exchanges, no window and no join anywhere.
    "geo_bbox" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("user_id"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, 8)," +
            " 16, 10) AS BIGINT) % 10000").as("y"))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_points"),
          min(col("x")).as("x_min"), max(col("x")).as("x_max"),
          min(col("y")).as("y_min"), max(col("y")).as("y_max"),
          countDistinct(expr(s"(x div $Cell) * 40 + (y div $Cell)"))
            .as("n_cells"))
        .withColumn("bbox_area",
          (col("x_max") - col("x_min") + lit(1L)) *
            (col("y_max") - col("y_min") + lit(1L)))
        .orderBy(col("user_id"))
    }),

    "geo_nearest" -> ((s, dir) => {
      val D = 60
      val c = custPoints(s, dir)
      val a = c.select(col("cust_id").as("id_a"), col("x").as("xa"),
          col("y").as("ya"))
        .withColumn("cx", expr(s"xa div $D"))
        .withColumn("cy", expr(s"ya div $D"))
      val b = c.select(col("cust_id").as("id_b"), col("x").as("xb"),
          col("y").as("yb"))
        .withColumn("cx", explode(expr(s"sequence(xb div $D - 1, xb div $D + 1)")))
        .withColumn("cy", explode(expr(s"sequence(yb div $D - 1, yb div $D + 1)")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("id_a")).orderBy(col("dist2"), col("id_b"))
      a.join(b, Seq("cx", "cy"))
        .filter(col("id_a") =!= col("id_b"))
        .withColumn("dist2",
          (col("xa") - col("xb")) * (col("xa") - col("xb")) +
            (col("ya") - col("yb")) * (col("ya") - col("yb")))
        .filter(col("dist2") <= lit(D * D))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("id_a"), col("id_b").as("nearest_id"), col("dist2"))
        .orderBy(col("id_a"))
    }),

    // Grid-cell density clustering (the DBSCAN-lite every geo stack
    // ships): cells with >= MinPts points are "dense", touching dense
    // cells (8-neighborhood) merge into clusters labeled by their
    // minimum packed cell id. The clustering never touches points
    // pairwise — density is geo_grid_density's two-phase count, the
    // adjacency join is cell-keyed on a BOUNDED 40x40 grid, and the
    // merge is BigStarCC's O(log n)-round star contraction (diameter-
    // independent: a grid cluster can snake arbitrarily long, exactly
    // the case min-label propagation degrades on). At 100 TB the only
    // point-proportional work is the density count.
    "geo_cluster_grid" -> ((s, dir) => {
      val minPts = 8
      val dense = points(s, dir)
        .groupBy(expr(s"x div $Cell").as("cx"), expr(s"y div $Cell").as("cy"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") >= minPts)
        .withColumn("cell", col("cx") * 1000 + col("cy"))
      // The GRID, not the points, is the merge state: at most 40×40
      // dense cells exist at ANY data volume, so the 8-neighborhood
      // merge is a driver-side min-root union-find over ≤1600 nodes
      // (the agg_hist_eqdepth bounded-collect pattern) — zero
      // iterative Spark rounds where a distributed contraction would
      // pay per-round job overhead for a constant-size graph
      // (measured ~5 s → sub-second). llm_cc_bigstar keeps the
      // distributed BigStarCC where the graph IS corpus-proportional.
      // Min-root unions preserve the min-label contract the oracle
      // checks (each root is the minimum cell id of its component).
      val cells = dense.select(col("cell"), col("cx"), col("cy"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      val byPos = cells.map { case (cell, cx, cy) => (cx, cy) -> cell }
        .toMap
      val parent = scala.collection.mutable.Map(
        cells.map(c => c._1 -> c._1).toSeq: _*)
      def find(x: Long): Long = {
        var r = x
        while (parent(r) != r) r = parent(r)
        r
      }
      for ((cell, cx, cy) <- cells; dx <- -1L to 1L; dy <- -1L to 1L) {
        byPos.get((cx + dx, cy + dy)).foreach { nbCell =>
          val (ra, rb) = (find(cell), find(nbCell))
          if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
        }
      }
      val labelDf = s.createDataFrame(
        cells.toSeq.map { case (cell, _, _) => (cell, find(cell)) })
        .toDF("cell", "cluster_id")
      dense.join(broadcast(labelDf), Seq("cell"))
        .groupBy(col("cluster_id"))
        .agg(count(lit(1)).as("n_cells"), sum(col("n")).as("n_points"))
        .orderBy(col("cluster_id"))
    }),

    // Dwell-time heatmap (the mobility sibling of ts_twap's holding
    // rule): each event's position holds until the user's NEXT event
    // (last event has no interval, declared), dwell aggregated per
    // 250-unit grid cell — where users actually SPEND time, not just
    // where events fire. ONE lead window on the user_id exchange +
    // one map-side-combined hash agg on the ≤1600-cell frame; top-25
    // rides TakeOrderedAndProject, ties break on (cx, cy).
    "geo_dwell" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("us"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, " +
            "8), 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, " +
            "8), 16, 10) AS BIGINT) % 10000").as("y"))
        .withColumn("hold_us", lead(col("us"), 1).over(w) - col("us"))
        .filter(col("hold_us").isNotNull)
        .groupBy(expr(s"x div $Cell").as("cx"),
          expr(s"y div $Cell").as("cy"))
        .agg(count(lit(1)).as("n_intervals"),
          sum(col("hold_us")).as("dwell_us"),
          countDistinct(col("user_id")).as("n_users"))
        .orderBy(desc("dwell_us"), asc("cx"), asc("cy"))
        .limit(25)
    }),

    // Moran's I spatial autocorrelation of the cell-density surface
    // (is event density CLUMPED or dispersed?) — in exact integers:
    // deviations scaled by the cell count (d = nc·n − S, so no mean
    // division), rook adjacency among OCCUPIED cells (declared),
    // I_milli = 1000·nc·Σ_adj(d_i·d_j) div (W·Σd_i²). The density
    // frame is ≤1600 cells at any log size, so the adjacency
    // self-joins and every product ride a BOUNDED frame; deviation
    // products ride DECIMAL(38,0)/HUGEINT (both truncate toward zero
    // on the signed numerator). Constant surface (Σd² = 0) ⇒ NULL.
    "geo_morans_i" -> ((s, dir) => {
      val cells = points(s, dir)
        .groupBy(expr(s"x div $Cell").as("cx"),
          expr(s"y div $Cell").as("cy"))
        .agg(count(lit(1)).as("n"))
      val tot = cells.agg(count(lit(1)).as("nc"), sum(col("n")).as("s"))
      val d = cells.crossJoin(broadcast(tot))
        .withColumn("d",
          expr("CAST(nc AS DECIMAL(38,0)) * n - s"))
        .select(col("cx"), col("cy"), col("d"))
      val right = d.as("a").join(d.as("b"),
        col("a.cx") + 1 === col("b.cx") && col("a.cy") === col("b.cy"))
      val up = d.as("a").join(d.as("b"),
        col("a.cx") === col("b.cx") && col("a.cy") + 1 === col("b.cy"))
      val pairs = right.select((col("a.d") * col("b.d")).as("dd"))
        .unionAll(up.select((col("a.d") * col("b.d")).as("dd")))
      val num = pairs.agg(count(lit(1)).as("w"), sum(col("dd")).as("sdd"))
      val den = d.agg(sum(expr("d * d")).as("sd2"))
      num.crossJoin(broadcast(den)).crossJoin(broadcast(tot))
        .select(col("nc").as("n_cells"), col("w").as("n_adj_pairs"),
          expr("CAST(CASE WHEN sd2 > 0 AND w > 0 THEN " +
            "(nc * sdd * 1000) div (w * sd2) END AS BIGINT)")
            .as("morans_i_milli"))
    }),

    // Movement-direction rose (8-sector compass histogram of
    // consecutive per-user hops — the flow-field summary a routing
    // model starts from): sector by PURE integer comparisons (axis
    // dominance + signs; exact diagonal |dx| = |dy| is its own
    // sector family — no atan2, which has no cross-engine-exact
    // form), zero hops dropped. ONE lag window on the user_id
    // exchange + a ≤8-cell hash agg; share window on that bounded
    // frame.
    "geo_direction_rose" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, " +
            "8), 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, " +
            "8), 16, 10) AS BIGINT) % 10000").as("y"))
        .withColumn("dx", col("x") - lag(col("x"), 1).over(w))
        .withColumn("dy", col("y") - lag(col("y"), 1).over(w))
        .filter(col("dx").isNotNull &&
          (col("dx") =!= 0 || col("dy") =!= 0))
        .withColumn("sector",
          when(abs(col("dx")) > abs(col("dy")),
            when(col("dx") > 0, "E").otherwise("W"))
            .when(abs(col("dy")) > abs(col("dx")),
              when(col("dy") > 0, "N").otherwise("S"))
            .otherwise(concat(
              when(col("dy") > 0, "N").otherwise("S"),
              when(col("dx") > 0, "E").otherwise("W"))))
        .groupBy(col("sector"))
        .agg(count(lit(1)).as("n_hops"))
        .withColumn("share_pm",
          expr("CAST((n_hops * 1000) div sum(n_hops) OVER () " +
            "AS BIGINT)"))
        .orderBy(col("sector"))
    }),

    // Trajectory tortuosity (path-efficiency audit — a wandering
    // courier vs a straight commute): per user, total L1 path length
    // over consecutive hops vs the L1 displacement first→last
    // position, ratio in milli-units (straight line = 1000; NULL when
    // the endpoints coincide, declared). ONE lag window + ONE hash
    // agg, both on the user_id exchange — endpoints ride min_by/
    // max_by on the unique event_id order, so no second window pass.
    "geo_tortuosity" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("event_id"))
      Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, " +
            "8), 16, 10) AS BIGINT) % 10000").as("x"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, " +
            "8), 16, 10) AS BIGINT) % 10000").as("y"))
        .withColumn("hop",
          abs(col("x") - lag(col("x"), 1).over(w)) +
            abs(col("y") - lag(col("y"), 1).over(w)))
        .groupBy(col("user_id"))
        .agg(count(lit(1)).as("n_points"),
          sum(col("hop")).as("path_l1"),
          min_by(col("x"), col("event_id")).as("x0"),
          min_by(col("y"), col("event_id")).as("y0"),
          max_by(col("x"), col("event_id")).as("x1"),
          max_by(col("y"), col("event_id")).as("y1"))
        .filter(col("n_points") >= 2)
        .select(col("user_id"), col("n_points"), col("path_l1"),
          (abs(col("x1") - col("x0")) + abs(col("y1") - col("y0")))
            .as("disp_l1"))
        .withColumn("tortuosity_milli",
          expr("CAST(CASE WHEN disp_l1 > 0 THEN " +
            "(path_l1 * 1000) div disp_l1 END AS BIGINT)"))
        .orderBy(col("user_id"))
    }),

    // Spatio-temporal co-location (who is repeatedly in the same
    // place at the same time — the contact-graph primitive): distinct
    // per-user presence in (1250-unit cell × hour) buckets, then a
    // bucket-keyed self-join emits each co-present pair once per
    // shared bucket. The blocking IS the scale design: pair fan-out
    // is Σ_bucket occupancy², bounded by bucket granularity — at
    // 100 TB you pick cell/epoch size from the density histogram
    // exactly like geo_distance_join picks its cell, and AQE skew
    // split handles hot venues. Top-25 pairs by shared-bucket count
    // ride TakeOrderedAndProject; ties break on (user_a, user_b).
    "geo_colocation" -> ((s, dir) => {
      val pres = Tables(s, dir, "events")
        .select(col("user_id"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 1, " +
            "8), 16, 10) AS BIGINT) % 10000 div 1250").as("cx"),
          expr("CAST(conv(substring(md5(CAST(event_id AS STRING)), 9, " +
            "8), 16, 10) AS BIGINT) % 10000 div 1250").as("cy"),
          date_trunc("hour", col("ts")).as("hr"))
        .distinct()
      pres.select(col("user_id").as("user_a"), col("cx"), col("cy"),
          col("hr"))
        .join(pres.select(col("user_id").as("user_b"), col("cx"),
          col("cy"), col("hr")), Seq("cx", "cy", "hr"))
        .filter(col("user_a") < col("user_b"))
        .groupBy(col("user_a"), col("user_b"))
        .agg(count(lit(1)).as("n_cobuckets"))
        .orderBy(desc("n_cobuckets"), asc("user_a"), asc("user_b"))
        .limit(25)
    })
  )

  /** Derived customer points on a DENSER 4000×4000 plane (constant
    * expected pair density across scale factors). */
  private def custPoints(s: SparkSession, dir: String): DataFrame =
    Tables(s, dir, "customer")
      .select(col("c_custkey").as("cust_id"),
        expr("CAST(conv(substring(md5(concat('cp', CAST(c_custkey AS " +
          "STRING))), 1, 8), 16, 10) AS BIGINT) % 4000").as("x"),
        expr("CAST(conv(substring(md5(concat('cq', CAST(c_custkey AS " +
          "STRING))), 1, 8), 16, 10) AS BIGINT) % 4000").as("y"))

  private val ptsSql =
    """pts AS (
      |  SELECT event_id,
      |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
      |      AS BIGINT) % 10000 AS x,
      |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)
      |      AS BIGINT) % 10000 AS y
      |  FROM events)""".stripMargin

  def oracle: Map[String, String] = Map(
    "geo_speed_audit" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    CAST(floor(epoch(ts)) AS BIGINT) AS es,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 10000 AS x,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)
        |      AS BIGINT) % 10000 AS y
        |  FROM events),
        |h AS (
        |  SELECT user_id,
        |    abs(x - lag(x) OVER w) + abs(y - lag(y) OVER w) AS dist,
        |    es - lag(es) OVER w AS dt
        |  FROM p
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |sp AS (
        |  SELECT user_id,
        |    CAST((dist * 1000) // greatest(dt, 1) AS BIGINT)
        |      AS speed_milli
        |  FROM h WHERE dist IS NOT NULL)
        |SELECT user_id, count(*) AS n_hops,
        |  CAST(max(speed_milli) AS BIGINT) AS max_speed_milli,
        |  CAST(sum(CASE WHEN speed_milli > 10000 THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_implausible
        |FROM sp GROUP BY user_id ORDER BY user_id""".stripMargin,

    "geo_od_matrix" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 10000 AS x,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)
        |      AS BIGINT) % 10000 AS y
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_id,
        |    (x // 250) * 40 + (y // 250) AS cell
        |  FROM p),
        |tr AS (
        |  SELECT lag(cell) OVER (PARTITION BY user_id
        |      ORDER BY event_id) AS cell_from,
        |    cell AS cell_to
        |  FROM c),
        |f AS (
        |  SELECT cell_from, cell_to, count(*) AS n_trips
        |  FROM tr
        |  WHERE cell_from IS NOT NULL AND cell_from <> cell_to
        |  GROUP BY cell_from, cell_to)
        |SELECT cell_from, cell_to, CAST(n_trips AS BIGINT) AS n_trips
        |FROM f ORDER BY n_trips DESC, cell_from, cell_to
        |LIMIT 20""".stripMargin,

    "geo_bbox" ->
      """WITH p AS (
        |  SELECT user_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 10000 AS x,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)
        |      AS BIGINT) % 10000 AS y
        |  FROM events)
        |SELECT user_id, count(*) AS n_points,
        |  min(x) AS x_min, max(x) AS x_max,
        |  min(y) AS y_min, max(y) AS y_max,
        |  CAST(count(DISTINCT (x // 250) * 40 + (y // 250)) AS BIGINT)
        |    AS n_cells,
        |  CAST((max(x) - min(x) + 1) * (max(y) - min(y) + 1) AS BIGINT)
        |    AS bbox_area
        |FROM p GROUP BY user_id ORDER BY user_id""".stripMargin,

    "geo_trajectory" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 10000 AS x,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)
        |      AS BIGINT) % 10000 AS y
        |  FROM events),
        |h AS (
        |  SELECT user_id,
        |    abs(x - lag(x) OVER w) + abs(y - lag(y) OVER w) AS hop
        |  FROM p
        |  WINDOW w AS (PARTITION BY user_id ORDER BY event_id))
        |SELECT user_id, count(*) AS n_points,
        |  CAST(sum(hop) AS BIGINT) AS path_l1,
        |  CAST(max(hop) AS BIGINT) AS max_hop
        |FROM h GROUP BY user_id
        |ORDER BY user_id""".stripMargin,

    // The oracle runs the PLAIN theta containment join (DuckDB plans
    // its IEJoin) — same result, different algorithm: the point of the
    // grid plan is avoiding exactly this at scale.
    "join_spatial_grid" ->
      s"""WITH $ptsSql,
         |boxes AS (
         |  SELECT p_partkey AS box_id,
         |    CAST('0x' || substring(md5('bx' || CAST(p_partkey AS VARCHAR)),
         |      1, 8) AS BIGINT) % 9400 AS x0,
         |    CAST('0x' || substring(md5('by' || CAST(p_partkey AS VARCHAR)),
         |      1, 8) AS BIGINT) % 9400 AS y0
         |  FROM part),
         |rect AS (
         |  SELECT box_id, x0, y0,
         |    x0 + 100 + box_id % 400 AS x1,
         |    y0 + 100 + (box_id * 7) % 400 AS y1
         |  FROM boxes)
         |SELECT box_id, count(*) AS n_points, min(event_id) AS first_event
         |FROM pts JOIN rect
         |  ON x BETWEEN x0 AND x1 AND y BETWEEN y0 AND y1
         |GROUP BY box_id
         |ORDER BY box_id""".stripMargin,

    "geo_cell_diversity" ->
      """WITH p AS (
        |  SELECT user_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 1, 8)
        |      AS BIGINT) % 10000 AS x,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)), 9, 8)
        |      AS BIGINT) % 10000 AS y
        |  FROM events),
        |per AS (
        |  SELECT x // 250 AS cx, y // 250 AS cy, user_id,
        |    count(*) AS c
        |  FROM p GROUP BY 1, 2, 3),
        |g AS (
        |  SELECT cx, cy, CAST(sum(c) AS BIGINT) AS n_events,
        |    count(*) AS n_users,
        |    CAST(sum(c * length(bin(c))) AS BIGINT) AS sum_clb
        |  FROM per GROUP BY cx, cy)
        |SELECT cx, cy, n_events, CAST(n_users AS BIGINT) AS n_users,
        |  CAST((1000 * (n_events * length(bin(n_events)) - sum_clb))
        |    // n_events AS BIGINT) AS diversity_millibits
        |FROM g ORDER BY cx, cy""".stripMargin,

    "geo_quadkey" ->
      s"""WITH $ptsSql,
         |k AS (
         |  SELECT
         |    CAST(2 * ((x // 8192) % 2) + ((y // 8192) % 2) AS VARCHAR)
         |    || CAST(2 * ((x // 4096) % 2) + ((y // 4096) % 2) AS VARCHAR)
         |    || CAST(2 * ((x // 2048) % 2) + ((y // 2048) % 2) AS VARCHAR)
         |    || CAST(2 * ((x // 1024) % 2) + ((y // 1024) % 2) AS VARCHAR)
         |    || CAST(2 * ((x // 512) % 2) + ((y // 512) % 2) AS VARCHAR)
         |      AS qk5
         |  FROM pts),
         |g AS (
         |  SELECT qk5, count(*) AS n FROM k GROUP BY qk5),
         |w AS (
         |  SELECT qk5, substring(qk5, 1, 3) AS qk3,
         |    CAST(n AS BIGINT) AS n,
         |    CAST(sum(n) OVER (PARTITION BY substring(qk5, 1, 3))
         |      AS BIGINT) AS n_parent
         |  FROM g)
         |SELECT qk5, qk3, n, n_parent,
         |  CAST((n * 1000) // n_parent AS BIGINT) AS share_pm
         |FROM w ORDER BY qk5""".stripMargin,

    "geo_grid_density" ->
      s"""WITH $ptsSql
         |SELECT x // 250 AS cx, y // 250 AS cy, count(*) AS n
         |FROM pts
         |GROUP BY cx, cy
         |ORDER BY cx, cy""".stripMargin,

    // Band theta join (IEJoin) — the quadratic-ish plan the grid
    // decomposition exists to avoid; same result proves the 3×3
    // neighborhood loses no pair.
    "geo_distance_join" ->
      """WITH cp AS (
        |  SELECT c_custkey AS cust_id,
        |    CAST('0x' || substring(md5('cp' || CAST(c_custkey AS VARCHAR)),
        |      1, 8) AS BIGINT) % 4000 AS x,
        |    CAST('0x' || substring(md5('cq' || CAST(c_custkey AS VARCHAR)),
        |      1, 8) AS BIGINT) % 4000 AS y
        |  FROM customer)
        |SELECT a.cust_id AS id_a, b.cust_id AS id_b,
        |  CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT) AS dist2
        |FROM cp a JOIN cp b
        |  ON a.cust_id < b.cust_id
        |  AND b.x BETWEEN a.x - 60 AND a.x + 60
        |  AND b.y BETWEEN a.y - 60 AND a.y + 60
        |  AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 3600
        |ORDER BY id_a, id_b""".stripMargin,

    "geo_nearest" ->
      """WITH cp AS (
        |  SELECT c_custkey AS cust_id,
        |    CAST('0x' || substring(md5('cp' || CAST(c_custkey AS VARCHAR)),
        |      1, 8) AS BIGINT) % 4000 AS x,
        |    CAST('0x' || substring(md5('cq' || CAST(c_custkey AS VARCHAR)),
        |      1, 8) AS BIGINT) % 4000 AS y
        |  FROM customer),
        |cand AS (
        |  SELECT a.cust_id AS id_a, b.cust_id AS id_b,
        |    CAST((a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) AS BIGINT)
        |      AS dist2
        |  FROM cp a JOIN cp b
        |    ON a.cust_id <> b.cust_id
        |    AND b.x BETWEEN a.x - 60 AND a.x + 60
        |    AND b.y BETWEEN a.y - 60 AND a.y + 60
        |    AND (a.x-b.x)*(a.x-b.x) + (a.y-b.y)*(a.y-b.y) <= 3600),
        |r AS (
        |  SELECT id_a, id_b, dist2, row_number() OVER
        |    (PARTITION BY id_a ORDER BY dist2, id_b) AS rn
        |  FROM cand)
        |SELECT id_a, id_b AS nearest_id, dist2
        |FROM r WHERE rn = 1 ORDER BY id_a""".stripMargin,

    // Exact transitive closure over the dense-cell adjacency (the
    // min-label of a component equals BigStarCC's label by the shared
    // min-id contract).
    "geo_cluster_grid" ->
      s"""WITH RECURSIVE $ptsSql,
         |dense AS (
         |  SELECT x // 250 AS cx, y // 250 AS cy, count(*) AS n
         |  FROM pts GROUP BY 1, 2 HAVING count(*) >= 8),
         |dc AS (SELECT cx * 1000 + cy AS cell, cx, cy, n FROM dense),
         |adj AS (
         |  SELECT a.cell AS u, b.cell AS v
         |  FROM dc a JOIN dc b
         |    ON abs(a.cx - b.cx) <= 1 AND abs(a.cy - b.cy) <= 1
         |    AND a.cell <> b.cell),
         |creach(u, v) AS (
         |  SELECT cell, cell FROM dc
         |  UNION
         |  SELECT e.u, r.v FROM adj e JOIN creach r ON r.u = e.v),
         |lab AS (SELECT u AS cell, min(v) AS cluster_id
         |        FROM creach GROUP BY u)
         |SELECT cluster_id, CAST(count(*) AS BIGINT) AS n_cells,
         |  CAST(sum(n) AS BIGINT) AS n_points
         |FROM dc JOIN lab USING (cell)
         |GROUP BY cluster_id ORDER BY cluster_id""".stripMargin,

    "geo_dwell" ->
      s"""WITH b AS (
         |  SELECT user_id, epoch_us(ts) AS us,
         |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
         |      1, 8) AS BIGINT) % 10000 AS x,
         |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
         |      9, 8) AS BIGINT) % 10000 AS y,
         |    lead(epoch_us(ts), 1) OVER
         |      (PARTITION BY user_id ORDER BY event_id)
         |      - epoch_us(ts) AS hold_us
         |  FROM events)
         |SELECT x // $Cell AS cx, y // $Cell AS cy,
         |  CAST(count(*) AS BIGINT) AS n_intervals,
         |  CAST(sum(hold_us) AS BIGINT) AS dwell_us,
         |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
         |FROM b WHERE hold_us IS NOT NULL
         |GROUP BY cx, cy
         |ORDER BY dwell_us DESC, cx, cy LIMIT 25""".stripMargin,

    "geo_morans_i" ->
      (s"""WITH $ptsSql,
         |cells AS (
         |  SELECT x // $Cell AS cx, y // $Cell AS cy,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM pts GROUP BY cx, cy),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS nc,
         |        CAST(sum(n) AS BIGINT) AS s FROM cells),
         |d AS (
         |  SELECT cx, cy, CAST(nc AS HUGEINT) * n - s AS d
         |  FROM cells CROSS JOIN tot),
         |pr AS (
         |  SELECT a.d * b.d AS dd FROM d a JOIN d b
         |    ON a.cx + 1 = b.cx AND a.cy = b.cy
         |  UNION ALL
         |  SELECT a.d * b.d FROM d a JOIN d b
         |    ON a.cx = b.cx AND a.cy + 1 = b.cy),
         |num AS (SELECT CAST(count(*) AS BIGINT) AS w,
         |        CAST(sum(dd) AS HUGEINT) AS sdd FROM pr),
         |den AS (SELECT CAST(sum(d * d) AS HUGEINT) AS sd2 FROM d)
         |SELECT nc AS n_cells, w AS n_adj_pairs,
         |  CAST(CASE WHEN sd2 > 0 AND w > 0 THEN
         |    (nc * sdd * 1000) // (w * sd2) END AS BIGINT)
         |    AS morans_i_milli
         |FROM num CROSS JOIN den CROSS JOIN tot""".stripMargin),

    "geo_direction_rose" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
        |      1, 8) AS BIGINT) % 10000 AS x,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
        |      9, 8) AS BIGINT) % 10000 AS y
        |  FROM events),
        |h AS (
        |  SELECT x - lag(x, 1) OVER w AS dx,
        |    y - lag(y, 1) OVER w AS dy
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |s AS (
        |  SELECT CASE
        |    WHEN abs(dx) > abs(dy) THEN
        |      CASE WHEN dx > 0 THEN 'E' ELSE 'W' END
        |    WHEN abs(dy) > abs(dx) THEN
        |      CASE WHEN dy > 0 THEN 'N' ELSE 'S' END
        |    ELSE (CASE WHEN dy > 0 THEN 'N' ELSE 'S' END) ||
        |         (CASE WHEN dx > 0 THEN 'E' ELSE 'W' END) END AS sector
        |  FROM h WHERE dx IS NOT NULL AND (dx <> 0 OR dy <> 0)),
        |c AS (SELECT sector, CAST(count(*) AS BIGINT) AS n_hops
        |      FROM s GROUP BY sector)
        |SELECT sector, n_hops,
        |  CAST((CAST(n_hops AS HUGEINT) * 1000) //
        |    CAST(sum(n_hops) OVER () AS HUGEINT) AS BIGINT)
        |    AS share_pm
        |FROM c ORDER BY sector""".stripMargin,

    "geo_tortuosity" ->
      """WITH p AS (
        |  SELECT user_id, event_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
        |      1, 8) AS BIGINT) % 10000 AS x,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
        |      9, 8) AS BIGINT) % 10000 AS y
        |  FROM events),
        |h AS (
        |  SELECT user_id, event_id, x, y,
        |    abs(x - lag(x, 1) OVER w) + abs(y - lag(y, 1) OVER w)
        |      AS hop
        |  FROM p WINDOW w AS (PARTITION BY user_id ORDER BY event_id)),
        |g AS (
        |  SELECT user_id, CAST(count(*) AS BIGINT) AS n_points,
        |    CAST(sum(hop) AS BIGINT) AS path_l1,
        |    arg_min(x, event_id) AS x0, arg_min(y, event_id) AS y0,
        |    arg_max(x, event_id) AS x1, arg_max(y, event_id) AS y1
        |  FROM h GROUP BY user_id)
        |SELECT user_id, n_points, path_l1,
        |  CAST(abs(x1 - x0) + abs(y1 - y0) AS BIGINT) AS disp_l1,
        |  CAST(CASE WHEN abs(x1 - x0) + abs(y1 - y0) > 0 THEN
        |    (path_l1 * 1000) // (abs(x1 - x0) + abs(y1 - y0))
        |  END AS BIGINT) AS tortuosity_milli
        |FROM g WHERE n_points >= 2 ORDER BY user_id""".stripMargin,

    "geo_colocation" ->
      """WITH pres AS (
        |  SELECT DISTINCT user_id,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
        |      1, 8) AS BIGINT) % 10000 // 1250 AS cx,
        |    CAST('0x' || substring(md5(CAST(event_id AS VARCHAR)),
        |      9, 8) AS BIGINT) % 10000 // 1250 AS cy,
        |    date_trunc('hour', ts) AS hr
        |  FROM events)
        |SELECT a.user_id AS user_a, b.user_id AS user_b,
        |  CAST(count(*) AS BIGINT) AS n_cobuckets
        |FROM pres a JOIN pres b
        |  ON a.cx = b.cx AND a.cy = b.cy AND a.hr = b.hr
        | AND a.user_id < b.user_id
        |GROUP BY user_a, user_b
        |ORDER BY n_cobuckets DESC, user_a, user_b
        |LIMIT 25""".stripMargin
  )
}
