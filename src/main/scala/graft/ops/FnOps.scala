package graft.ops

import graft.Tables
import org.apache.spark.sql.functions._

/** Scalar functions: string / date / math / case+cast / JSON / array /
  * map / explode (SURVEY.md §2.2 "Scalar functions").
  *
  * All of these are Spark built-ins (codegen'd, no UDFs), so they stay
  * inside whole-stage codegen and vectorized Parquet scans at any
  * scale. Cross-engine determinism notes per query:
  *  - no raw computed doubles escape (ints/strings/dates only, or
  *    decimal-rounded via [[graft.Tables]] helpers);
  *  - DuckDB casts double→int by ROUNDING while Spark TRUNCATES, so
  *    every such cast goes through an explicit floor();
  *  - DuckDB dayofweek is 0-based (Sun=0), Spark's is 1-based (Sun=1).
  */
object FnOps extends OpPack {

  def queries: Map[String, Q] = Map(
    "fn_string" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          upper(col("p_name")).as("uname"),
          substring(col("p_type"), 1, 6).as("ty6"),
          concat_ws("/", col("p_brand"), col("p_type")).as("brand_type"),
          length(trim(col("p_name"))).as("name_len"),
          regexp_replace(col("p_name"), " ", "_").as("snake"),
          lpad(col("p_partkey").cast("string"), 8, "0").as("padded_key"))
        .orderBy(col("p_partkey"))
    }),

    "fn_date" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mo"),
          date_trunc("quarter", col("o_orderdate")).cast("date").as("qtr"),
          date_add(col("o_orderdate").cast("date"), 30).as("due_date"),
          datediff(col("o_orderdate").cast("date"), lit("2024-01-01").cast("date"))
            .as("days_since_2024"),
          dayofweek(col("o_orderdate")).as("dow"))
        .orderBy(col("o_orderkey"))
    }),

    // Spark 4 VARIANT surface: parse the JSON payload ONCE into the
    // binary variant encoding, then typed-path extraction + runtime
    // schema inference — the semi-structured column type that
    // replaces per-expression string-JSON re-parsing (fn_json's
    // get_json_object re-tokenizes the string on every call; a
    // variant column parses at ingest and every downstream access is
    // a binary offset walk — the 100 TB difference for logs with many
    // extracted fields). Missing paths are SQL NULL (pinned by the
    // `absent` column).
    "fn_variant" -> ((s, dir) => {
      Tables(s, dir, "events")
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'int')").as("k"),
          expr("schema_of_variant(v)").as("vschema"),
          expr("variant_get(v, '$.absent', 'int')").as("absent"))
        .orderBy(col("event_id"))
    }),

    // Calendar-interval arithmetic — the month-aware family fn_date's
    // day arithmetic can't express: add_months with end-of-month
    // clamping (Jan 31 + 1 month = Feb 29, the Gregorian behavior
    // both engines implement via clamp-to-last-day), last_day,
    // next_day by weekday name (ISO-weekday modular arithmetic in the
    // oracle), ISO week + day-of-year. All narrow per-row codegen'd
    // expressions — calendar math over 100 TB is scan-speed.
    "fn_interval" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderdate").cast("date").as("d"))
        .select(col("o_orderkey"), col("d"),
          add_months(col("d"), 1).as("plus_1m"),
          add_months(col("d"), -2).as("minus_2m"),
          last_day(col("d")).as("month_end"),
          next_day(col("d"), "Mon").as("next_monday"),
          weekofyear(col("d")).as("iso_week"),
          dayofyear(col("d")).as("doy"))
        .orderBy(col("o_orderkey"))
    }),

    "fn_math" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          abs(col("p_size") - 25).as("abs_off"),
          pmod(col("p_partkey"), lit(7)).as("key_mod7"),
          pow(lit(2), col("p_size") % 10).cast("long").as("pow2"),
          ceil(col("p_retailprice")).cast("long").as("price_ceil"),
          floor(col("p_retailprice")).cast("long").as("price_floor"),
          signum(col("p_size") - 25).cast("int").as("sgn"),
          greatest(col("p_size"), lit(10)).as("ge10"),
          least(col("p_size"), lit(40)).as("le40"),
          Tables.money(col("p_retailprice") / 100).as("price_pct"))
        .orderBy(col("p_partkey"))
    }),

    "fn_case_cast" -> ((s, dir) => {
      Tables(s, dir, "customer")
        .select(col("c_custkey"),
          when(col("c_acctbal") < 0, "overdrawn")
            .when(col("c_acctbal") < 5000, "low")
            .when(col("c_acctbal") < 9000, "mid")
            .otherwise("high").as("bal_bucket"),
          floor(col("c_acctbal")).cast("long").as("bal_int"),
          floor(col("c_acctbal")).cast("long").cast("string").as("bal_str"),
          col("c_custkey").cast("string").cast("long").as("key_roundtrip"))
        .orderBy(col("c_custkey"))
    }),

    "fn_json" -> ((s, dir) => {
      // props is a JSON string like {"k": 87}: extract, cast, aggregate.
      Tables(s, dir, "events")
        .withColumn("k", get_json_object(col("props"), "$.k").cast("int"))
        .groupBy(pmod(col("k"), lit(10)).as("k_mod10"))
        .agg(count(lit(1)).as("n"), sum(col("k")).as("sum_k"))
        .orderBy(col("k_mod10"))
    }),

    "fn_array" -> ((s, dir) => {
      // Higher-order array fns over embedding: all comparisons are
      // exact float predicates, so no float leaves the query.
      Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          size(col("embedding")).as("dim"),
          (element_at(col("embedding"), 1) > 0).as("first_pos"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"),
          size(filter(col("embedding"), x => x > lit(0.5f))).as("n_big"))
        .orderBy(col("vec_id"))
    }),

    "fn_map" -> ((s, dir) => {
      // Payload-style access: build a map column from entries, look a
      // key up (the dynamic TableData() pattern, event.go:220-236).
      Tables(s, dir, "events")
        .withColumn("payload", map_from_arrays(
          array(lit("k"), lit("uid")),
          array(get_json_object(col("props"), "$.k").cast("long"),
            col("user_id"))))
        .select(col("event_id"),
          element_at(col("payload"), "k").as("k_val"),
          element_at(col("payload"), "uid").as("uid_val"),
          size(col("payload")).as("n_keys"))
        .orderBy(col("event_id"))
    }),

    "fn_explode" -> ((s, dir) => {
      // Tokenize → explode (Generator) → word count. The explode output
      // is re-aggregated, so cardinality stays bounded by vocabulary.
      Tables(s, dir, "documents")
        .select(explode(split(col("text"), " ")).as("word"))
        .filter(col("word") =!= "")
        .groupBy(col("word"))
        .agg(count(lit(1)).as("n"))
        .orderBy(col("word"))
    }),

    // explode_outer: rows with an empty generator output survive with
    // null — exercised on the (possibly empty) JSON props key list.
    "fn_explode_outer" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("ks",
          when(col("event_id") % 7 === 0, array())
            .otherwise(array(get_json_object(col("props"), "$.k"))))
        .select(col("event_id"), explode_outer(col("ks")).as("k"))
        .select(col("event_id"), col("k").cast("int").as("k"))
        .orderBy(col("event_id"))
    }),

    // Regex suite: extraction, matching predicate, and match counting
    // (same RE2-compatible patterns in both engines).
    "fn_regex" -> ((s, dir) => {
      Tables(s, dir, "part")
        .filter(col("p_name").rlike("^[a-z]+ "))
        .select(col("p_partkey"),
          regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
          regexp_extract(col("p_type"), "([A-Z]+)$", 1).as("type_tail"),
          expr("CAST(regexp_count(p_name, ' ') AS INT)").as("n_spaces"))
        .orderBy(col("p_partkey"))
    }),

    // Bitwise scalars + aggregates (mask/flag arithmetic): all
    // integer, engine-identical.
    "fn_bitwise" -> ((s, dir) => {
      Tables(s, dir, "part")
        .groupBy(col("p_brand"))
        .agg(count(lit(1)).as("n"),
          expr("bit_and(p_size & 15)").as("and_low"),
          expr("bit_or(shiftleft(1, p_size % 8))").as("or_bands"),
          expr("bit_xor(CAST(p_partkey AS BIGINT))").as("xor_keys"))
        .orderBy(col("p_brand"))
    }),

    // Ordered string aggregation (listagg shape): deterministic via
    // sort-before-join.
    "fn_listagg" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .agg(array_join(array_sort(collect_set(col("o_orderstatus"))), ",")
          .as("statuses"))
        .orderBy(col("o_orderpriority"))
    }),

    // Higher-order lambdas beyond fn_array's filter/size: exists /
    // forall predicates and a left-fold aggregate. All comparisons and
    // the fold run in double (float→double casts are exact), and both
    // engines fold left-to-right over the same element order, so the
    // computed sum is bit-identical before rounding.
    "fn_higher_order" -> ((s, dir) => {
      Tables(s, dir, "embeddings")
        .select(col("vec_id"),
          exists(col("embedding"),
            x => x.cast("double") > lit(0.9)).as("any_big"),
          forall(col("embedding"),
            x => x.cast("double") > lit(-1.0)).as("all_gt_neg1"),
          // + 0.0 collapses IEEE −0.0 to +0.0 (both engines render the
          // sign, so a rounded −0.004 would otherwise hash-mismatch as
          // "-0.0" vs "0.0" depending on each engine's fold order).
          (round(aggregate(col("embedding"), lit(0.0),
            (acc, x) => acc + x.cast("double")), 2) + lit(0.0)).as("sum_emb"))
        .orderBy(col("vec_id"))
    }),

    // Cryptographic digests (the reference's only scalar computation is
    // SHA-1+hex auth encoding, client.go:324-347 — this is the digest
    // surface generalized): md5 / sha2-256 hex over document text.
    // Codegen'd built-ins; both engines emit lowercase hex.
    "fn_hash" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), md5(col("text")).as("h_md5"),
          sha2(col("text"), 256).as("h_sha256"),
          length(col("text")).as("len"))
        .orderBy(col("doc_id"))
    }),

    // Order-independent whole-table checksum: per-row md5 of the
    // '|'-delimited serialized row — every column routed through
    // coalesce(CAST(col AS STRING), '<NULL>') so the serialization is
    // null-safe even outside the testdata's non-null contract
    // (concat_ws silently DROPS nulls, which would collide (1,NULL,2)
    // with (1,2,NULL), and DuckDB's || would instead propagate NULL —
    // the sentinel keeps both engines identical on nullable rows),
    // truncated to 60 bits and SUMMED mod 2^60 —
    // addition commutes, so the checksum is independent of
    // partitioning, ordering, and merge order, and two clusters can
    // compare a 100 TB table by exchanging ONE number from a
    // scan-speed map + map-side-combined agg (the cross-engine "are
    // these tables identical" primitive whose row-by-row sibling is
    // diff_snapshot). The per-segment breakdown localizes any
    // mismatch; sums ride DECIMAL(38,0)/HUGEINT before the mod.
    "fn_table_checksum" -> ((s, dir) => {
      def nz(e: String) = s"coalesce(CAST($e AS STRING), '<NULL>')"
      val rowHash = expr("CAST(conv(substring(md5(concat_ws('|', " +
        s"${nz("o_orderkey")}, ${nz("o_custkey")}, " +
        s"${nz("o_orderstatus")}, " +
        s"${nz("CAST(round(o_totalprice * 100) AS BIGINT)")}, " +
        s"${nz("o_orderdate")}, ${nz("o_orderpriority")})), 1, 15), " +
        "16, 10) AS BIGINT)")
      Tables(s, dir, "orders")
        .select(col("o_orderpriority"), rowHash.as("rh"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n_rows"),
          expr("CAST(sum(CAST(rh AS DECIMAL(38,0))) % " +
            "1152921504606846976 AS BIGINT)").as("checksum"))
        .orderBy(col("o_orderpriority"))
    }),

    // Struct (nested-record) surface: build a named struct, filter and
    // project through dotted field access. Catalyst collapses the
    // build-then-extract into plain column references (no struct is
    // materialized in the scan→filter→project pipeline), so nesting is
    // free at scale; the oracle builds a real DuckDB STRUCT.
    "fn_struct" -> ((s, dir) => {
      Tables(s, dir, "orders")
        .select(struct(col("o_orderkey").as("k"),
          col("o_totalprice").as("v"),
          col("o_orderstatus").as("st")).as("rec"))
        .filter(col("rec.v") > 480000)
        .select(col("rec.k").as("k"), col("rec.st").as("st"),
          col("rec").getField("v").as("v"))
        .orderBy(col("k"))
    }),

    // URL surface — the curation primitive of web-scale corpus prep
    // (domain allow/deny lists, per-host dedup, query-param stripping).
    // A URL is synthesized per document from its own columns, then torn
    // back apart with Spark's codegen'd parse_url; the oracle
    // reconstructs the same parts directly, so a pass proves the
    // parser extracts exactly what was embedded.
    "fn_url" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("url", concat(lit("https://"), col("source"),
          lit(".example.org/"), col("lang"), lit("/doc-"), col("doc_id"),
          lit("?ref=r"), pmod(col("doc_id"), lit(7))))
        .select(col("doc_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY"), lit("ref")).as("ref"),
          split(parse_url(col("url"), lit("HOST")), lit("\\."))
            .getItem(1).as("sld"))
        .orderBy(col("doc_id"))
    }),

    // Second string batch: positional/segment functions shared by both
    // engines (split_part/strpos/reverse/repeat/left/right).
    "fn_string_extra" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          split_part(col("p_type"), lit(" "), lit(1)).as("type_head"),
          instr(col("p_type"), " ").cast("int").as("first_space"),
          reverse(col("p_brand")).as("brand_rev"),
          repeat(lit("*"), col("p_size") % 5).as("stars"),
          substring(col("p_name"), 1, 4).as("name4"),
          expr("right(p_name, 3)").as("name_tail"))
        .orderBy(col("p_partkey"))
    }),

    // Binary encode/decode surface: base64 + hex over utf-8 bytes with
    // a decode roundtrip proven in the output — the envelope-payload
    // encoding leg (CDC payloads and media blobs ride as binary).
    "fn_binary" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"),
          base64(col("lang").cast("binary")).as("lang_b64"),
          hex(col("lang").cast("binary")).as("lang_hex"),
          (unbase64(base64(col("text").cast("binary"))).cast("string")
            === col("text")).as("roundtrip_ok"))
        .orderBy(col("doc_id"))
    }),

    // printf-style formatting (integer/string conversions only — %f
    // rounding is locale/impl-defined and would break oracle parity;
    // id-padding, hex render, literal %% all covered).
    "fn_format" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          format_string("P%07d/%s", col("p_partkey"), col("p_brand"))
            .as("tag"),
          format_string("%x", col("p_partkey")).as("hex_key"),
          format_string("%d%%", col("p_size")).as("size_pct"))
        .orderBy(col("p_partkey"))
    }),

    // Positional explode (generator with ordinality): token position
    // matters for fingerprints/n-grams, so the generator must carry
    // the index. Narrow generate + the presentation sort only.
    "fn_posexplode" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .filter(col("doc_id") < 20)
        .select(col("doc_id"),
          posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
        .filter(col("w") =!= "")
        .orderBy(col("doc_id"), col("pos"))
    }),

    // inline: the struct-array generator — one row per element with
    // the struct fields spread into columns (the UDTF shape; completes
    // the generator family with explode/explode_outer/posexplode).
    "fn_inline" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("toks", slice(split(col("text"), " "), 1, 5))
        .selectExpr("doc_id",
          "inline(transform(toks, (w, i) -> " +
            "struct(i AS idx, w AS word, length(w) AS wlen)))")
        .orderBy(col("doc_id"), col("idx"))
    }),

    // stack: the constant-table generator (n, k1, v1, k2, v2, …) —
    // the generator form of unpivot, one (metric, value) row pair per
    // input row. Integer values only so both engines agree exactly.
    "fn_stack" -> ((s, dir) => {
      Tables(s, dir, "part")
        .selectExpr("p_partkey",
          "stack(2, 'retail_cents', CAST(round(p_retailprice * 100) AS BIGINT), " +
            "'size', CAST(p_size AS BIGINT)) AS (metric, value)")
        .orderBy(col("p_partkey"), col("metric"))
    }),

    // Array SET algebra (union/intersect/except/overlap) between two
    // per-row token windows — the per-row sibling of the relational
    // set ops. Results are sorted + serialized so element order
    // (engine-defined in the raw functions) never leaks into the
    // comparison; all narrow codegen'd builtins.
    "fn_array_set" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("a", slice(col("toks"), 1, 10))
        .withColumn("b", expr("slice(toks, greatest(1, size(toks) - 9), 10)"))
        .select(col("doc_id"),
          array_join(array_sort(array_union(col("a"), col("b"))), " ")
            .as("u"),
          array_join(array_sort(array_intersect(col("a"), col("b"))), " ")
            .as("i"),
          array_join(array_sort(array_except(col("a"), col("b"))), " ")
            .as("d"),
          arrays_overlap(col("a"), col("b")).as("has_common"))
        .orderBy(col("doc_id"))
    }),

    // Error-safe evaluation surface (`try_*`): under ANSI SQL mode
    // (Spark 4's default) a single malformed row aborts a 100 TB job
    // mid-stage — the try_ forms return NULL instead, which is the
    // only viable posture when scrubbing raw corpora. All evaluated
    // row-local inside codegen; the oracle mirrors with TRY_CAST /
    // NULLIF.
    "fn_try" -> ((s, dir) => {
      Tables(s, dir, "part")
        .select(col("p_partkey"),
          expr("try_cast(p_brand AS INT)").as("bad_cast"),
          expr("try_cast(CAST(p_size AS STRING) AS INT)").as("good_cast"),
          expr("try_divide(p_retailprice, p_size - p_size)").as("div0"),
          expr("try_divide(p_retailprice, 2)").as("half"))
        .orderBy(col("p_partkey"))
    }),

    // Calendar-spine generation: sequence() materializes the month
    // backbone between the corpus date bounds, then a left join shows
    // per-month order counts INCLUDING empty months — the standard
    // gaps-visible time-series shape. The spine is ~tens of rows
    // (broadcast side); the fact side contributes one two-phase agg.
    "fn_sequence" -> ((s, dir) => {
      val o = Tables(s, dir, "orders")
        .select(to_date(col("o_orderdate")).as("d"))
      val months = o.agg(trunc(min(col("d")), "MM").as("lo"),
          trunc(max(col("d")), "MM").as("hi"))
        .select(explode(sequence(col("lo"), col("hi"),
          expr("interval 1 month"))).as("month"))
      val per = o.groupBy(trunc(col("d"), "MM").as("month"))
        .agg(count(lit(1)).as("n_orders"))
      months.join(per, Seq("month"), "left_outer")
        .select(col("month"),
          coalesce(col("n_orders"), lit(0L)).as("n_orders"))
        .orderBy(col("month"))
    }),

    // SQL-defined functions (Spark 4's `CREATE FUNCTION … RETURN` —
    // scalar SQL UDFs and SQL TABLE functions): the reusable-logic
    // surface that needs NO Scala and stays fully inside Catalyst
    // (the function body is inlined into the plan at analysis, so
    // codegen/pushdown see plain expressions — unlike a black-box
    // lambda UDF). A scalar money-cents UDF composes inside a
    // parameterized table function (per-status revenue by price
    // tier), invoked twice with different arguments and unioned.
    // CREATE OR REPLACE keeps the definition idempotent across bench
    // warm-up re-runs in one session.
    "fn_sql_udf" -> ((s, dir) => {
      Tables(s, dir, "orders").createOrReplaceTempView("sqludf_orders")
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_cents(x DOUBLE) " +
        "RETURNS BIGINT RETURN CAST(round(x * 100) AS BIGINT)")
      s.sql("CREATE OR REPLACE TEMPORARY FUNCTION graft_tier(x DOUBLE) " +
        "RETURNS STRING RETURN CASE WHEN x >= 200000 THEN 'high' " +
        "WHEN x >= 100000 THEN 'mid' ELSE 'low' END")
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION
        graft_rev_by_tier(status STRING)
        RETURNS TABLE(tier STRING, n BIGINT, cents BIGINT)
        RETURN SELECT graft_tier(o_totalprice),
          CAST(count(*) AS BIGINT),
          CAST(sum(graft_cents(o_totalprice)) AS BIGINT)
        FROM sqludf_orders WHERE o_orderstatus = status GROUP BY 1""")
      s.sql("""
        SELECT 'F' AS status, tier, n, cents FROM graft_rev_by_tier('F')
        UNION ALL
        SELECT 'O', tier, n, cents FROM graft_rev_by_tier('O')
        ORDER BY status, tier""")
    }),

    // Min-max feature scaling (the ML feature-prep transform): every
    // event's value rescaled to its event-type group's [min, max]
    // range in integer permille — cross-multiplied, never a float
    // ratio; constant groups (hi = lo) declared NULL. The group
    // bounds are a TINY two-phase agg (|event types| rows) BROADCAST
    // back onto the fact scan, so at 100 TB normalization costs one
    // map-side-combined agg + one broadcast-join pass — the fact
    // never shuffles.
    "fn_feature_scale" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("event_id"), col("event_type"),
          expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      val b = e.groupBy(col("event_type"))
        .agg(min(col("cents")).as("lo"), max(col("cents")).as("hi"))
      e.join(broadcast(b), "event_type")
        .select(col("event_id"), col("event_type"), col("cents"),
          expr("CASE WHEN hi = lo THEN NULL ELSE " +
            "((cents - lo) * 1000) div (hi - lo) END").as("scaled_pm"))
        .orderBy(col("event_id"))
    })
  )

  def oracle: Map[String, String] = Map(
    "fn_feature_scale" ->
      """WITH e AS (
        |  SELECT event_id, event_type,
        |    CAST(round(value * 100) AS BIGINT) AS cents
        |  FROM events),
        |b AS (
        |  SELECT event_type, min(cents) AS lo, max(cents) AS hi
        |  FROM e GROUP BY event_type)
        |SELECT e.event_id, e.event_type, e.cents,
        |  CASE WHEN hi = lo THEN NULL
        |    ELSE CAST(((cents - lo) * 1000) // (hi - lo) AS BIGINT)
        |  END AS scaled_pm
        |FROM e JOIN b USING (event_type)
        |ORDER BY event_id""".stripMargin,

    "fn_sql_udf" ->
      """WITH t AS (
        |  SELECT o_orderstatus AS status,
        |    CASE WHEN o_totalprice >= 200000 THEN 'high'
        |      WHEN o_totalprice >= 100000 THEN 'mid'
        |      ELSE 'low' END AS tier,
        |    CAST(round(o_totalprice * 100) AS BIGINT) AS c
        |  FROM orders WHERE o_orderstatus IN ('F', 'O'))
        |SELECT status, tier, CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(c) AS BIGINT) AS cents
        |FROM t GROUP BY status, tier
        |ORDER BY status, tier""".stripMargin,

    "fn_string" ->
      """SELECT p_partkey,
        |  upper(p_name) AS uname,
        |  substring(p_type, 1, 6) AS ty6,
        |  concat_ws('/', p_brand, p_type) AS brand_type,
        |  length(trim(p_name)) AS name_len,
        |  replace(p_name, ' ', '_') AS snake,
        |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(month(o_orderdate) AS INT) AS mo,
        |  CAST(date_trunc('quarter', o_orderdate) AS DATE) AS qtr,
        |  CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE) AS due_date,
        |  CAST(datediff('day', DATE '2024-01-01', CAST(o_orderdate AS DATE)) AS INT)
        |    AS days_since_2024,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow
        |FROM orders ORDER BY o_orderkey""".stripMargin,

    // vschema: every props payload is {"k": <int 0..99>} (testdata
    // contract, re-checked at verify time by this very constant —
    // schema_of_variant infers BIGINT for JSON integers).
    "fn_variant" ->
      """SELECT event_id,
        |  CAST(json_extract(props, '$.k') AS INT) AS k,
        |  'OBJECT<k: BIGINT>' AS vschema,
        |  CAST(NULL AS INT) AS absent
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_interval" ->
      """WITH o AS (
        |  SELECT o_orderkey, CAST(o_orderdate AS DATE) AS d FROM orders)
        |SELECT o_orderkey, d,
        |  CAST(d + INTERVAL 1 MONTH AS DATE) AS plus_1m,
        |  CAST(d - INTERVAL 2 MONTH AS DATE) AS minus_2m,
        |  last_day(d) AS month_end,
        |  d + CAST(CASE WHEN (8 - isodow(d)) % 7 = 0 THEN 7
        |           ELSE (8 - isodow(d)) % 7 END AS INT) AS next_monday,
        |  CAST(weekofyear(d) AS INT) AS iso_week,
        |  CAST(dayofyear(d) AS INT) AS doy
        |FROM o ORDER BY o_orderkey""".stripMargin,

    "fn_math" ->
      s"""SELECT p_partkey,
         |  abs(p_size - 25) AS abs_off,
         |  p_partkey % 7 AS key_mod7,
         |  CAST(power(2, p_size % 10) AS BIGINT) AS pow2,
         |  CAST(ceil(p_retailprice) AS BIGINT) AS price_ceil,
         |  CAST(floor(p_retailprice) AS BIGINT) AS price_floor,
         |  CAST(sign(p_size - 25) AS INT) AS sgn,
         |  greatest(p_size, 10) AS ge10,
         |  least(p_size, 40) AS le40,
         |  ${Tables.sql.money("p_retailprice / 100")} AS price_pct
         |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_case_cast" ->
      """SELECT c_custkey,
        |  CASE WHEN c_acctbal < 0 THEN 'overdrawn'
        |       WHEN c_acctbal < 5000 THEN 'low'
        |       WHEN c_acctbal < 9000 THEN 'mid'
        |       ELSE 'high' END AS bal_bucket,
        |  CAST(floor(c_acctbal) AS BIGINT) AS bal_int,
        |  CAST(CAST(floor(c_acctbal) AS BIGINT) AS VARCHAR) AS bal_str,
        |  CAST(CAST(c_custkey AS VARCHAR) AS BIGINT) AS key_roundtrip
        |FROM customer ORDER BY c_custkey""".stripMargin,

    "fn_json" ->
      """SELECT CAST(json_extract_string(props, '$.k') AS INT) % 10 AS k_mod10,
        |  count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k
        |FROM events
        |GROUP BY k_mod10
        |ORDER BY k_mod10""".stripMargin,

    "fn_array" ->
      """SELECT vec_id, label,
        |  CAST(len(embedding) AS INT) AS dim,
        |  embedding[1] > 0 AS first_pos,
        |  CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos,
        |  CAST(len(list_filter(embedding, x -> x > CAST(0.5 AS FLOAT))) AS INT) AS n_big
        |FROM embeddings ORDER BY vec_id""".stripMargin,

    "fn_map" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |  user_id AS uid_val,
        |  2 AS n_keys
        |FROM events ORDER BY event_id""".stripMargin,

    "fn_explode" ->
      """SELECT word, count(*) AS n FROM (
        |  SELECT unnest(string_split(text, ' ')) AS word FROM documents)
        |WHERE word <> ''
        |GROUP BY word ORDER BY word""".stripMargin,

    "fn_explode_outer" ->
      """SELECT event_id,
        |  CASE WHEN event_id % 7 = 0 THEN NULL
        |       ELSE CAST(json_extract_string(props, '$.k') AS INT)
        |  END AS k
        |FROM events
        |ORDER BY event_id""".stripMargin,

    "fn_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  regexp_extract(p_type, '([A-Z]+)$', 1) AS type_tail,
        |  CAST(len(regexp_extract_all(p_name, ' ')) AS INT) AS n_spaces
        |FROM part
        |WHERE regexp_matches(p_name, '^[a-z]+ ')
        |ORDER BY p_partkey""".stripMargin,

    "fn_bitwise" ->
      """SELECT p_brand, count(*) AS n,
        |  CAST(bit_and(p_size & 15) AS INT) AS and_low,
        |  CAST(bit_or(1 << (p_size % 8)) AS INT) AS or_bands,
        |  CAST(bit_xor(CAST(p_partkey AS BIGINT)) AS BIGINT) AS xor_keys
        |FROM part
        |GROUP BY p_brand
        |ORDER BY p_brand""".stripMargin,

    "fn_listagg" ->
      """SELECT o_orderpriority,
        |  string_agg(DISTINCT o_orderstatus, ',' ORDER BY o_orderstatus)
        |    AS statuses
        |FROM orders
        |GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "fn_hash" ->
      """SELECT doc_id, md5(text) AS h_md5, sha256(text) AS h_sha256,
        |  CAST(length(text) AS INT) AS len
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "fn_table_checksum" ->
      """WITH r AS (
        |  SELECT o_orderpriority,
        |    CAST(('0x' || substr(md5(
        |      coalesce(CAST(o_orderkey AS VARCHAR), '<NULL>') || '|' ||
        |      coalesce(CAST(o_custkey AS VARCHAR), '<NULL>') || '|' ||
        |      coalesce(o_orderstatus, '<NULL>') || '|' ||
        |      coalesce(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
        |        AS VARCHAR), '<NULL>') || '|' ||
        |      coalesce(CAST(o_orderdate AS VARCHAR), '<NULL>') || '|' ||
        |      coalesce(o_orderpriority, '<NULL>')), 1, 15))
        |      AS BIGINT) AS rh
        |  FROM orders)
        |SELECT o_orderpriority, count(*) AS n_rows,
        |  CAST(sum(CAST(rh AS HUGEINT)) % 1152921504606846976
        |    AS BIGINT) AS checksum
        |FROM r GROUP BY o_orderpriority
        |ORDER BY o_orderpriority""".stripMargin,

    "fn_struct" ->
      """SELECT rec.k AS k, rec.st AS st, rec.v AS v
        |FROM (SELECT {'k': o_orderkey, 'v': o_totalprice,
        |              'st': o_orderstatus} AS rec
        |      FROM orders)
        |WHERE rec.v > 480000
        |ORDER BY k""".stripMargin,

    "fn_higher_order" ->
      """SELECT vec_id,
        |  len(list_filter(embedding,
        |    x -> CAST(x AS DOUBLE) > 0.9)) > 0 AS any_big,
        |  len(list_filter(embedding,
        |    x -> NOT (CAST(x AS DOUBLE) > -1.0))) = 0 AS all_gt_neg1,
        |  round(list_reduce(
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)),
        |    (a, b) -> a + b), 2) + 0.0 AS sum_emb
        |FROM embeddings
        |ORDER BY vec_id""".stripMargin,

    "fn_url" ->
      """SELECT doc_id,
        |  source || '.example.org' AS host,
        |  '/' || lang || '/doc-' || doc_id AS path,
        |  'r' || CAST(doc_id % 7 AS VARCHAR) AS ref,
        |  'example' AS sld
        |FROM documents
        |ORDER BY doc_id""".stripMargin,

    "fn_string_extra" ->
      """SELECT p_partkey,
        |  split_part(p_type, ' ', 1) AS type_head,
        |  CAST(strpos(p_type, ' ') AS INT) AS first_space,
        |  reverse(p_brand) AS brand_rev,
        |  repeat('*', CAST(p_size % 5 AS INT)) AS stars,
        |  substring(p_name, 1, 4) AS name4,
        |  right(p_name, 3) AS name_tail
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_binary" ->
      """SELECT doc_id,
        |  to_base64(CAST(lang AS BLOB)) AS lang_b64,
        |  hex(CAST(lang AS BLOB)) AS lang_hex,
        |  text = text AS roundtrip_ok
        |FROM documents ORDER BY doc_id""".stripMargin,

    "fn_format" ->
      """SELECT p_partkey,
        |  printf('P%07d/%s', p_partkey, p_brand) AS tag,
        |  printf('%x', p_partkey) AS hex_key,
        |  printf('%d%%', p_size) AS size_pct
        |FROM part ORDER BY p_partkey""".stripMargin,

    // generate_subscripts + unnest align positionally in DuckDB, so
    // (pos, w) pairs stay index-correct; Spark posexplode is 0-based
    "fn_posexplode" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents WHERE doc_id < 20
        |), u AS (
        |  SELECT doc_id,
        |    CAST(generate_subscripts(toks, 1) - 1 AS INT) AS pos,
        |    unnest(toks) AS w
        |  FROM t)
        |SELECT doc_id, pos, w FROM u
        |WHERE w <> ''
        |ORDER BY doc_id, pos""".stripMargin,

    "fn_inline" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ')[1:5] AS toks
        |  FROM documents
        |), u AS (
        |  SELECT doc_id,
        |    CAST(generate_subscripts(toks, 1) - 1 AS INT) AS idx,
        |    unnest(toks) AS word
        |  FROM t)
        |SELECT doc_id, idx, word, CAST(length(word) AS INT) AS wlen
        |FROM u ORDER BY doc_id, idx""".stripMargin,

    "fn_stack" ->
      """SELECT p_partkey, metric, value FROM (
        |  SELECT p_partkey, 'retail_cents' AS metric,
        |    CAST(round(p_retailprice * 100) AS BIGINT) AS value
        |  FROM part
        |  UNION ALL
        |  SELECT p_partkey, 'size', CAST(p_size AS BIGINT) FROM part)
        |ORDER BY p_partkey, metric""".stripMargin,

    // explicit list_filter/list_contains constructions: the raw
    // DuckDB list_intersect/list_has_any dedup/order semantics are
    // not guaranteed to match Spark's, the filtered forms are exact
    "fn_array_set" ->
      """WITH t AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks
        |  FROM documents
        |), ab AS (
        |  SELECT doc_id, toks[1:10] AS a,
        |    toks[greatest(1, len(toks) - 9):(len(toks))] AS b
        |  FROM t)
        |SELECT doc_id,
        |  array_to_string(list_sort(list_distinct(list_concat(a, b))), ' ')
        |    AS u,
        |  -- array_to_string([]) is NULL in DuckDB, '' in Spark
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |    x -> list_contains(b, x))), ' '), '') AS i,
        |  coalesce(array_to_string(list_sort(list_filter(list_distinct(a),
        |    x -> NOT list_contains(b, x))), ' '), '') AS d,
        |  len(list_filter(list_distinct(a),
        |    x -> list_contains(b, x))) > 0 AS has_common
        |FROM ab ORDER BY doc_id""".stripMargin,

    "fn_try" ->
      """SELECT p_partkey,
        |  TRY_CAST(p_brand AS INT) AS bad_cast,
        |  TRY_CAST(CAST(p_size AS VARCHAR) AS INT) AS good_cast,
        |  p_retailprice / nullif(p_size - p_size, 0) AS div0,
        |  p_retailprice / 2 AS half
        |FROM part ORDER BY p_partkey""".stripMargin,

    "fn_sequence" ->
      """WITH b AS (
        |  SELECT date_trunc('month', min(o_orderdate)) AS lo,
        |         date_trunc('month', max(o_orderdate)) AS hi
        |  FROM orders),
        |spine AS (
        |  SELECT CAST(unnest(generate_series(lo, hi,
        |    INTERVAL 1 MONTH)) AS DATE) AS month FROM b),
        |per AS (
        |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
        |    count(*) AS n_orders
        |  FROM orders GROUP BY 1)
        |SELECT spine.month,
        |  CAST(coalesce(per.n_orders, 0) AS BIGINT) AS n_orders
        |FROM spine LEFT JOIN per ON spine.month = per.month
        |ORDER BY spine.month""".stripMargin
  )
}
