package graft.ops

import graft.Tables
import graft.operators.SequencePack
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sampling / sharding / packing (SURVEY.md §2.2 "Training-data
  * pipeline extensions" — the corpus-assembly half).
  *
  * Everything here must be *reproducible across engines and runs*, so
  * none of it uses `rand()`: the sampling coin is the md5 hex digest of
  * a stable key, compared lexicographically (fixed-width lowercase hex
  * ⇒ lexicographic = numeric order), which Spark and DuckDB compute
  * identically byte-for-byte. That is also the 100 TB story: a
  * hash-coin sample is a narrow-only plan (filter pushes to the scan,
  * no shuffle at all), re-runnable on any subset of the data with the
  * same decisions — unlike `TABLESAMPLE`/`rand()`, which neither
  * repeats nor distributes deterministically.
  *
  *  - sample_hash:        Bernoulli p=1/8 over lineitem (uniform).
  *  - sample_stratified:  per-language target rates over documents —
  *                        the mixture-rebalancing step of corpus prep.
  *  - sample_shard:       deterministic shard assignment (md5 → 24-bit
  *                        int, mod 16 divides 2^24 ⇒ unbiased) + shard
  *                        balance stats; one hash-agg, no row shuffle.
  *  - sample_interleave:  weighted round-robin corpus mixing — each
  *                        source s gets weight w(s) ∈ {1,2,3}; row n of
  *                        a source is emitted at integer position
  *                        n·(6/w), so a weight-3 source appears 3× as
  *                        often as a weight-1 source in any prefix of
  *                        the merged stream (the canonical training-mix
  *                        interleave, computed per-source with one
  *                        window each, then merged by a sort).
  *  - sample_pack:        next-fit sequence packing into 128-token
  *                        context windows, parallel per (lang, shard) —
  *                        see [[graft.operators.SequencePack]].
  */
object SampleOps extends OpPack {

  /** md5 hex of a stable key column (both engines: lowercase hex). */
  private def coin(c: org.apache.spark.sql.Column) = md5(c.cast("string"))

  def queries: Map[String, Q] = Map(
    // Deterministic contrastive-negative mining (the in-batch-negative
    // construction SimCLR/DPR-style training feeds on): every anchor
    // vector gets 2 negatives = its cyclic successors in a
    // hash-bucketed ring — bucket from the md5 24-bit prefix (the
    // sample_shard idiom), ring order by a second independent md5
    // coin, successors at ranks (r mod m)+1 and ((r+1) mod m)+1 so
    // every vector serves as a negative exactly twice (balanced
    // usage, no coupon-collector skew). Buckets under 3 members drop
    // (declared — no self-negatives). Label collisions are REPORTED,
    // not filtered (the audit column false-negative mining reads).
    // SCALE: the ring window is per-bucket bounded (production sets
    // the bucket count ∝ corpus / target bucket size; 64 here), and
    // both successor joins are EQUI-joins on (bucket, computed rank)
    // — co-partitioned with the window's own exchange, never a cross.
    "sample_negatives" -> ((s, dir) => {
      val B = 64
      val base = Tables(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          expr("CAST(conv(substring(md5(CAST(vec_id AS STRING)), 1, 6)," +
            s" 16, 10) AS BIGINT) % $B").as("bucket"),
          md5(concat(lit("neg:"), col("vec_id").cast("string")))
            .as("coin"))
      val r = base
        .withColumn("r", row_number().over(
          Window.partitionBy(col("bucket"))
            .orderBy(col("coin"), col("vec_id"))).cast("long"))
        .withColumn("m",
          count(lit(1)).over(Window.partitionBy(col("bucket"))))
        .filter(col("m") >= 3)
        .select(col("vec_id"), col("label"), col("bucket"),
          col("r"), col("m"))
      val n1 = r.select(col("bucket").as("b1"), col("r").as("r1"),
        col("vec_id").as("neg1"), col("label").as("label1"))
      val n2 = r.select(col("bucket").as("b2"), col("r").as("r2"),
        col("vec_id").as("neg2"), col("label").as("label2"))
      r.join(n1, col("bucket") === col("b1") &&
          (col("r") % col("m")) + lit(1L) === col("r1"))
        .join(n2, col("bucket") === col("b2") &&
          ((col("r") + lit(1L)) % col("m")) + lit(1L) === col("r2"))
        .select(col("vec_id"), col("neg1"), col("neg2"),
          expr("CAST((CASE WHEN label = label1 THEN 1 ELSE 0 END) + " +
            "(CASE WHEN label = label2 THEN 1 ELSE 0 END) AS BIGINT)")
            .as("n_label_collisions"))
        .orderBy(col("vec_id"))
    }),

    // Curriculum-ordering head sample: documents bucketed into 4
    // quality quartiles by mean chars-per-token (×100 fixed point —
    // the cheap fluency proxy; curriculum training feeds "easy" short-
    // word text first), cuts computed by the agg_hist_eqdepth
    // counts+cumsum pass over DISTINCT scores (all-integer rank test
    // == percentile_disc, one bounded collect), then the first 25
    // docs per bucket by an md5 coin — the deterministic "what does
    // each difficulty tier look like" sample a curation review reads.
    // SCALE: bucket id is a literal comparison chain at the scan; the
    // per-bucket rank ≤ 25 collapses to WindowGroupLimit (per-
    // partition top-k heaps before the exchange), so the 4-partition
    // window never sees more than 25·n_map_partitions rows.
    "sample_curriculum" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
        .select(col("doc_id"), col("n_chars"),
          size(split(col("text"), " ")).as("n_toks"))
        .withColumn("score",
          expr("CAST((n_chars * 100) div n_toks AS BIGINT)"))
        .filter(col("score").isNotNull)
      val counts = d.groupBy(col("score")).agg(count(lit(1)).as("n"))
      val cum = counts
        .withColumn("cum", sum(col("n")).over(
          Window.orderBy(col("score"))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("total",
          sum(col("n")).over(Window.partitionBy(lit(1))))
      val cutExprs = (1 to 3).map(i =>
        min(when(col("cum") * 4 >= col("total") * i, col("score")))
          .as(s"c$i"))
      val row = cum.agg(cutExprs.head, cutExprs.tail: _*).collect()(0)
      // empty documents: cuts are NULL; 0 keeps the op total (the
      // bucketed frame below is empty anyway)
      def cut(i: Int): Long =
        Option(row.getAs[java.lang.Long](s"c$i")).map(_.toLong)
          .getOrElse(0L)
      val bucket = (1 to 3)
        .map(i => when(col("score") > lit(cut(i)), 1).otherwise(0))
        .reduce(_ + _) + lit(1)
      d.withColumn("bucket", bucket.cast("long"))
        .withColumn("coin",
          md5(concat(lit("cur:"), col("doc_id").cast("string"))))
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("bucket"))
            .orderBy(col("coin"), col("doc_id"))).cast("long"))
        .filter(col("rn") <= 25)
        .select(col("bucket"), col("rn"), col("doc_id"), col("score"))
        .orderBy(col("bucket"), col("rn"))
    }),

    "sample_hash" -> ((s, dir) => {
      val li = Tables(s, dir, "lineitem")
      val key = concat_ws("-", col("l_orderkey"), col("l_linenumber"),
        col("l_partkey"), col("l_suppkey"))
      li.filter(substring(md5(key), 1, 4) < "2000") // 0x2000/0x10000 = 1/8
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
        .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
          col("l_suppkey"))
    }),

    "sample_stratified" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      // per-language keep-rate thresholds on the 16-bit hash prefix:
      // en 1/8, fr 1/4, es 1/2, zh 1/4, de 1/8 — downsample the
      // over-represented languages, keep more of the rare ones.
      val thr = when(col("lang") === "en", "2000")
        .when(col("lang") === "fr", "4000")
        .when(col("lang") === "es", "8000")
        .when(col("lang") === "zh", "4000")
        .otherwise("2000")
      d.filter(substring(coin(col("doc_id")), 1, 4) < thr)
        .select(col("doc_id"), col("lang"), col("source"))
        .orderBy(col("doc_id"))
    }),

    "sample_shard" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.select(
          (conv(substring(coin(col("doc_id")), 1, 6), 16, 10).cast("long")
            % 16).as("shard"),
          size(split(col("text"), " ")).as("tok"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok").cast("long")).as("n_tokens"))
        .orderBy(col("shard"))
    }),

    "sample_interleave" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val rn = row_number().over(
        Window.partitionBy(col("source")).orderBy(col("doc_id")))
      d.select(col("doc_id"), col("source"))
        .withColumn("rn", rn)
        .withColumn("weight",
          lit(1) + substring(col("source"), 4, 10).cast("int") % 3)
        .withColumn("pos", (col("rn") * expr("6 div weight")).cast("long"))
        .select(col("pos"), col("doc_id"), col("source"))
        .orderBy(col("pos"), col("doc_id"))
        .limit(200)
    }),

    // Seeded deterministic corpus shuffle: global permutation by
    // hash-of-(seed, id) sort — same order on every run and engine,
    // reshufflable by changing the seed string. The plan is a range
    // sort (here top-100 presentation via TakeOrderedAndProject); at
    // scale the full permutation is the range-partitioned write order
    // every ordered sink already pays.
    "sample_shuffle" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      d.select(col("doc_id"),
          substring(md5(concat(lit("s42-"), col("doc_id").cast("string"))),
            1, 8).as("shuffle_key"))
        .orderBy(col("shuffle_key"), col("doc_id"))
        .limit(100)
    }),

    // Deterministic 90/5/5 train/val/test split: three ranges of the
    // same 16-bit hash prefix (0xe666≈90%, 0xf333≈95%). Multi-way
    // partition of the corpus — every row lands in exactly one split,
    // assignments survive re-runs/subsets, and downstream writers can
    // `partitionBy(split)` without any shuffle of the decision itself.
    // k-fold cross-validation assignment (k=5) from the same md5
    // coin as sample_split — folds are disjoint, exhaustive, and
    // SUBSET-STABLE (a doc's fold never changes when the corpus
    // grows, which rand()-based folding cannot give); each fold is
    // the held-out test set once, train = everything else (n_train
    // from a window total over the 5-ROW fold frame, no second
    // scan). The slight 256-mod-5 bucket bias is declared (hex-pair
    // coin). One hash agg over a narrow scan at any scale.
    "sample_kfold" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .withColumn("fold", expr(
          "CAST(conv(substring(md5(concat('cv', CAST(doc_id AS " +
            "STRING))), 1, 2), 16, 10) AS BIGINT) % 5"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_test"),
          sum(expr("CAST(size(split(text, ' ')) AS BIGINT)"))
            .as("test_tokens"))
        .withColumn("n_train", expr("sum(n_test) OVER () - n_test"))
        .select(col("fold"), col("n_test"), col("n_train"),
          col("test_tokens"))
        .orderBy(col("fold"))
    }),

    "sample_split" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val h = substring(coin(col("doc_id")), 1, 4)
      d.select(
          when(h < "e666", "train").when(h < "f333", "val")
            .otherwise("test").as("split"),
          size(split(col("text"), " ")).as("tok"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok").cast("long")).as("n_tokens"))
        .orderBy(col("split"))
    }),

    // Contiguous token-budget sharding — the distributed PREFIX SUM:
    // assign doc_id-ordered documents to shards of ≤5000 tokens each
    // (the layout step before writing tokenized training shards whose
    // order must match the corpus order). A single global cumsum
    // window would sort the whole corpus in ONE partition; instead
    // this runs the textbook two-phase scan: range-partition by
    // doc_id, per-partition token totals (16 rows) cumsum'd into
    // BROADCAST offsets, then a within-partition running sum shifted
    // by the partition's offset — exact global prefix sums with no
    // global sort, invariant to where the range boundaries land. The
    // oracle checks it against the plain single-window cumsum.
    "llm_token_shards" -> ((s, dir) => {
      val budget = 5000L
      val t = Tables(s, dir, "documents")
        .select(col("doc_id"),
          size(filter(split(col("text"), " "), w => w =!= ""))
            .cast("long").as("n_tok"))
        .repartitionByRange(16, col("doc_id"))
        .sortWithinPartitions(col("doc_id"))
        .withColumn("pid", spark_partition_id())
      val offsets = t.groupBy(col("pid"))
        .agg(sum(col("n_tok")).as("psum"), min(col("doc_id")).as("lo"))
        .withColumn("offset",
          coalesce(sum(col("psum")).over(
            Window.orderBy(col("lo"))
              .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
        .select(col("pid").as("pid2"), col("offset"))
      val wp = Window.partitionBy(col("pid")).orderBy(col("doc_id"))
      t.join(broadcast(offsets), col("pid") === col("pid2"))
        .withColumn("running",
          col("offset") + sum(col("n_tok")).over(wp))
        .withColumn("shard", expr(s"(running - 1) div $budget"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_tok")).as("n_tokens"),
          min(col("doc_id")).as("first_doc"),
          max(col("doc_id")).as("last_doc"))
        .orderBy(col("shard"))
    }),

    "sample_pack" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(4)).cast("long").as("shard"),
        size(split(col("text"), " ")).as("tok"))
      SequencePack(d, idCol = "doc_id", tokCol = "tok",
          grpA = "lang", grpB = "shard", capacity = 128)
        .select(col("doc_id"), col("lang"), col("shard"), col("pack_id"),
          col("tok"))
        .orderBy(col("doc_id"))
    }),

    // Packing-efficiency report (the fill-rate audit run after
    // sequence packing decides a context length: padding is pure
    // wasted compute, and the capacity decision is made FROM this
    // table): per language over sample_pack's exact next-fit
    // assignment — documents, total tokens, packs, pad tokens, and
    // the fill rate in permille (oversized docs overflow their own
    // pack, declared: fill can pass 1000 where single docs exceed
    // capacity). The pack ids are per (lang, shard), so the pack
    // count is a composite-key two-phase distinct; everything else is
    // one map-side-combined rollup of the packing frame.
    "sample_pack_eff" -> ((s, dir) => {
      val d = Tables(s, dir, "documents").select(
        col("doc_id"), col("lang"),
        pmod(col("doc_id"), lit(4)).cast("long").as("shard"),
        size(split(col("text"), " ")).as("tok"))
      SequencePack(d, idCol = "doc_id", tokCol = "tok",
          grpA = "lang", grpB = "shard", capacity = 128)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("tok")).cast("long").as("total_tok"),
          countDistinct(col("shard") * lit(1000000L) + col("pack_id"))
            .as("n_packs"))
        .select(col("lang"), col("n_docs"), col("total_tok"),
          col("n_packs"),
          expr("n_packs * 128 - total_tok").as("pad_tok"),
          expr("(total_tok * 1000) div (n_packs * 128)").as("fill_pm"))
        .orderBy(col("lang"))
    }),

    // Weight-proportional (importance) Bernoulli sampling with an
    // integer-exact md5 coin: keep a document iff
    // u12 · 2000 < min(n_chars, 2000) · 409, where u12 is the first
    // 12 bits of md5(doc_id) — keep probability ≈ (w/2000) · 10%,
    // linear in the document's weight (its capped length), exactly the
    // quality/length-weighted downsampling step of a training-data
    // mixture. All-integer comparison ⇒ bit-identical in both engines
    // and trivially re-run/subset-stable (the coin is a pure function
    // of the row key, same argument as sample_hash); the filter is a
    // scan-stage predicate, narrow plan, no shuffle before the tiny
    // per-lang rollup.
    "sample_importance" -> ((s, dir) => {
      val u12 = conv(substring(coin(col("doc_id")), 1, 3), 16, 10)
        .cast("long")
      Tables(s, dir, "documents")
        .filter(u12 * 2000 < least(col("n_chars"), lit(2000)) * 409)
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_kept"),
          sum(col("n_chars")).cast("long").as("kept_chars"))
        .orderBy(col("lang"))
    }),

    // Neyman allocation (optimal stratified-sample design: sample
    // size per stratum ∝ N_h·S_h, so variable strata get more budget
    // than uniform ones at equal size — the statistical-survey sibling
    // of sample_temperature's popularity weighting): strata = lang,
    // variability = floor-sqrt of the integer token-count variance
    // (agg_merge_moments' cross-multiplied (n·Σx²−S²) div n² form,
    // products in DECIMAL(38,0); floor(sqrt()) is exact in both
    // engines — the declared isqrt idiom), budget = 10% of the corpus,
    // allocation = budget·N_h·S_h div Σ N_h·S_h vs the proportional
    // baseline. ONE corpus-scale hash agg; every window rides the
    // ≤|langs| stratum frame. Zero-variance strata weight 0
    // (declared — a constant stratum needs 1 row, rounding keeps 0).
    "sample_neyman" -> ((s, dir) => {
      val w = Window.partitionBy(lit(1))
      Tables(s, dir, "documents")
        .select(col("lang"),
          size(split(col("text"), " ")).cast("long").as("x"))
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("x")).as("sx"),
          sum(expr("CAST(x AS DECIMAL(38,0)) * x")).as("sxx"))
        .withColumn("var_floor", expr(
          "CAST((CAST(n_docs AS DECIMAL(38,0)) * sxx - " +
            "CAST(sx AS DECIMAL(38,0)) * sx) div " +
            "(CAST(n_docs AS DECIMAL(38,0)) * n_docs) AS BIGINT)"))
        .withColumn("sd_floor",
          floor(sqrt(col("var_floor"))).cast("long"))
        .withColumn("nw", col("n_docs") * col("sd_floor"))
        .withColumn("sum_nw", sum(col("nw")).over(w))
        .withColumn("total_docs", sum(col("n_docs")).over(w))
        .withColumn("budget", expr("total_docs div 10"))
        .select(col("lang"), col("n_docs"), col("sd_floor"),
          expr("CASE WHEN sum_nw = 0 THEN 0 ELSE " +
            "CAST((CAST(budget AS DECIMAL(38,0)) * nw) div sum_nw " +
            "AS BIGINT) END").as("alloc_docs"),
          expr("CAST((CAST(budget AS DECIMAL(38,0)) * n_docs) " +
            "div total_docs AS BIGINT)").as("proportional_docs"))
        .orderBy(col("lang"))
    }),

    // Temperature-scaled mixture reweighting (T=2): per-source target
    // share ∝ sqrt(n_docs) — the standard up-weighting of small
    // domains in training mixtures. Integer isqrt keeps it exact:
    // sqrt is IEEE-correctly-rounded in both engines, floor makes it
    // an integer, and everything downstream is integer arithmetic.
    // The per-source count table is tiny (one row per domain), so the
    // global-sum window over it is free even at 100 TB of input.
    "sample_temperature" -> ((s, dir) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(lit(1))
      Tables(s, dir, "documents")
        .groupBy(col("source")).agg(count(lit(1)).as("n_docs"))
        .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
        .withColumn("sum_w", sum(col("weight")).over(w))
        .withColumn("total_docs", sum(col("n_docs")).over(w))
        .withColumn("target_permille", expr("weight * 1000 div sum_w"))
        .withColumn("natural_permille",
          expr("n_docs * 1000 div total_docs"))
        .withColumn("boosted",
          col("target_permille") > col("natural_permille"))
        .select(col("source"), col("n_docs"), col("weight"),
          col("target_permille"), col("natural_permille"), col("boosted"))
        .orderBy(col("source"))
    }),

    // Class-balanced EXACT-k downsampling: every language keeps
    // exactly min-class-size docs, selected by the deterministic
    // md5 shuffle order (seeded coin + doc_id tiebreak — re-run- and
    // engine-stable, unlike rand()). Shape: one tiny count agg
    // (map-side combined, broadcast back) + one per-lang window
    // rank. Scale note: per-group exact-k selection inherently sorts
    // within each class partition; with ~dozens of langs that is the
    // acceptable skew bound, and when k is huge the FRACTION variant
    // (sample_stratified's coin threshold) is the declared fallback —
    // same coin, binomial instead of exact counts.
    "sample_balanced" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      // min class size carried per-lang so the probe joins by HASH on
      // lang (broadcast), not a nested-loop against a 1-row frame
      val minPerLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .withColumn("min_n",
          min(col("n")).over(Window.partitionBy(lit(1))))
        .select(col("lang"), col("min_n"))
      val w = Window.partitionBy(col("lang"))
        .orderBy(md5(concat(lit("bal:"), col("doc_id").cast("string"))),
          col("doc_id"))
      // null-safe key match: a NULL-lang class still ranks, counts
      // toward min_n and keeps its quota — the oracle's cross join
      // never drops it, so an equi-join (NULL never matches) would
      // silently diverge on corpora with unlabeled docs
      val mp = minPerLang.withColumnRenamed("lang", "lang_m")
      d.select(col("doc_id"), col("lang"))
        .withColumn("rn", row_number().over(w))
        .join(broadcast(mp), col("lang") <=> col("lang_m"))
        .filter(col("rn") <= col("min_n"))
        .select(col("doc_id"), col("lang"), col("rn"))
        .orderBy(col("doc_id"))
    }),

    // Sharded class-balanced downsampling — sample_balanced's giant-k
    // scale path: the per-class rank runs within (lang, md5-shard16),
    // not one window per lang, so no single partition ever holds a
    // whole class (the en class of a 100 TB corpus is billions of
    // rows; a per-lang row_number serializes them through one task —
    // sharding bounds every window partition at class/16 and the 16
    // ranks run in parallel). The price is quota granularity: each
    // shard keeps ceil(min_n/16), so a class keeps UP TO 16·ceil/16
    // (shards smaller than the quota under-fill, never over) instead
    // of exactly min_n — the declared trade vs the exact-k variant.
    "sample_balanced_shard" -> ((s, dir) => {
      val d = Tables(s, dir, "documents")
      val quotaPerLang = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .withColumn("min_n",
          min(col("n")).over(Window.partitionBy(lit(1))))
        .select(col("lang").as("lang_m"),
          expr("(min_n + 15) div 16").as("quota"))
      val w = Window.partitionBy(col("lang"), col("shard"))
        .orderBy(md5(concat(lit("balsh:"), col("doc_id").cast("string"))),
          col("doc_id"))
      d.select(col("doc_id"), col("lang"))
        .withColumn("shard",
          conv(substring(coin(col("doc_id")), 1, 6), 16, 10).cast("long")
            % 16)
        .withColumn("rn", row_number().over(w))
        .join(broadcast(quotaPerLang), col("lang") <=> col("lang_m"))
        .filter(col("rn") <= col("quota"))
        .select(col("doc_id"), col("lang"), col("shard"), col("rn"))
        .orderBy(col("doc_id"))
    }),

    // Epoch-aware mixture scheduling (the data-constrained regime of
    // Muennighoff et al. 2023, arXiv:2305.16264): given isqrt-
    // temperature weights and a fixed token budget, each source gets
    // target tokens ∝ weight; a source smaller than its target is
    // REPEATED (epochs = ceil(target / available), capped at 4 — the
    // diminishing-returns cliff), and allocated = min(target,
    // epochs·available) exposes the shortfall the cap leaves. All
    // integer arithmetic over the tiny per-source domain — one
    // two-phase agg + window total, engine-exact.
    // Greedy mixture optimization under a token budget — the
    // data-mixing decision corpus assembly runs before sampling
    // weights exist: rank sources by lexical-diversity quality
    // (distinct words per 1000 tokens, integer), take whole sources
    // in rank order while they fit the budget (half the corpus),
    // give the marginal source the fractional weight that exactly
    // exhausts it, zero after. Every quantity is integer (permille
    // weights via div); the per-source frame is bounded by the
    // source vocabulary, so the rank/cumsum windows are tiny and the
    // 1-row total broadcasts (allowlisted scalar-gate shape). ONE
    // corpus-scale (source, word) agg at any size.
    // Doc-level quality-budget selection (the greedy curation pass
    // that fills each source's token budget with its BEST documents
    // — sample_mixture_budget allocates budget ACROSS sources, this
    // spends it WITHIN one; together they are the two halves of a
    // data-mixture build): docs rank by diversity score inside their
    // source, a per-source prefix token sum admits docs while the
    // running total fits budget = source_tokens div 3 (scale-free —
    // selects the top-scoring ~third at every corpus size). ONE
    // source-keyed window pass (rank + prefix sum + partition total
    // ride the same exchange), then a ≤|sources|-group census. No
    // global sort anywhere.
    "sample_quality_budget" -> ((s, dir) => {
      val w = Window.partitionBy(col("source"))
        .orderBy(col("score").desc, col("doc_id"))
      val d = Tables(s, dir, "documents")
        .withColumn("arr", split(col("text"), " "))
        .withColumn("n_toks", size(col("arr")).cast("long"))
        .withColumn("score",
          expr("CAST(size(array_distinct(arr)) * 1000 DIV size(arr) " +
            "AS BIGINT)"))
        .withColumn("cum_before", coalesce(
          sum(col("n_toks")).over(w.rowsBetween(Long.MinValue, -1)),
          lit(0L)))
        .withColumn("tok_total", sum(col("n_toks")).over(
          Window.partitionBy(col("source"))))
        .withColumn("budget", expr("tok_total div 3"))
        .withColumn("sel",
          col("cum_before") + col("n_toks") <= col("budget"))
      d.groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("sel"), 1L).otherwise(0L)).as("n_selected"),
          max(col("tok_total")).as("tok_total"),
          max(col("budget")).as("budget"),
          sum(when(col("sel"), col("n_toks")).otherwise(0L))
            .as("tok_selected"))
        .select(col("source"), col("n_docs"), col("n_selected"),
          col("tok_total"), col("tok_selected"),
          expr("(tok_selected * 1000) div budget").as("util_pm"))
        .orderBy(col("source"))
    }),

    "sample_mixture_budget" -> ((s, dir) => {
      val tok = Tables(s, dir, "documents")
        .select(col("source"), explode(split(col("text"), " ")).as("w"))
        .filter(col("w") =!= "")
      val per = tok.groupBy(col("source"))
        .agg(count(lit(1)).as("tokens"),
          countDistinct(col("w")).as("n_distinct"))
        .withColumn("quality_milli",
          expr("n_distinct * 1000 div tokens"))
      val tot = per.agg(sum(col("tokens")).as("total_tokens"))
      val w = Window.orderBy(col("quality_milli").desc, col("source"))
      per.crossJoin(broadcast(tot))
        .withColumn("rank", row_number().over(w).cast("long"))
        .withColumn("cum_before",
          coalesce(sum(col("tokens")).over(
            w.rowsBetween(Long.MinValue, -1)), lit(0L)))
        .withColumn("budget", expr("total_tokens div 2"))
        .withColumn("weight_permille", expr(
          "CAST(CASE WHEN cum_before + tokens <= budget THEN 1000 " +
            "WHEN cum_before >= budget THEN 0 " +
            "ELSE (budget - cum_before) * 1000 div tokens END AS BIGINT)"))
        .select(col("rank"), col("source"), col("tokens"),
          col("quality_milli"), col("weight_permille"))
        .orderBy(col("rank"))
    }),

    // GROUP-aware k-fold (sample_kfold folds documents; this folds
    // USERS — the leakage-safe CV for user-level models, where any
    // row-level fold puts one user's events on both sides): the fold
    // is the md5 coin of the USER id computed per event row, so
    // every event of a user lands in the same fold BY CONSTRUCTION —
    // no user table, no join, narrow-only until the per-fold balance
    // agg. Report: per-fold user/event/spend balance (the check that
    // hash-folding didn't skew the covariates).
    "sample_group_kfold" -> ((s, dir) => {
      Tables(s, dir, "events")
        .withColumn("fold", expr(
          "CAST(conv(substring(md5(concat('gcv', CAST(user_id AS " +
            "STRING))), 1, 2), 16, 10) AS BIGINT) % 5"))
        .groupBy(col("fold"))
        .agg(countDistinct(col("user_id")).as("n_users"),
          count(lit(1)).as("n_events"),
          sum(expr("CAST(round(value * 100) AS BIGINT)")).as("spend_cents"))
        .orderBy(col("fold"))
    }),

    // TIME-based train/test split + leakage audit (sample_split is
    // the random sibling; temporal models must split on time or they
    // train on the future): cutoff = the 80th-percentile event day
    // (percentile_disc — an actual observed day, broadcast 1-row),
    // train = days ≤ cutoff. The audit row counts users appearing in
    // BOTH splits — for user-level models that overlap IS the
    // leakage a random split silently accepts and a time split makes
    // visible. One scan + two hash aggs; the cutoff is allowlisted
    // scalar-gate broadcast.
    "sample_time_split" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(col("user_id"), col("event_id"),
          expr("CAST(ts AS DATE)").as("day"),
          expr("unix_date(CAST(ts AS DATE))").as("dayn"))
      // Spark's percentile_disc rejects DATE — rank over days-since-
      // epoch (the ts_seasonal_strength dow token), same observed-day
      // cutoff in both engines
      val cut = e.agg(expr(
        "percentile_disc(0.8) WITHIN GROUP (ORDER BY dayn)").as("cutoff"))
      val tagged = e.crossJoin(broadcast(cut))
        .withColumn("split",
          when(col("dayn") <= col("cutoff"), "train").otherwise("test"))
      val splits = tagged.groupBy(col("split"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("user_id")).as("n_users"),
          min(col("day")).as("min_day"), max(col("day")).as("max_day"))
      val leak = tagged.groupBy(col("user_id"))
        .agg(countDistinct(col("split")).as("ns"))
        .filter(col("ns") === 2)
        .agg(count(lit(1)).as("n_users"))
        .select(lit("leak_users_in_both").as("split"),
          lit(null).cast("long").as("n_events"), col("n_users"),
          lit(null).cast("date").as("min_day"),
          lit(null).cast("date").as("max_day"))
      splits.unionByName(leak).orderBy(col("split"))
    }),

    // Rolling-origin (expanding-window) cross-validation — the
    // time-series CV scheme that never trains on the future
    // (sample_time_split is its single-fold form; classic k-fold
    // leaks): fold i trains on days ≤ the 40/60/80th observed-day
    // percentile and tests on the NEXT percentile band, so every
    // fold's test horizon starts strictly after its training end by
    // construction. Cuts via percentile_disc (engine-identical on
    // observed days); ALL fold counts come from ONE conditional
    // aggregate over one scan — never a per-fold pass — unpivoted to
    // rows by stack. The 1-row cut frame rides a broadcast cross
    // (the allowlisted scalar-gate pattern).
    // PURGED k-fold CV with an embargo (the leakage-safe
    // cross-validation for serially-correlated data — de Prado's
    // purged CV: rows within the embargo of a validation fold's TIME
    // boundaries are dropped from training entirely, because
    // adjacent-in-time rows leak label information a random k-fold
    // ignores; sample_kfold is the iid sibling, sample_rolling_origin
    // the strictly-causal one): folds are equal TIME slices from the
    // broadcast (min, max) span — fold, boundaries, and embargo
    // membership are pure row-local arithmetic (fold = x·k div span,
    // boundary lo_f = ceil(f·span/k), head/tail = within E of a
    // boundary), so the fact scan is ONE pass with no global sort or
    // rank; the fold census (≤k rows) then derives each fold's
    // n_purged = tail(f−1) + head(f+1) with lag/lead on that bounded
    // frame (declared partition-less-window contract). E = 86400 s.
    "sample_purged_kfold" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val k = 5
      val E = 86400L
      val es = Tables(s, dir, "events")
        .select(unix_timestamp(col("ts")).as("es"))
      val b = es.agg(min(col("es")).as("e0"), max(col("es")).as("e1"))
      val census = es.crossJoin(broadcast(b))
        .withColumn("span", col("e1") - col("e0") + 1)
        .withColumn("x", col("es") - col("e0"))
        .withColumn("fold", expr(s"(x * $k) div span"))
        .withColumn("lo", expr(s"(fold * span + ${k - 1}) div $k"))
        .withColumn("hi", expr(s"((fold + 1) * span + ${k - 1}) div $k"))
        .groupBy(col("fold"))
        .agg(count(lit(1)).as("n_val"),
          sum(when(col("x") - col("lo") < E, 1L).otherwise(0L))
            .as("n_head"),
          sum(when(col("hi") - col("x") <= E, 1L).otherwise(0L))
            .as("n_tail"))
      val w = Window.orderBy(col("fold"))
      census
        .withColumn("n_purged",
          coalesce(lag(col("n_tail"), 1).over(w), lit(0L)) +
            coalesce(lead(col("n_head"), 1).over(w), lit(0L)))
        .withColumn("total",
          sum(col("n_val")).over(Window.partitionBy()))
        .select(col("fold").cast("int").as("fold"), col("n_val"),
          col("n_purged"),
          (col("total") - col("n_val") - col("n_purged")).as("n_train"))
        .orderBy(col("fold"))
    }),

    "sample_rolling_origin" -> ((s, dir) => {
      val e = Tables(s, dir, "events")
        .select(expr("unix_date(CAST(ts AS DATE))").as("dayn"))
      // percentile_disc returns DOUBLE; its value is an OBSERVED day
      // (discrete percentile), so the INT cast is exact
      val cuts = e.agg(
        expr("CAST(percentile_disc(0.4) WITHIN GROUP (ORDER BY dayn) " +
          "AS INT)").as("c1"),
        expr("CAST(percentile_disc(0.6) WITHIN GROUP (ORDER BY dayn) " +
          "AS INT)").as("c2"),
        expr("CAST(percentile_disc(0.8) WITHIN GROUP (ORDER BY dayn) " +
          "AS INT)").as("c3"),
        max(col("dayn")).as("c4"))
      val aggCols = (1 to 3).flatMap { i =>
        Seq(
          sum(when(col("dayn") <= col(s"c$i"), 1L).otherwise(0L))
            .as(s"tr$i"),
          sum(when(col("dayn") > col(s"c$i") &&
            col("dayn") <= col(s"c${i + 1}"), 1L).otherwise(0L))
            .as(s"te$i"))
      } ++ (1 to 4).map(i => max(col(s"c$i")).as(s"d$i"))
      e.crossJoin(broadcast(cuts))
        .agg(aggCols.head, aggCols.tail: _*)
        .selectExpr("stack(3, " +
          "1, tr1, te1, d1, d2, " +
          "2, tr2, te2, d2, d3, " +
          "3, tr3, te3, d3, d4) AS " +
          "(fold, n_train, n_test, train_end_dayn, test_end_dayn)")
        .selectExpr("CAST(fold AS INT) AS fold",
          "CAST(n_train AS BIGINT) AS n_train",
          "CAST(n_test AS BIGINT) AS n_test",
          "CAST(train_end_dayn AS BIGINT) AS train_end_dayn",
          "CAST(test_end_dayn AS BIGINT) AS test_end_dayn")
        .orderBy(col("fold"))
    }),

    "sample_mix_epochs" -> ((s, dir) => {
      val budget = 100000L
      val w = Window.partitionBy(lit(1))
      Tables(s, dir, "documents")
        .withColumn("n_tok", size(split(col("text"), " ")))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("n_tokens"))
        .withColumn("weight", floor(sqrt(col("n_docs"))).cast("long"))
        .withColumn("sum_w", sum(col("weight")).over(w))
        .withColumn("target_tokens",
          expr(s"$budget * weight div sum_w"))
        .withColumn("epochs",
          least(lit(4L), expr(
            "(target_tokens + n_tokens - 1) div n_tokens")))
        .withColumn("allocated_tokens",
          least(col("target_tokens"), col("epochs") * col("n_tokens")))
        .select(col("source"), col("n_docs"), col("n_tokens"),
          col("target_tokens"), col("epochs"), col("allocated_tokens"))
        .orderBy(col("source"))
    }),

    // The full curation funnel in ONE declarative plan — quality gate
    // → corpus-wide exact dedup → benchmark decontamination →
    // deterministic hash sample → per-lang corpus stats. Every stage
    // is a shape proven individually above (integer quality rules,
    // digest-shuffle dedup window, broadcast benchmark probe, md5
    // coin); composing them keeps Catalyst free to pipeline the narrow
    // stages into the scans, so at 100 TB the funnel costs its two
    // real shuffles (dedup window, final agg), not five passes.
    "composite_curate" -> ((s, dir) => {
      val gram4 = Grams.spark(4)
      val d = Tables(s, dir, "documents")
        .withColumn("toks", split(col("text"), " "))
        .withColumn("n_tok", size(col("toks")))
      // quality: >=20 tokens, avg word length (spaces excluded) in [3,10]
      val quality = d.filter(col("n_tok") >= 20 &&
        (col("n_chars") - col("n_tok") + 1) >= col("n_tok") * 3 &&
        (col("n_chars") - col("n_tok") + 1) <= col("n_tok") * 10)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(md5(lower(trim(col("text"))))).orderBy(col("doc_id"))
      val exact = quality.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1 && col("doc_id") % 50 =!= 0)
      val benchGrams = d.filter(col("doc_id") % 50 === 0)
        .select(explode(array_distinct(expr(gram4))).as("gram")).distinct()
      val contaminated = exact
        .select(col("doc_id"), explode(array_distinct(expr(gram4))).as("gram"))
        .join(broadcast(benchGrams), "gram")
        .select(col("doc_id")).distinct()
      exact.join(contaminated, Seq("doc_id"), "left_anti")
        .filter(substring(coin(col("doc_id")), 1, 4) < "8000")
        .groupBy(col("lang"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tok").cast("long")).as("n_tokens"))
        .orderBy(col("lang"))
    }),

    // Inverse-frequency class weights (the balanced-reweighting dual
    // of sample_balanced's down-sampling): weight_ppm = N·10⁶ div
    // (|classes|·n_class) — a uniform corpus weighs 10⁶ everywhere,
    // rare classes weigh up, capped at 10× (declared) so a tail class
    // cannot dominate the loss. One bounded lang hash agg; the
    // total/class-count windows run over the |langs|-row frame, never
    // the corpus; products ride DECIMAL(38,0)/HUGEINT.
    "sample_class_weight" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      Tables(s, dir, "documents")
        .groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
        .withColumn("n_total",
          sum(col("n_docs")).over(Window.partitionBy()))
        .withColumn("n_langs",
          count(lit(1)).over(Window.partitionBy()))
        .select(col("lang"), col("n_docs"),
          expr("CAST((CAST(n_total AS DECIMAL(38,0)) * 1000000) " +
            "div (n_langs * n_docs) AS BIGINT)").as("weight_ppm"))
        .withColumn("weight_capped_ppm",
          least(col("weight_ppm"), lit(10000000L)))
        .orderBy(col("lang"))
    }),

    // Next-token-prediction context windows (the pretraining
    // example-extraction pass): size-8 stride-4 sliding windows over
    // each document's tokens, capped at the first 10 windows per doc
    // (declared cap — bounds output at 10·|docs| rows at any corpus
    // size), each window fingerprinted by an md5-prefix (the md5-coin
    // doctrine — lexicographic = numeric, engine-identical).
    // Scan-proportional: one projection + one bounded explode, no
    // shuffle before the output sort.
    "sample_context_windows" -> ((s, dir) => {
      Tables(s, dir, "documents")
        .select(col("doc_id"), split(col("text"), " ").as("toks"))
        .withColumn("n_toks", size(col("toks")).cast("long"))
        .filter(col("n_toks") >= 8)
        .withColumn("nw",
          least(expr("(n_toks - 8) div 4 + 1"), lit(10L)))
        .select(col("doc_id"), col("toks"),
          explode(expr("sequence(0L, nw - 1)")).as("widx"))
        .withColumn("start_tok", col("widx") * 4 + 1)
        .withColumn("win", expr(
          "array_join(slice(toks, CAST(start_tok AS INT), 8), ' ')"))
        .select(col("doc_id"), col("widx"), col("start_tok"),
          expr("CAST(conv(substring(md5(win), 1, 8), 16, 10) " +
            "AS BIGINT)").as("win_fp"))
        .orderBy(col("doc_id"), col("widx"))
    })
  )

  def oracle: Map[String, String] = Map(
    "sample_neyman" ->
      """WITH d AS (
        |  SELECT lang,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS x
        |  FROM documents),
        |st AS (
        |  SELECT lang, count(*) AS n_docs,
        |    CAST(sum(x) AS HUGEINT) AS sx,
        |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
        |  FROM d GROUP BY lang),
        |v AS (
        |  SELECT lang, n_docs,
        |    CAST(floor(sqrt(CAST((n_docs * sxx - sx * sx) //
        |      (CAST(n_docs AS HUGEINT) * n_docs) AS BIGINT)))
        |      AS BIGINT) AS sd_floor
        |  FROM st),
        |t AS (
        |  SELECT lang, n_docs, sd_floor, n_docs * sd_floor AS nw,
        |    CAST(sum(n_docs * sd_floor) OVER () AS HUGEINT) AS sum_nw,
        |    CAST(sum(n_docs) OVER () AS BIGINT) AS total_docs
        |  FROM v)
        |SELECT lang, n_docs, sd_floor,
        |  CASE WHEN sum_nw = 0 THEN 0
        |    ELSE CAST((CAST(total_docs // 10 AS HUGEINT) * nw)
        |      // sum_nw AS BIGINT) END AS alloc_docs,
        |  CAST((CAST(total_docs // 10 AS HUGEINT) * n_docs)
        |    // total_docs AS BIGINT) AS proportional_docs
        |FROM t ORDER BY lang""".stripMargin,

    "sample_negatives" ->
      """WITH b AS (
        |  SELECT vec_id, label,
        |    CAST('0x' || substring(md5(CAST(vec_id AS VARCHAR)), 1, 6)
        |      AS BIGINT) % 64 AS bucket,
        |    md5('neg:' || CAST(vec_id AS VARCHAR)) AS coin
        |  FROM embeddings),
        |r AS (
        |  SELECT vec_id, label, bucket,
        |    row_number() OVER
        |      (PARTITION BY bucket ORDER BY coin, vec_id) AS r,
        |    count(*) OVER (PARTITION BY bucket) AS m
        |  FROM b),
        |f AS (SELECT * FROM r WHERE m >= 3)
        |SELECT a.vec_id,
        |  n1.vec_id AS neg1, n2.vec_id AS neg2,
        |  CAST((CASE WHEN a.label = n1.label THEN 1 ELSE 0 END) +
        |    (CASE WHEN a.label = n2.label THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_label_collisions
        |FROM f a
        |JOIN f n1 ON a.bucket = n1.bucket AND (a.r % a.m) + 1 = n1.r
        |JOIN f n2 ON a.bucket = n2.bucket
        |  AND ((a.r + 1) % a.m) + 1 = n2.r
        |ORDER BY a.vec_id""".stripMargin,

    "sample_curriculum" ->
      """WITH d AS (
        |  SELECT doc_id, n_chars,
        |    len(string_split(text, ' ')) AS n_toks
        |  FROM documents),
        |s0 AS (
        |  SELECT doc_id,
        |    CAST((n_chars * 100) // n_toks AS BIGINT) AS score
        |  FROM d),
        |s AS (SELECT * FROM s0 WHERE score IS NOT NULL),
        |c AS (SELECT score, count(*) AS n FROM s GROUP BY score),
        |cc AS (
        |  SELECT score, sum(n) OVER (ORDER BY score) AS cum,
        |    sum(n) OVER () AS total
        |  FROM c),
        |cuts AS (SELECT
        |  min(CASE WHEN cum * 4 >= total * 1 THEN score END) AS c1,
        |  min(CASE WHEN cum * 4 >= total * 2 THEN score END) AS c2,
        |  min(CASE WHEN cum * 4 >= total * 3 THEN score END) AS c3
        |  FROM cc),
        |bk AS (
        |  SELECT doc_id, score,
        |    CAST(1 + (CASE WHEN score > c1 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score > c2 THEN 1 ELSE 0 END)
        |      + (CASE WHEN score > c3 THEN 1 ELSE 0 END) AS BIGINT)
        |      AS bucket,
        |    md5('cur:' || CAST(doc_id AS VARCHAR)) AS coin
        |  FROM s, cuts),
        |rk AS (
        |  SELECT bucket, doc_id, score,
        |    CAST(row_number() OVER
        |      (PARTITION BY bucket ORDER BY coin, doc_id) AS BIGINT)
        |      AS rn
        |  FROM bk)
        |SELECT bucket, rn, doc_id, score
        |FROM rk WHERE rn <= 25 ORDER BY bucket, rn""".stripMargin,

    "sample_group_kfold" ->
      """SELECT CAST('0x' || substring(md5('gcv' ||
        |    CAST(user_id AS VARCHAR)), 1, 2) AS BIGINT) % 5 AS fold,
        |  count(DISTINCT user_id) AS n_users, count(*) AS n_events,
        |  CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
        |    AS spend_cents
        |FROM events GROUP BY fold
        |ORDER BY fold""".stripMargin,

    "sample_quality_budget" ->
      """WITH d AS (
        |  SELECT source, doc_id,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks,
        |    CAST(len(list_distinct(string_split(text, ' '))) * 1000
        |      // len(string_split(text, ' ')) AS BIGINT) AS score
        |  FROM documents),
        |r AS (
        |  SELECT source, n_toks,
        |    coalesce(sum(n_toks) OVER (PARTITION BY source
        |      ORDER BY score DESC, doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |      AS cum_before,
        |    sum(n_toks) OVER (PARTITION BY source) AS tok_total
        |  FROM d),
        |x AS (
        |  SELECT source, n_toks, tok_total, tok_total // 3 AS budget,
        |    CASE WHEN cum_before + n_toks <= tok_total // 3
        |      THEN 1 ELSE 0 END AS sel
        |  FROM r),
        |g AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(sel) AS BIGINT) AS n_selected,
        |    CAST(max(tok_total) AS BIGINT) AS tok_total,
        |    CAST(max(budget) AS BIGINT) AS budget,
        |    CAST(sum(CASE WHEN sel = 1 THEN n_toks ELSE 0 END)
        |      AS BIGINT) AS tok_selected
        |  FROM x GROUP BY source)
        |SELECT source, n_docs, n_selected, tok_total, tok_selected,
        |  CAST((tok_selected * 1000) // budget AS BIGINT) AS util_pm
        |FROM g ORDER BY source""".stripMargin,

    "sample_purged_kfold" ->
      """WITH e AS (
        |  SELECT CAST(floor(epoch(ts)) AS BIGINT) AS es FROM events),
        |b AS (SELECT min(es) AS e0, max(es) AS e1 FROM e),
        |p AS (
        |  SELECT es - e0 AS x, e1 - e0 + 1 AS span
        |  FROM e CROSS JOIN b),
        |f AS (
        |  SELECT x, span, (x * 5) // span AS fold FROM p),
        |g AS (
        |  SELECT fold, x,
        |    (fold * span + 4) // 5 AS lo,
        |    ((fold + 1) * span + 4) // 5 AS hi
        |  FROM f),
        |census AS (
        |  SELECT fold, count(*) AS n_val,
        |    CAST(sum(CASE WHEN x - lo < 86400 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_head,
        |    CAST(sum(CASE WHEN hi - x <= 86400 THEN 1 ELSE 0 END)
        |      AS BIGINT) AS n_tail
        |  FROM g GROUP BY fold),
        |d AS (
        |  SELECT fold, n_val,
        |    coalesce(lag(n_tail, 1) OVER (ORDER BY fold), 0) +
        |    coalesce(lead(n_head, 1) OVER (ORDER BY fold), 0)
        |      AS n_purged,
        |    sum(n_val) OVER () AS total
        |  FROM census)
        |SELECT CAST(fold AS INT) AS fold, CAST(n_val AS BIGINT) AS n_val,
        |  CAST(n_purged AS BIGINT) AS n_purged,
        |  CAST(total - n_val - n_purged AS BIGINT) AS n_train
        |FROM d ORDER BY fold""".stripMargin,

    "sample_rolling_origin" ->
      """WITH e AS (
        |  SELECT datediff('day', DATE '1970-01-01', CAST(ts AS DATE))
        |    AS dayn
        |  FROM events),
        |cut AS (
        |  SELECT quantile_disc(dayn, 0.4) AS c1,
        |    quantile_disc(dayn, 0.6) AS c2,
        |    quantile_disc(dayn, 0.8) AS c3, max(dayn) AS c4 FROM e),
        |a AS (
        |  SELECT
        |    sum(CASE WHEN dayn <= c1 THEN 1 ELSE 0 END) AS tr1,
        |    sum(CASE WHEN dayn > c1 AND dayn <= c2 THEN 1 ELSE 0 END)
        |      AS te1,
        |    sum(CASE WHEN dayn <= c2 THEN 1 ELSE 0 END) AS tr2,
        |    sum(CASE WHEN dayn > c2 AND dayn <= c3 THEN 1 ELSE 0 END)
        |      AS te2,
        |    sum(CASE WHEN dayn <= c3 THEN 1 ELSE 0 END) AS tr3,
        |    sum(CASE WHEN dayn > c3 AND dayn <= c4 THEN 1 ELSE 0 END)
        |      AS te3,
        |    min(c1) AS d1, min(c2) AS d2, min(c3) AS d3, min(c4) AS d4
        |  FROM e CROSS JOIN cut)
        |SELECT CAST(fold AS INT) AS fold,
        |  CAST(n_train AS BIGINT) AS n_train,
        |  CAST(n_test AS BIGINT) AS n_test,
        |  CAST(train_end_dayn AS BIGINT) AS train_end_dayn,
        |  CAST(test_end_dayn AS BIGINT) AS test_end_dayn
        |FROM (
        |  SELECT 1 AS fold, tr1 AS n_train, te1 AS n_test,
        |    d1 AS train_end_dayn, d2 AS test_end_dayn FROM a
        |  UNION ALL
        |  SELECT 2, tr2, te2, d2, d3 FROM a
        |  UNION ALL
        |  SELECT 3, tr3, te3, d3, d4 FROM a)
        |ORDER BY fold""".stripMargin,

    "sample_time_split" ->
      """WITH e AS (
        |  SELECT user_id, event_id, CAST(ts AS DATE) AS day,
        |    datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS dayn
        |  FROM events),
        |cut AS (
        |  SELECT quantile_disc(dayn, 0.8) AS cutoff FROM e),
        |tagged AS (
        |  SELECT user_id, event_id, day,
        |    CASE WHEN dayn <= cutoff THEN 'train' ELSE 'test' END AS split
        |  FROM e CROSS JOIN cut),
        |splits AS (
        |  SELECT split, count(*) AS n_events,
        |    count(DISTINCT user_id) AS n_users,
        |    min(day) AS min_day, max(day) AS max_day
        |  FROM tagged GROUP BY split),
        |leak AS (
        |  SELECT 'leak_users_in_both' AS split,
        |    CAST(NULL AS BIGINT) AS n_events,
        |    count(*) AS n_users,
        |    CAST(NULL AS DATE) AS min_day, CAST(NULL AS DATE) AS max_day
        |  FROM (SELECT user_id FROM tagged
        |        GROUP BY user_id HAVING count(DISTINCT split) = 2) u)
        |SELECT split, n_events, n_users, min_day, max_day FROM splits
        |UNION ALL
        |SELECT split, n_events, n_users, min_day, max_day FROM leak
        |ORDER BY split""".stripMargin,

    "sample_mixture_budget" ->
      """WITH tok AS (
        |  SELECT source, unnest(string_split(text, ' ')) AS w
        |  FROM documents),
        |t2 AS (SELECT * FROM tok WHERE w <> ''),
        |per AS (
        |  SELECT source, count(*) AS tokens,
        |    count(DISTINCT w) AS n_distinct
        |  FROM t2 GROUP BY source),
        |q AS (
        |  SELECT source, tokens,
        |    n_distinct * 1000 // tokens AS quality_milli
        |  FROM per),
        |tot AS (SELECT CAST(sum(tokens) AS BIGINT) AS total_tokens
        |        FROM q),
        |r AS (
        |  SELECT q.*, total_tokens,
        |    row_number() OVER w AS rank,
        |    coalesce(CAST(sum(tokens) OVER (ORDER BY quality_milli DESC,
        |      source ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
        |      AS BIGINT), 0) AS cum_before
        |  FROM q CROSS JOIN tot
        |  WINDOW w AS (ORDER BY quality_milli DESC, source))
        |SELECT CAST(rank AS BIGINT) AS rank, source,
        |  CAST(tokens AS BIGINT) AS tokens,
        |  CAST(quality_milli AS BIGINT) AS quality_milli,
        |  CAST(CASE WHEN cum_before + tokens <= total_tokens // 2
        |         THEN 1000
        |       WHEN cum_before >= total_tokens // 2 THEN 0
        |       ELSE (total_tokens // 2 - cum_before) * 1000 // tokens
        |       END AS BIGINT) AS weight_permille
        |FROM r
        |ORDER BY rank""".stripMargin,

    "sample_class_weight" ->
      """WITH lc AS (
        |  SELECT lang, count(*) AS n_docs FROM documents GROUP BY lang),
        |w AS (
        |  SELECT lang, n_docs,
        |    sum(n_docs) OVER () AS n_total,
        |    count(*) OVER () AS n_langs
        |  FROM lc),
        |o AS (
        |  SELECT lang, n_docs,
        |    CAST((CAST(n_total AS HUGEINT) * 1000000)
        |      // (n_langs * n_docs) AS BIGINT) AS weight_ppm
        |  FROM w)
        |SELECT lang, n_docs, weight_ppm,
        |  least(weight_ppm, 10000000) AS weight_capped_ppm
        |FROM o ORDER BY lang""".stripMargin,
    "sample_balanced" ->
      """WITH m AS (
        |  SELECT min(n) AS min_n FROM (
        |    SELECT count(*) AS n FROM documents GROUP BY lang)
        |), r AS (
        |  SELECT doc_id, lang, row_number() OVER (
        |    PARTITION BY lang
        |    ORDER BY md5('bal:' || CAST(doc_id AS VARCHAR)), doc_id)
        |    AS rn
        |  FROM documents)
        |SELECT doc_id, lang, CAST(rn AS INT) AS rn
        |FROM r, m WHERE rn <= min_n
        |ORDER BY doc_id""".stripMargin,

    "sample_balanced_shard" ->
      """WITH m AS (
        |  SELECT min(n) AS min_n FROM (
        |    SELECT count(*) AS n FROM documents GROUP BY lang)
        |), r AS (
        |  SELECT doc_id, lang,
        |    CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
        |         AS BIGINT) % 16 AS shard,
        |    row_number() OVER (
        |      PARTITION BY lang,
        |        CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
        |             AS BIGINT) % 16
        |      ORDER BY md5('balsh:' || CAST(doc_id AS VARCHAR)), doc_id)
        |      AS rn
        |  FROM documents)
        |SELECT doc_id, lang, shard, CAST(rn AS INT) AS rn
        |FROM r, m WHERE rn <= (min_n + 15) // 16
        |ORDER BY doc_id""".stripMargin,

    "sample_mix_epochs" ->
      """WITH src AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |  FROM documents GROUP BY source
        |), wtd AS (
        |  SELECT *, CAST(floor(sqrt(n_docs)) AS BIGINT) AS weight,
        |    CAST(sum(CAST(floor(sqrt(n_docs)) AS BIGINT)) OVER ()
        |      AS BIGINT) AS sum_w
        |  FROM src
        |), tgt AS (
        |  SELECT *, 100000 * weight // sum_w AS target_tokens FROM wtd
        |), ep AS (
        |  SELECT *, least(4, (target_tokens + n_tokens - 1) // n_tokens)
        |    AS epochs
        |  FROM tgt)
        |SELECT source, n_docs, n_tokens,
        |  CAST(target_tokens AS BIGINT) AS target_tokens,
        |  CAST(epochs AS BIGINT) AS epochs,
        |  CAST(least(target_tokens, epochs * n_tokens) AS BIGINT)
        |    AS allocated_tokens
        |FROM ep ORDER BY source""".stripMargin,

    "sample_importance" ->
      """SELECT lang, count(*) AS n_kept,
        |  CAST(sum(n_chars) AS BIGINT) AS kept_chars
        |FROM documents
        |WHERE CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 3)
        |        AS BIGINT) * 2000 < least(n_chars, 2000) * 409
        |GROUP BY lang
        |ORDER BY lang""".stripMargin,

    "sample_hash" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
        |FROM lineitem
        |WHERE substr(md5(CAST(l_orderkey AS VARCHAR) || '-' ||
        |             CAST(l_linenumber AS VARCHAR) || '-' ||
        |             CAST(l_partkey AS VARCHAR) || '-' ||
        |             CAST(l_suppkey AS VARCHAR)), 1, 4) < '2000'
        |ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""".stripMargin,

    "sample_stratified" ->
      """SELECT doc_id, lang, source
        |FROM documents
        |WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) <
        |  CASE lang WHEN 'en' THEN '2000' WHEN 'fr' THEN '4000'
        |            WHEN 'es' THEN '8000' WHEN 'zh' THEN '4000'
        |            ELSE '2000' END
        |ORDER BY doc_id""".stripMargin,

    "sample_shard" ->
      """SELECT CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 6))
        |            AS BIGINT) % 16 AS shard,
        |       count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents
        |GROUP BY shard
        |ORDER BY shard""".stripMargin,

    "sample_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn,
        |         1 + (CAST(substr(source, 4) AS INT) % 3) AS weight
        |  FROM documents)
        |SELECT CAST(rn * (6 // weight) AS BIGINT) AS pos, doc_id, source
        |FROM r
        |ORDER BY pos, doc_id
        |LIMIT 200""".stripMargin,

    "sample_shuffle" ->
      """SELECT doc_id,
        |  substr(md5('s42-' || CAST(doc_id AS VARCHAR)), 1, 8) AS shuffle_key
        |FROM documents
        |ORDER BY shuffle_key, doc_id
        |LIMIT 100""".stripMargin,

    "sample_kfold" ->
      """WITH f AS (
        |  SELECT CAST('0x' || substr(md5('cv' || CAST(doc_id AS VARCHAR)),
        |      1, 2) AS BIGINT) % 5 AS fold,
        |    len(string_split(text, ' ')) AS tok
        |  FROM documents),
        |g AS (
        |  SELECT fold, count(*) AS n_test,
        |    CAST(sum(tok) AS BIGINT) AS test_tokens
        |  FROM f GROUP BY fold)
        |SELECT fold, CAST(n_test AS BIGINT) AS n_test,
        |  CAST(sum(n_test) OVER () - n_test AS BIGINT) AS n_train,
        |  test_tokens
        |FROM g ORDER BY fold""".stripMargin,

    "sample_split" ->
      """SELECT CASE WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'e666'
        |            THEN 'train'
        |            WHEN substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < 'f333'
        |            THEN 'val'
        |            ELSE 'test' END AS split,
        |       count(*) AS n_docs,
        |       CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        |FROM documents
        |GROUP BY split
        |ORDER BY split""".stripMargin,

    "llm_token_shards" ->
      """WITH t AS (
        |  SELECT doc_id,
        |    CAST(len(list_filter(string_split(text, ' '),
        |      w -> w <> '')) AS BIGINT) AS n_tok
        |  FROM documents),
        |r AS (
        |  SELECT doc_id, n_tok,
        |    sum(n_tok) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
        |      AS running
        |  FROM t)
        |SELECT CAST((running - 1) // 5000 AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens,
        |  min(doc_id) AS first_doc, max(doc_id) AS last_doc
        |FROM r GROUP BY 1 ORDER BY 1""".stripMargin,

    "sample_pack_eff" ->
      """WITH RECURSIVE base AS (
        |  SELECT lang, doc_id % 4 AS shard, doc_id,
        |         CAST(len(string_split(text, ' ')) AS INT) AS tok,
        |         row_number() OVER (PARTITION BY lang, doc_id % 4
        |                            ORDER BY doc_id) AS rn
        |  FROM documents
        |), walk AS (
        |  SELECT lang, shard, doc_id, tok, rn,
        |         CAST(0 AS BIGINT) AS pack_id, CAST(tok AS BIGINT) AS fill
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.lang, b.shard, b.doc_id, b.tok, b.rn,
        |         CASE WHEN w.fill + b.tok > 128 THEN w.pack_id + 1
        |              ELSE w.pack_id END,
        |         CASE WHEN w.fill + b.tok > 128 THEN CAST(b.tok AS BIGINT)
        |              ELSE w.fill + b.tok END
        |  FROM walk w JOIN base b
        |    ON b.lang = w.lang AND b.shard = w.shard AND b.rn = w.rn + 1
        |)
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(tok) AS BIGINT) AS total_tok,
        |  CAST(count(DISTINCT shard * 1000000 + pack_id) AS BIGINT)
        |    AS n_packs,
        |  CAST(count(DISTINCT shard * 1000000 + pack_id) * 128
        |    - sum(tok) AS BIGINT) AS pad_tok,
        |  CAST((CAST(sum(tok) AS HUGEINT) * 1000) //
        |    (count(DISTINCT shard * 1000000 + pack_id) * 128)
        |    AS BIGINT) AS fill_pm
        |FROM walk GROUP BY lang ORDER BY lang""".stripMargin,

    "sample_pack" ->
      """WITH RECURSIVE base AS (
        |  SELECT lang, doc_id % 4 AS shard, doc_id,
        |         CAST(len(string_split(text, ' ')) AS INT) AS tok,
        |         row_number() OVER (PARTITION BY lang, doc_id % 4
        |                            ORDER BY doc_id) AS rn
        |  FROM documents
        |), walk AS (
        |  SELECT lang, shard, doc_id, tok, rn,
        |         CAST(0 AS BIGINT) AS pack_id, CAST(tok AS BIGINT) AS fill
        |  FROM base WHERE rn = 1
        |  UNION ALL
        |  SELECT b.lang, b.shard, b.doc_id, b.tok, b.rn,
        |         CASE WHEN w.fill + b.tok > 128 THEN w.pack_id + 1
        |              ELSE w.pack_id END,
        |         CASE WHEN w.fill + b.tok > 128 THEN CAST(b.tok AS BIGINT)
        |              ELSE w.fill + b.tok END
        |  FROM walk w JOIN base b
        |    ON b.lang = w.lang AND b.shard = w.shard AND b.rn = w.rn + 1
        |)
        |SELECT doc_id, lang, shard, pack_id, tok
        |FROM walk ORDER BY doc_id""".stripMargin,

    "sample_temperature" ->
      """WITH c AS (
        |  SELECT source, count(*) AS n_docs,
        |    CAST(floor(sqrt(count(*))) AS BIGINT) AS weight
        |  FROM documents GROUP BY source),
        |t AS (SELECT *, sum(weight) OVER () AS sum_w,
        |        sum(n_docs) OVER () AS total_docs FROM c)
        |SELECT source, n_docs, weight,
        |  CAST((weight * 1000) // sum_w AS BIGINT) AS target_permille,
        |  CAST((n_docs * 1000) // total_docs AS BIGINT) AS natural_permille,
        |  (weight * 1000) // sum_w > (n_docs * 1000) // total_docs
        |    AS boosted
        |FROM t ORDER BY source""".stripMargin,

    "composite_curate" ->
      """WITH d AS (
        |  SELECT doc_id, lang, text, n_chars,
        |    string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS INT) AS n_tok
        |  FROM documents),
        |q AS (SELECT * FROM d WHERE n_tok >= 20
        |        AND n_chars - n_tok + 1 >= 3 * n_tok
        |        AND n_chars - n_tok + 1 <= 10 * n_tok),
        |x AS (SELECT *, row_number() OVER (
        |        PARTITION BY md5(lower(trim(text)))
        |        ORDER BY doc_id) AS rn FROM q),
        |e AS (SELECT * FROM x WHERE rn = 1 AND doc_id % 50 <> 0),
        |bg AS (SELECT DISTINCT unnest(list_transform(
        |         range(1, len(toks) - 2),
        |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |              || ' ' || toks[i+3])) AS gram
        |       FROM d WHERE doc_id % 50 = 0),
        |tg AS (SELECT doc_id, unnest(list_distinct(list_transform(
        |         range(1, len(toks) - 2),
        |         i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |              || ' ' || toks[i+3]))) AS gram FROM e),
        |bad AS (SELECT DISTINCT tg.doc_id FROM tg JOIN bg USING (gram)),
        |s AS (SELECT * FROM e
        |      WHERE doc_id NOT IN (SELECT doc_id FROM bad)
        |        AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '8000')
        |SELECT lang, count(*) AS n_docs,
        |  CAST(sum(n_tok) AS BIGINT) AS n_tokens
        |FROM s GROUP BY lang ORDER BY lang""".stripMargin,

    "sample_context_windows" ->
      """WITH d AS (
        |  SELECT doc_id, string_split(text, ' ') AS toks,
        |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_toks
        |  FROM documents),
        |f AS (SELECT * FROM d WHERE n_toks >= 8),
        |w AS (
        |  SELECT doc_id, toks,
        |    unnest(range(0, least((n_toks - 8) // 4 + 1, 10)))
        |      AS widx
        |  FROM f)
        |SELECT doc_id, CAST(widx AS BIGINT) AS widx,
        |  CAST(widx * 4 + 1 AS BIGINT) AS start_tok,
        |  CAST('0x' || substring(md5(array_to_string(
        |    list_slice(toks, CAST(widx * 4 + 1 AS BIGINT),
        |      CAST(widx * 4 + 8 AS BIGINT)), ' ')), 1, 8)
        |    AS BIGINT) AS win_fp
        |FROM w ORDER BY doc_id, widx""".stripMargin
  )
}
