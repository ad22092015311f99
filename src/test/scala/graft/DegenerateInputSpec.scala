package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

/** Totality on degenerate inputs: every registered query must answer
  * (possibly with zero rows) on EMPTY tables and on 1-ROW tables —
  * the two shapes where latent NPEs, null aggregation results, and
  * zero denominators live. The round-7 session-3 sweep
  * (`runMain graft.Smoke <dir>`) found 14 such crashes across the
  * full 400-query surface; this spec pins exactly those so they stay
  * fixed. Run the full Smoke sweep again whenever a batch of new
  * queries lands.
  */
class DegenerateInputSpec extends AnyFunSuite {
  private lazy val spark = LocalSpark.spark
  private val sf = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  private def degenerate(rows: Int, nullPayload: Boolean = false): String = {
    val dir = Files.createTempDirectory(s"graft-degen-$rows").toString
    tables.foreach { t =>
      // plain parquet copy (schema-preserving); Tables() applies its
      // ts normalization on read, same as for the real testdata
      val src = spark.read.parquet(s"$sf/$t.parquet").limit(rows)
      val out =
        if (!nullPayload) src
        else {
          // null every non-key payload column (third degenerate class)
          val keyish = (n: String) => n.endsWith("key") ||
            Seq("doc_id", "event_id", "user_id", "l_linenumber").contains(n)
          src.select(src.schema.fields.map { f =>
            if (keyish(f.name))
              org.apache.spark.sql.functions.col(f.name)
            else org.apache.spark.sql.functions.lit(null)
              .cast(f.dataType).as(f.name)
          }.toSeq: _*)
        }
      out.coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyDir = degenerate(0)
  private lazy val oneDir = degenerate(1)
  private lazy val nullDir = degenerate(3, nullPayload = true)

  // the queries the sweep caught: IVF/ANN family (empty corpus),
  // PCA (zero dimensions), bloom builds (Spark stat NPE on empty),
  // date-grid ops (NULL sequence bounds), driver-collected scalars
  // (NULL mean / percentiles), partitioned-parquet read-back (no
  // files to infer from), and OLS (zero denominator at n=1)
  private val fixed = Seq("llm_pca_power", "llm_ann_ivf",
    "llm_ann_ivf_exact", "llm_ann_knn", "llm_ann_knn_exact",
    "llm_dedup_semantic", "sink_partitioned", "join_bloom_prefilter",
    "agg_sketch_bloom", "win_gapfill", "ts_resample_linear", "ts_cusum",
    "cdc_time_travel", "agg_regression",
    // round-7 session-5 sweep: no-op row-level commits shorten the
    // version chain (cdf range), empty min/max bounds (zorder)
    "sink_manifest_cdf", "sink_manifest_zorder")

  for (q <- fixed) {
    test(s"$q answers on empty tables") {
      SparkEntry.queries(q)(spark, emptyDir).collect()
    }
    test(s"$q answers on 1-row tables") {
      SparkEntry.queries(q)(spark, oneDir).collect()
    }
  }

  // the all-null-payload sweep's catches: NULL embeddings absent from
  // ANN indexes, zero chi2 base counts, NULL token counts packing as
  // 0, empty KLL sketches, all-null rolling windows, null-dropping
  // concat_ws field serialization, and the manifest sink NARROWING
  // nullability on append (codegen NPE on carried null group keys)
  private val nullFixed = Seq("llm_ann_ivf", "llm_ann_knn",
    "llm_dedup_semantic", "diag_dist_drift", "mm_pack_batches",
    "sample_pack", "sink_manifest_update", "win_rolling_mad",
    "win_rolling_median", "agg_sketch_kll", "scan_text_roundtrip",
    // round-7 session-5 sweep: null text payloads (declared rules —
    // empty blob / non-null hash contract)
    "scan_binaryfile", "fn_catalog_fnv")

  for (q <- nullFixed) {
    test(s"$q answers on all-null payload columns") {
      SparkEntry.queries(q)(spark, nullDir).collect()
    }
  }
}
