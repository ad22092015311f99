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

  private def degenerate(rows: Int): String = {
    val dir = Files.createTempDirectory(s"graft-degen-$rows").toString
    tables.foreach { t =>
      // plain parquet copy (schema-preserving); Tables() applies its
      // ts normalization on read, same as for the real testdata
      spark.read.parquet(s"$sf/$t.parquet").limit(rows)
        .coalesce(1).write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    dir
  }

  private lazy val emptyDir = degenerate(0)
  private lazy val oneDir = degenerate(1)

  // the queries the sweep caught: IVF/ANN family (empty corpus),
  // PCA (zero dimensions), bloom builds (Spark stat NPE on empty),
  // date-grid ops (NULL sequence bounds), driver-collected scalars
  // (NULL mean / percentiles), partitioned-parquet read-back (no
  // files to infer from), and OLS (zero denominator at n=1)
  private val fixed = Seq("llm_pca_power", "llm_ann_ivf",
    "llm_ann_ivf_exact", "llm_ann_knn", "llm_ann_knn_exact",
    "llm_dedup_semantic", "sink_partitioned", "join_bloom_prefilter",
    "agg_sketch_bloom", "win_gapfill", "ts_resample_linear", "ts_cusum",
    "cdc_time_travel", "agg_regression")

  for (q <- fixed) {
    test(s"$q answers on empty tables") {
      SparkEntry.queries(q)(spark, emptyDir).collect()
    }
    test(s"$q answers on 1-row tables") {
      SparkEntry.queries(q)(spark, oneDir).collect()
    }
  }
}
