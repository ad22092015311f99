package graft

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.storage.StorageLevel

/** Lineage truncation for memoized / iterative frames — the one place
  * that decides HOW a plan is cut (optimization r13, VERDICT r12 item
  * 2/4: `localCheckpoint` everywhere was a local-mode-friendly trade
  * that weakened cluster fault tolerance).
  *
  * `localCheckpoint` stores non-replicated executor blocks with the
  * lineage TRUNCATED: on a real cluster one lost executor makes the
  * frame permanently unrecoverable (Spark documents it as unsafe with
  * dynamic allocation), where plain `persist` could recompute. Under
  * the harness's local master there is exactly one "executor" (the
  * driver) whose loss is the application's loss, so the trade is
  * free — and cutting the lineage is what kills the O(2^rounds) /
  * 100 KB-plan re-analysis costs the r12 audit measured.
  *
  * Posture, gated by ONE config (`spark.graft.checkpoint.level`):
  *  - local master  → `localCheckpoint` at Spark's default level
  *    (MEMORY_AND_DISK_DESER) — byte-identical to the pre-r13 sites;
  *  - non-local master → `localCheckpoint` at MEMORY_AND_DISK_2:
  *    every block replicated to a second executor, so any single
  *    executor loss leaves a live replica (the recovery story a
  *    1000-executor job needs; double loss of both replicas of a
  *    block remains fatal — jobs that cannot accept that should set
  *    the config to `reliable` once a checkpoint dir is configured);
  *  - `spark.graft.checkpoint.level=<StorageLevel name>` overrides
  *    the level on any master; `=reliable` switches to
  *    `Dataset.checkpoint` (HDFS-backed, survives any executor loss;
  *    requires `spark.checkpoint.dir`).
  * See SCALING.md "Checkpoint posture" for the recovery trade.
  */
object Lineage {
  private val ConfKey = "spark.graft.checkpoint.level"

  def cut[T](df: Dataset[T], eager: Boolean): Dataset[T] = {
    val s: SparkSession = df.sparkSession
    val conf = s.conf.get(ConfKey, "")
    conf match {
      case "" =>
        if (s.sparkContext.isLocal) df.localCheckpoint(eager)
        else df.localCheckpoint(eager, StorageLevel.MEMORY_AND_DISK_2)
      case "reliable" => df.checkpoint(eager)
      case name => df.localCheckpoint(eager, StorageLevel.fromString(name))
    }
  }

  /** `df.lineageCut(eager)` — the drop-in spelling every former
    * `.localCheckpoint(...)` site uses. */
  implicit final class LineageOps[T](private val ds: Dataset[T])
      extends AnyVal {
    def lineageCut(eager: Boolean): Dataset[T] = cut(ds, eager)
  }
}
