package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.storage.StorageLevel

/** Round-pin strategy for iterative DataFrame loops (NN-descent, label
  * propagation, PageRank, connected components, Borůvka MSF, k-means).
  *
  * Each round of these loops must materialize its state: without a pin
  * the logical plan doubles per iteration (planning alone OOMs), and
  * with a lazy pin every consumer re-executes the round. The QUESTION is
  * where the pinned blocks live, and the right answer depends on the
  * deployment:
  *
  *   - `local` (default): `localCheckpoint()` — executor-local blocks,
  *     zero extra I/O. Right for single-node sessions and short loops,
  *     but the storage is NON-REPLICATED and the lineage is truncated:
  *     on a real cluster an executor loss mid-loop is unrecoverable
  *     (the job dies, it cannot recompute).
  *   - `reliable`: `checkpoint()` to the configured checkpoint
  *     directory (`spark.graft.checkpointDir`, or the context's
  *     existing checkpoint dir) — survives any executor loss; costs one
  *     write+read of the round state per round. The 100 TB posture for
  *     long-running builds on shared clusters.
  *   - `disk2`: `persist(DISK_ONLY_2)` + eager count — two disk
  *     replicas on different executors; survives a SINGLE executor
  *     loss per block without distributed-FS round trips. The middle
  *     ground when no reliable checkpoint dir exists.
  *
  * Selected per session via `spark.conf.set("spark.graft.checkpoint",
  * ...)` — the loop code is strategy-agnostic and results are
  * bit-identical across strategies (PinningSpec pins this): the pin only
  * decides where bytes live, never what they are.
  */
object Pinning {
  val ConfKey = "spark.graft.checkpoint"
  val DirKey = "spark.graft.checkpointDir"

  private def mode(df: DataFrame): String =
    df.sparkSession.conf.get(ConfKey, "local")

  /** Materialize `df` eagerly under the session's pin strategy. The
    * returned frame is fully computed (no lazy tail) and its plan is a
    * flat scan — safe to reference any number of times.
    */
  def pin(df: DataFrame): DataFrame = mode(df) match {
    case "local" => df.localCheckpoint()
    case "reliable" =>
      val sc = df.sparkSession.sparkContext
      if (sc.getCheckpointDir.isEmpty)
        sc.setCheckpointDir(df.sparkSession.conf.get(DirKey,
          sys.props("java.io.tmpdir") + "/graft-checkpoints"))
      df.checkpoint()
    case "disk2" =>
      val p = df.persist(StorageLevel.DISK_ONLY_2)
      p.count()
      p
    case other => throw new IllegalArgumentException(
      s"$ConfKey must be local | reliable | disk2, got '$other'")
  }

  /** Free a pinned frame's storage once a later round supersedes it.
    * Safe on any frame (no-op when nothing is pinned): checkpointed
    * frames free their block-manager RDD blocks, persisted frames drop
    * their CacheManager entry. Reliable-checkpoint FILES are left for
    * the ContextCleaner (`spark.cleaner.referenceTracking.cleanCheckpoints`)
    * or checkpoint-dir cleanup — they are the recovery source and cost
    * no executor memory.
    */
  def unpin(df: DataFrame): Unit = {
    org.apache.spark.sql.graft.ColumnBridge.unpersistCheckpoint(df)
    df.unpersist(blocking = false)
  }
}
