package graft

import org.apache.spark.sql.DataFrame

/** Execution helpers shared by the iterative / multi-reference operators. */
object Exec {

  /** Eagerly materialize `df` and cut its lineage.
    *
    * When the session has a checkpoint dir configured
    * (`sc.setCheckpointDir`, normally fault-tolerant shared storage on a
    * real cluster) this is a RELIABLE `checkpoint()`: blocks survive
    * executor loss and dynamic-allocation decommissioning, which is what
    * a 100 TB run needs — `localCheckpoint`'s non-replicated
    * executor-local blocks would fail the whole job on any lost executor
    * (ADVICE r4). Without a configured dir (local / test mode, where the
    * JVM is the only executor and replication buys nothing) it falls
    * back to `localCheckpoint`. */
  def materialize(df: DataFrame): DataFrame =
    if (df.sparkSession.sparkContext.getCheckpointDir.isDefined)
      df.checkpoint()
    else df.localCheckpoint()
}
