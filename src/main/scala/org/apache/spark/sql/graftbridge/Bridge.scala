package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD
import org.apache.spark.storage.StorageLevel

/** Column ↔ Expression bridge.
  *
  * Spark 4 made the Column↔Expression converters `private[sql]`
  * (`org.apache.spark.sql.classic.ExpressionUtils`); extensions that define
  * native Catalyst expressions reach them through a shim inside the sql
  * package namespace — the conventional pattern for Spark extension
  * libraries.
  */
object Bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the storage blocks behind a `localCheckpoint()`ed Dataset.
    *
    * `Dataset.unpersist` routes through the CacheManager, which only
    * tracks `persist()`ed plans — it has NO entry for the RDD blocks a
    * checkpoint pinned, so calling it on a checkpointed frame is a
    * no-op and the blocks survive until GC + ContextCleaner get to the
    * RDD. Iterative pipelines (k-center rounds, star-contraction
    * rounds) that materialize a fresh n-row checkpoint per round must
    * release the superseded round's blocks NOW, not at some future GC,
    * or peak storage grows O(rounds) instead of O(1).
    *
    * A checkpointed Dataset's analyzed plan IS a [[LogicalRDD]] leaf
    * wrapping the materialized RDD; unpersisting that RDD drops its
    * blocks directly at the BlockManager. Only the TOP-LEVEL plan node
    * is considered — deliberately: a derived frame's plan may CONTAIN
    * checkpointed leaves that other live frames still read (e.g. an
    * iterative round built on a caller's checkpointed input), and
    * freeing those would strand the other frames on missing blocks
    * with no recompute path (the checkpoint truncated their lineage).
    * Returns 1 if blocks were freed, 0 otherwise (non-checkpointed or
    * derived frame — callers on plain cached frames should keep using
    * `Dataset.unpersist`; callers holding a derived frame must pass
    * the checkpointed frame itself).
    */
  def unpersistCheckpointBlocks(ds: Dataset[_],
      blocking: Boolean = false): Int =
    ds.queryExecution.analyzed match {
      case lr: LogicalRDD if lr.rdd.getStorageLevel != StorageLevel.NONE =>
        lr.rdd.unpersist(blocking); 1
      case _ => 0
    }
}

/** Type aliases for `private[sql]` Catalyst types that extension
  * expressions need in their public signatures (`ExpectsInputTypes
  * .inputTypes` is typed `Seq[AbstractDataType]`, which Spark 4 hides
  * from user packages). An alias defined inside the sql namespace
  * dealias-matches the required override type.
  */
object BridgeTypes {
  type AbstractDataType = org.apache.spark.sql.types.AbstractDataType
}
