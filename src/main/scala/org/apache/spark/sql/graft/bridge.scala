package org.apache.spark.sql.graft

import org.apache.spark.sql.{Column, Dataset}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.execution.LogicalRDD

/** Column ↔ catalyst-Expression bridge. Spark 4 marks ExpressionUtils
  * private[sql], so this one-file shim lives under org.apache.spark.sql to
  * expose the two conversions graft's custom expressions need. No Spark
  * internals are modified.
  */
object bridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Free the storage blocks behind a `Dataset.localCheckpoint()` result.
    *
    * `localCheckpoint` persists its materialized RDD (MEMORY_AND_DISK) and
    * offers no public release handle — the blocks otherwise squat on the
    * block manager until the RDD is GC'd, which in a long sequential
    * session (Verify/Bench sweeps, iterative driver loops) steals executor
    * storage from every query that follows. The checkpointed RDD sits in
    * the Dataset's `LogicalRDD` leaf; unpersist it once the caller no
    * longer needs the relation (non-blocking — removal proceeds async).
    */
  def releaseLocalCheckpoint(ds: Dataset[_]): Unit =
    ds.queryExecution.logical match {
      case l: LogicalRDD => l.rdd.unpersist(blocking = false)
      case _             => ()
    }
}
