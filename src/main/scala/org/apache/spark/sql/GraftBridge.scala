package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Bridge into Spark's private[sql] Column <-> Expression conversion
  * (Spark 4 moved it behind classic.ExpressionUtils). Lives in the
  * org.apache.spark.sql package solely to satisfy the access
  * modifier; the engine's own code stays in graft.*.
  */
object GraftBridge {
  def expression(c: Column): Expression =
    classic.ExpressionUtils.expression(c)
  def column(e: Expression): Column =
    classic.ExpressionUtils.column(e)

  /** Append a contiguous 0..n-1 long column to `df` in its CURRENT
    * (already sorted) partition order, without leaving the InternalRow
    * world: pass 1 counts rows per partition (driver receives one long
    * per partition), pass 2 maps each partition with its prefix offset.
    * Unlike `rdd.zipWithIndex` + `createDataFrame`, there is no Row
    * encoder boundary — rows are wrapped, not deserialized. Like
    * zipWithIndex, the upstream plan executes twice (count + emit);
    * cache upstream if that matters.
    */
  def zipWithSequence(df: Dataset[Row], seqName: String): DataFrame =
    zipWithSequenceCounted(df, seqName)._1

  /** zipWithSequence plus the total row count — already known from the
    * count pass, so callers needing n (e.g. exact ntile) don't pay a
    * third execution of the plan.
    */
  def zipWithSequenceCounted(df: Dataset[Row], seqName: String)
      : (DataFrame, Long) = {
    import org.apache.spark.sql.catalyst.expressions.{GenericInternalRow, JoinedRow}
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    val session = classicDf.sparkSession
    val internal = classicDf.queryExecution.toRdd
    val counts = internal
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)
    val outSchema = StructType(df.schema.fields :+
      StructField(seqName, LongType, nullable = false))
    val zipped = internal.mapPartitionsWithIndex { (pid, it) =>
      // reused mutable wrappers: downstream operators stream or
      // copy-on-buffer, per Spark's InternalRow iterator contract
      val joined = new JoinedRow
      val idx = new GenericInternalRow(1)
      var i = offsets(pid)
      it.map { r =>
        idx.update(0, i)
        i += 1
        joined(r, idx): org.apache.spark.sql.catalyst.InternalRow
      }
    }
    (session.internalCreateDataFrame(zipped, outSchema),
      offsets.last)
  }
}
