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

  /** Sort `df` globally by `sortCols` and append a contiguous 0..n-1
    * sequence — with the per-partition SORT RUNNING ONCE.
    *
    * The naive two-pass zip (`df.orderBy(...)` + count + emit)
    * re-runs the reduce-side sort in the emit job (Spark reuses the
    * shuffle files, not the sort above them). Here the shared plan is
    * only `repartitionByRange` (shuffle, no sort): the count pass
    * consumes the unsorted shuffle output, and the emit pass sorts
    * each partition itself with Spark's spilling Tungsten sorter
    * (UnsafeExternalRowSorter — the same machinery SortExec uses)
    * before attaching the offsets. Both passes share one RDD, so the
    * sampled range boundaries are consistent and the shuffle is
    * computed once.
    *
    * Sort keys that are plain existing columns are bound by position;
    * computed keys are materialized as trailing columns for the
    * shuffle and dropped from the result.
    */
  def sortedZipWithSequence(df: Dataset[Row], sortCols: Seq[Column],
      seqName: String): (DataFrame, Long) = {
    import org.apache.spark.sql.catalyst.InternalRow
    import org.apache.spark.sql.catalyst.expressions.{Ascending, BoundReference, Descending, GenericInternalRow, JoinedRow, SortOrder, UnsafeRow}
    import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
    import org.apache.spark.sql.execution.UnsafeExternalRowSorter
    import org.apache.spark.sql.types.{LongType, StructField, StructType}

    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.internal.{SortOrder => NodeSortOrder, UnresolvedAttribute => NodeAttr}
    if (sortCols.isEmpty) return zipWithSequenceCounted(df, seqName)
    val classicDf = df.asInstanceOf[classic.Dataset[Row]]
    val session = classicDf.sparkSession

    // (unwrapped key column, ascending?) — Spark 4 Columns are
    // ColumnNode trees, so sort direction unwraps at the node level
    val keyInfo: Seq[(Column, Boolean)] = sortCols.map { c =>
      c.node match {
        case so: NodeSortOrder =>
          (Column(so.child),
            so.sortDirection == NodeSortOrder.Ascending)
        case _ => (c, true)
      }
    }
    // reuse existing columns by ordinal; materialize computed keys
    val dataCols = df.columns
    val resolved: Seq[(Either[Int, (String, Column)], Boolean)] =
      keyInfo.zipWithIndex.map { case ((c, asc), i) =>
        val ord = c.node match {
          case a: NodeAttr
              if a.nameParts.length == 1 &&
                dataCols.count(_ == a.nameParts.head) == 1 =>
            Some(dataCols.indexOf(a.nameParts.head))
          case _ => None
        }
        (ord.map(Left(_)).getOrElse(Right((s"__zk$i", c))), asc)
      }
    val appended = resolved.collect { case (Right((n, c)), _) => (n, c) }
    val withKeys = appended.foldLeft(df) { case (d, (n, c)) =>
      d.withColumn(n, c)
    }
    val rangeCols = resolved.map {
      case (Left(i), asc) =>
        if (asc) col(dataCols(i)).asc else col(dataCols(i)).desc
      case (Right((n, _)), asc) => if (asc) col(n).asc else col(n).desc
    }
    val ranged = withKeys.repartitionByRange(rangeCols: _*)
      .asInstanceOf[classic.Dataset[Row]]
    val internal = ranged.queryExecution.toRdd

    // pass 1: row counts over the UNSORTED shuffle output (the shuffle
    // materializes here and is reused by the emit job)
    val counts = internal
      .mapPartitionsWithIndex((i, it) => Iterator((i, {
        var n = 0L; while (it.hasNext) { it.next(); n += 1 }; n
      })))
      .collect().sortBy(_._1).map(_._2)
    val offsets = counts.scanLeft(0L)(_ + _)

    val fullSchema = ranged.schema
    val nData = dataCols.length
    val sortOrders = resolved.map {
      case (Left(i), asc) =>
        SortOrder(BoundReference(i, fullSchema(i).dataType,
          fullSchema(i).nullable), if (asc) Ascending else Descending)
      case (Right((n, _)), asc) =>
        val i = fullSchema.fieldIndex(n)
        SortOrder(BoundReference(i, fullSchema(i).dataType,
          fullSchema(i).nullable), if (asc) Ascending else Descending)
    }
    val ordering = new LazilyGeneratedOrdering(sortOrders)
    val rowSchema = StructType(fullSchema.fields)
    val outSchema = StructType(fullSchema.fields :+
      StructField(seqName, LongType, nullable = false))

    // first-key prefix comparison + radix eligibility, exactly as
    // SortExec sets up its own sorter (comparator + projection are
    // built executor-side — they don't serialize)
    val headOrder = sortOrders.head
    val canRadix = sortOrders.length == 1 &&
      org.apache.spark.sql.execution.SortPrefixUtils
        .canSortFullyWithPrefix(headOrder) &&
      session.sessionState.conf.enableRadixSort

    val zipped = internal.mapPartitionsWithIndex { (pid, it) =>
      val prefixComparator =
        org.apache.spark.sql.execution.SortPrefixUtils
          .getPrefixComparator(headOrder)
      val prefixProjection =
        org.apache.spark.sql.catalyst.expressions.UnsafeProjection
          .create(Seq(
            org.apache.spark.sql.catalyst.expressions
              .SortPrefix(headOrder)))
      val sorter = UnsafeExternalRowSorter.create(
        rowSchema, ordering, prefixComparator,
        new UnsafeExternalRowSorter.PrefixComputer {
          private val res =
            new UnsafeExternalRowSorter.PrefixComputer.Prefix
          override def computePrefix(row: InternalRow)
              : UnsafeExternalRowSorter.PrefixComputer.Prefix = {
            val p = prefixProjection.apply(row)
            res.isNull = p.isNullAt(0)
            res.value = if (res.isNull) 0L else p.getLong(0)
            res
          }
        },
        org.apache.spark.SparkEnv.get.memoryManager.pageSizeBytes,
        canRadix)
      val sortedIt = sorter.sort(
        it.asInstanceOf[Iterator[UnsafeRow]])
      val joined = new JoinedRow
      val idx = new GenericInternalRow(1)
      var i = offsets(pid)
      sortedIt.map { r =>
        idx.update(0, i)
        i += 1
        joined(r, idx): InternalRow
      }
    }
    val out = session.internalCreateDataFrame(zipped, outSchema)
    (appended.map(_._1).foldLeft(out: DataFrame)((d, n) => d.drop(n)),
      offsets.last)
  }
}
