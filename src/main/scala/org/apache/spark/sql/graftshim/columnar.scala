package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.execution.vectorized.WritableColumnVector
import org.apache.spark.sql.types.StructType

/** Bridge to Spark's `private[execution]` RowToColumnConverter (the
  * row→vector appender RowToColumnarExec itself uses — it handles every
  * type, nested included). The gdisk deletion-vector scan's survivor-copy
  * path needs exactly that conversion; same access-package pattern as
  * `graftshim.columnOf`. */
object GraftRowToColumn {
  def converter(schema: StructType)
      : (InternalRow, Array[WritableColumnVector]) => Unit = {
    val c = new RowToColumnConverter(schema)
    (row, vecs) => c.convert(row, vecs)
  }
}
