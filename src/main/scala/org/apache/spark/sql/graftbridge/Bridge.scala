package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

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
