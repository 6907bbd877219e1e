package org.apache.spark.sql.graftbridge

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, TypeCollection}

/** Minimal access bridge: a few Catalyst APIs graft needs (Column <->
  * Expression, AbstractDataType for ExpectsInputTypes) are `private[sql]`
  * in Spark 4.x, so this one object lives under the org.apache.spark.sql
  * namespace — the conventional pattern for Spark extension libraries.
  * Everything else in graft stays in its own packages. */
object Bridge {
  type AbstractType = AbstractDataType

  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
  def typeCollection(types: AbstractDataType*): AbstractDataType = TypeCollection(types: _*)
  def asAbstract(t: DataType): AbstractDataType = t
}
