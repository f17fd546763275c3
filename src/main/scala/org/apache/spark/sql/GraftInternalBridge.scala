package org.apache.spark.sql

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/**
 * Library-internal bridge to `SparkSession.internalCreateDataFrame` —
 * builds a DataFrame from an `RDD[InternalRow]` WITHOUT the external-Row
 * round trip (`df.rdd` deserializes every InternalRow to a Row, and
 * `createDataFrame` re-encodes it; for a row-at-a-time operator like
 * [[graft.ops.PrefixSum]] that double conversion dominates). The method is
 * `private[sql]`, so this one-liner lives in the `org.apache.spark.sql`
 * package; it uses only stable catalyst types and no reflection.
 */
object GraftInternalBridge {
  def create(spark: SparkSession, rdd: RDD[InternalRow],
             schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema)
}
