package org.apache.spark.sql.graft

import org.apache.spark.sql.SparkSession

/** Bridge to `SparkSession.cloneSession()`, which Spark marks `private[sql]`
  * (spark/sql/core: classic/SparkSession.scala). A clone shares the
  * SparkContext and external catalog but gets an independent COPY of the
  * session state (conf, temp views, registered functions) — exactly the
  * isolation per-model `session_properties` needs so concurrent model
  * evaluations never observe each other's confs. `newSession()` (the public
  * alternative) starts from DEFAULT state and would drop registered graft_*
  * functions and temp-view fixtures, so the clone is the correct primitive.
  */
object SessionClone {
  def clone(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()
}
