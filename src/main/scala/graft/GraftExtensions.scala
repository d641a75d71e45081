package graft

import org.apache.spark.sql.SparkSessionExtensions

/** Root-package alias so configs can say
  * `spark.sql.extensions=graft.GraftExtensions`. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  private val inner = new graft.functions.GraftFunctionExtensions
  override def apply(ext: SparkSessionExtensions): Unit = inner(ext)
}
