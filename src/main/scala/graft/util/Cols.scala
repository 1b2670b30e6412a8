package graft.util

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

/** `$"name"` column interpolator usable without a SparkSession-bound
  * `spark.implicits._` import (operator code here is session-agnostic).
  */
object Cols {
  implicit class ColStringContext(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }
}
