package graft.util

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col

/** `$"name"` column interpolator usable without a SparkSession-bound
  * `spark.implicits._` import (operator code here is session-agnostic).
  */
object Cols {
  implicit class ColStringContext(private val sc: StringContext) extends AnyVal {
    def $(args: Any*): Column = col(sc.s(args: _*))
  }

  /** Fan a narrow frame out to the session's shuffle parallelism before
    * compute-dense per-row work (shingling, MinHash, featurization, vector
    * scoring). The scan's split count is bounded by parquet row groups — a
    * small fixture file is ONE row group, so without this every downstream
    * per-row op runs on a single task. The shuffle moves only the narrow
    * input columns (bytes ≪ the compute they feed); on a production lake
    * with thousands of splits it redistributes the same rows it would have
    * had anyway, so the plan survives the scale-up unchanged.
    */
  def spread(df: DataFrame): DataFrame =
    df.repartition(df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt)
}
