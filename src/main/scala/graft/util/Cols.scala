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
    * scoring) — but ONLY when the input is under-split. The scan's split
    * count is bounded by parquet row groups: a small fixture file is ONE row
    * group, so without this every downstream per-row op runs on a single
    * task, and the shuffle moves only the narrow input columns (bytes ≪ the
    * compute they feed). On a production lake the scan already has thousands
    * of splits ≥ the session parallelism, and the guard makes this a no-op —
    * an unconditional repartition would re-shuffle the whole corpus for
    * nothing. (Probing `rdd.getNumPartitions` plans the query but runs no
    * job.)
    */
  def spread(df: DataFrame): DataFrame = {
    val target = df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    if (df.rdd.getNumPartitions >= target) df else df.repartition(target)
  }
}
