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

  /** THE pinned cross-engine micro-quantization: round to 6 dp (Spark's
    * shortest-decimal HALF_UP), scale to integer micros, cast long — so
    * rollups are exact integers on both engines (Spark `DIV` ≡ DuckDB
    * `//`: both truncate toward zero, negative numerators included —
    * verified on the oracle engine, `-7 // 2 = -3`). One definition: the
    * oracle-checked health tables
    * (`ivf_retrain_health`, `pq_quant_error`, …) and the streaming
    * monitors' alarm folds must quantize identically, or a drifted copy
    * would skew alarm decisions against the oracle-pinned arithmetic. */
  def micros6(c: Column): Column = {
    import org.apache.spark.sql.functions.round
    round(round(c, 6) * 1e6, 0).cast("long")
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

  /** THE salted two-phase top-k rank — the one ranking core behind every
    * per-group cut (similarity top-k, per-source quality caps,
    * cluster-balanced quotas): a local `row_number` within
    * (group, saltKey mod salts) prunes each salt bucket to k, then the
    * global rank sees ≤ salts×k rows per group — so one giant group never
    * funnels the whole input through a single window task (the
    * skew-by-construction a single `Window.partitionBy(group)` would
    * plan). Appends an `rk` LongType column (1..k best-first by `order`,
    * row_number semantics) and drops everything past k; `order` must be a
    * total order over the group for the result to be deterministic. */
  def saltedTopK(df: DataFrame, group: Seq[Column], order: Seq[Column],
      saltKey: Column, k: Int, salts: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions.{lit, pmod, row_number}
    val localW = Window
      .partitionBy(group :+ pmod(saltKey, lit(salts)): _*)
      .orderBy(order: _*)
    val globalW = Window.partitionBy(group: _*).orderBy(order: _*)
    df.withColumn("__lrk", row_number().over(localW))
      .filter(col("__lrk") <= k)
      .drop("__lrk")
      .withColumn("rk", row_number().over(globalW).cast("long"))
      .filter(col("rk") <= k)
  }
}
