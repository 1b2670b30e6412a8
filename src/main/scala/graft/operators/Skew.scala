package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables
import graft.util.Cols._

/** Skew mitigation (builder-brief extension; no reference analogue).
  *
  * AQE's skew-join split handles MOST hot keys at runtime, but it only
  * fires for sort-merge/shuffle-hash joins it can re-plan, and it cannot
  * help a count-distinct whose hot group funnels every distinct member to
  * one reducer. These two operators are the explicit forms a 100 TB
  * pipeline reaches for when a handful of keys own a double-digit share of
  * the data (the "null user", the one viral document, the default
  * partition key):
  *
  *  - [[saltedJoin]]: salt the fact side deterministically, replicate the
  *    dimension row across the salt domain, equi-join on (key, salt).
  *    Each hot key's rows spread across `salts` reducers instead of one.
  *    The dimension side grows ×salts — the technique's price — so it fits
  *    the "dim too big to broadcast, fact too skewed to hash-join" middle
  *    ground.
  *  - [[saltedDistinct]]: decompose COUNT(DISTINCT member) BY key into
  *    per-(key, salt) distinct counts summed per key, salting by the
  *    MEMBER so each distinct member lands in exactly one salt bucket and
  *    the per-key sum is exact, not approximate. The hot key's distinct
  *    set is counted by `salts` reducers in parallel.
  *
  * Both are pure plan rewrites — results are bit-identical to the
  * unsalted forms (the DuckDB oracles run the plain SQL), which is the
  * point: skew handling must never change answers.
  */
object Skew {

  /** Deterministic salt in [0, salts): hashed from `src` (the fact row's
    * unique id, NOT the join key — salting by the key would put all of a
    * hot key's rows in one bucket and change nothing). */
  private[graft] def saltOf(src: Column, salts: Int): Column =
    pmod(xxhash64(src), lit(salts.toLong)).cast("int")

  /** Equi-join `fact` to `dim` on `key`, spreading each key's fact rows
    * across `salts` buckets. `factSaltSrc` must be (statistically) unique
    * per fact row. The shuffle_hash hint pins the shuffled-join shape the
    * technique targets — at fixture scale Catalyst would otherwise
    * broadcast `dim` and the salt would be dead weight; on the 100 TB
    * shape this operator exists for, `dim` is over the broadcast
    * threshold and the hint is a no-op.
    */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      factSaltSrc: Column, salts: Int = 8): DataFrame = {
    val saltedFact = fact.withColumn("_salt", saltOf(factSaltSrc, salts))
    val saltedDim = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedFact.join(saltedDim.hint("shuffle_hash"), Seq(key, "_salt"))
      .drop("_salt")
  }

  /** Exact COUNT(DISTINCT `member`) grouped by `key`, decomposed into
    * per-(key, salt) partials. Salting by the member keeps the sum exact:
    * a member appears in exactly one (key, salt) cell, so per-cell
    * distinct counts partition the per-key distinct set. */
  def saltedDistinct(df: DataFrame, key: String, member: String,
      salts: Int = 8): DataFrame =
    df.select(col(key), col(member))
      .withColumn("_salt", saltOf(col(member), salts))
      .groupBy(col(key), $"_salt")
      .agg(countDistinct(col(member)).as("partial"))
      .groupBy(col(key))
      .agg(sum($"partial").as("n_distinct"))

  /** Registered query: orders (fact, o_custkey-keyed) enriched with the
    * customer dimension through the salted join. Bit-identical to the
    * plain join — the oracle IS the plain join. */
  def skewSaltedJoin(spark: SparkSession, sfDir: String,
      salts: Int = 8): DataFrame = {
    val orders = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice")
    val cust = Tables.customer(spark, sfDir)
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment", $"c_nationkey")
    saltedJoin(orders, cust, "o_custkey", $"o_orderkey", salts)
      .select($"o_orderkey", $"o_custkey", $"c_mktsegment", $"c_nationkey",
        $"o_totalprice")
  }

  /** Registered query: distinct active users per event type via the salt
    * decomposition (the skew-proof form of the classic hot-group
    * count-distinct). */
  def saltedDistinctUsers(spark: SparkSession, sfDir: String,
      salts: Int = 8): DataFrame =
    saltedDistinct(Tables.events(spark, sfDir), "event_type", "user_id",
      salts)
}
