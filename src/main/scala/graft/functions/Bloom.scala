package graft.functions

import org.apache.spark.sql.{Column, GraftSqlBridge}
import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** Column wrappers over Spark's built-in Bloom-filter sketch expressions
  * (`BloomFilterAggregate` / `BloomFilterMightContain` — the machinery
  * behind Spark's own runtime join filters, SPARK-32268). Spark does not
  * expose them in `sql.functions`, so the bridge constructs them directly;
  * both are codegen-capable catalyst expressions, not UDFs.
  *
  * The aggregate expects a LongType child (hash the key with `xxhash64`
  * first, the same convention Spark's injected runtime filters use) and
  * returns the serialized filter as one BinaryType value — small enough to
  * broadcast: `numBits/8` bytes regardless of corpus size, the whole point
  * of sketch-carried membership at 100 TB.
  */
object Bloom {

  /** Aggregate a LongType column into a serialized Bloom filter sized
    * (`expectedItems`, `numBits`) — fpp ≈ 0.6185^(numBits/expectedItems). */
  def bloomAgg(hashed: Column, expectedItems: Long, numBits: Long): Column =
    GraftSqlBridge.column(new BloomFilterAggregate(
      GraftSqlBridge.expression(hashed),
      Literal(expectedItems), Literal(numBits)).toAggregateExpression())

  /** Membership probe: true if `hashed` (LongType, same hash as the build
    * side) might be in the filter; false is CERTAIN non-membership. */
  def mightContain(bloom: Column, hashed: Column): Column =
    GraftSqlBridge.column(BloomFilterMightContain(
      GraftSqlBridge.expression(bloom), GraftSqlBridge.expression(hashed)))
}
