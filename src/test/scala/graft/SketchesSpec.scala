package graft

import graft.operators.Sketches

/** HLL cardinality tier: the estimate tracks the exact anchor inside the
  * lgK=12 accuracy band, and per-shard sketches union LOSSLESSLY — the
  * merge identity that makes incremental accumulation sound.
  */
class SketchesSpec extends SparkTestBase {

  private def bySource(df: org.apache.spark.sql.DataFrame): Map[String, Double] =
    df.collect().map { r =>
      val v: Double = r.get(1) match {
        case l: java.lang.Long => l.toDouble
        case d: java.lang.Double => d
        case o => fail(s"unexpected type ${o.getClass}")
      }
      r.getString(0) -> v
    }.toMap

  test("HLL estimate tracks the exact distinct count within the lgK=12 band") {
    val exact = bySource(Sketches.sourceTokenCardinality(spark, sf))
    val est = bySource(Sketches.sourceTokenCardinalityHll(spark, sf))
    assert(exact.keySet == est.keySet)
    exact.foreach { case (src, e) =>
      // rsd at lgK=12 ≈ 1.6%; 5σ band plus a unit of slack for tiny groups
      assert(math.abs(est(src) - e) <= 0.08 * e + 1, s"$src: ${est(src)} vs $e")
    }
  }

  test("sharded sketches union to the one-pass estimate EXACTLY") {
    val direct = bySource(Sketches.sourceTokenCardinalityHll(spark, sf))
    val sharded = bySource(Sketches.sourceTokenCardinalitySharded(spark, sf))
    assert(direct == sharded)
  }
}
