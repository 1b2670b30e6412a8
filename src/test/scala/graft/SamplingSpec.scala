package graft

import graft.operators.Sampling

/** Deterministic hash-gate sampling: membership is a pure function of the
  * key (stable under repartition and re-runs), rates land near nominal,
  * and the threshold encoding is exact at binary fractions.
  */
class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  test("threshold encoding: exact at binary fractions, monotone") {
    assert(Sampling.thresholdHex(0.25) == "40000000")
    assert(Sampling.thresholdHex(0.5) == "80000000")
    assert(Sampling.thresholdHex(0.0) == "00000000")
    assert(Sampling.thresholdHex(1.0) == "g") // sorts after all hex → keep all
    assert("ffffffff" < "g")
  }

  test("membership is key-pure: identical across runs and partitionings") {
    val ids = (0L until 2000L).toDF("id")
    val a = ids.filter(Sampling.hashGate($"id", 0.3))
      .as[Long].collect().toSet
    val b = ids.repartition(7).filter(Sampling.hashGate($"id", 0.3))
      .as[Long].collect().toSet
    assert(a == b)
    // rate near nominal (md5 uniformity): 0.3 ± 0.05 at n=2000
    assert(math.abs(a.size / 2000.0 - 0.3) < 0.05, s"rate ${a.size / 2000.0}")
    // nested fractions: the 10% sample is a subset of the 30% sample
    val c = ids.filter(Sampling.hashGate($"id", 0.1)).as[Long].collect().toSet
    assert(c.subsetOf(a))
  }
}
