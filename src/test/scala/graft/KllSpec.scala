package graft

import graft.pipeline.Kll

/** Accuracy, merge, and determinism gates for the KLL quantile sketch.
  * No SQL twin exists (the sketch's content depends on compaction
  * order) — like HLL++, the gate is an empirical error bound against
  * the EXACT quantiles plus the algebraic laws. */
class KllSpec extends SparkSpec {
  import spark.implicits._

  private def exactQuantile(sorted: Array[Double], q: Double): Double =
    sorted(math.max(0, math.ceil(q * sorted.length).toInt - 1))

  private def normRankError(sorted: Array[Double], est: Double, q: Double): Double = {
    val r = sorted.count(_ <= est).toDouble / sorted.length
    math.abs(r - q)
  }

  private val qs = Seq(0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99)

  test("rank error stays under 2/k on the events value column") {
    val vals = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
      .select($"value".cast("double")).as[Double].collect().sorted
    val sk = Kll.sketch(
      spark.read.parquet("/root/testdata/sf0.001/events.parquet"), "value", k = 200)
    assert(sk.count == vals.length)
    for (q <- qs) {
      val err = normRankError(vals, sk.quantile(q), q)
      assert(err <= 2.0 / 200 * 2, s"q=$q err=$err")
    }
    // footprint: k·levels items, not n
    assert(sk.size < 200 * 8 && sk.size < vals.length)
  }

  test("adversarial order: sorted and reverse-sorted inserts stay accurate") {
    val n = 20000
    val data = (1 to n).map(_.toDouble).toArray
    for (seq <- Seq(data, data.reverse)) {
      val sk = Kll.fromIterator(128, seq.iterator)
      for (q <- qs) {
        val err = normRankError(data, sk.quantile(q), q)
        assert(err <= 0.04, s"q=$q err=$err")
      }
    }
  }

  test("merge law: sketch(A) ++ sketch(B) is as accurate as sketch(A++B)") {
    val rng = new scala.util.Random(42)
    val a = Array.fill(15000)(rng.nextGaussian())
    val b = Array.fill(5000)(rng.nextGaussian() * 10 + 3)
    val all = (a ++ b).sorted
    val merged = Kll.fromIterator(200, a.iterator)
      .merge(Kll.fromIterator(200, b.iterator))
    assert(merged.count == all.length)
    for (q <- qs) {
      val err = normRankError(all, merged.quantile(q), q)
      assert(err <= 0.02, s"q=$q err=$err")
    }
  }

  test("deterministic: same frame, same partitioning, same sketch") {
    val df = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val s1 = Kll.sketch(df, "value", k = 64)
    val s2 = Kll.sketch(df, "value", k = 64)
    assert(s1 == s2)
  }

  test("validation: bad k, empty sketch, out-of-range quantile") {
    intercept[IllegalArgumentException](Kll.empty(4))
    intercept[IllegalArgumentException](Kll.empty(8).quantile(0.5))
    intercept[IllegalArgumentException](
      Kll.fromIterator(8, Iterator(1.0)).quantile(1.5))
    intercept[IllegalArgumentException](
      Kll.empty(8).merge(Kll.empty(16)))
  }
}
