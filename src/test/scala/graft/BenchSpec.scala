package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Bench error accounting: a failed query must surface as time = -1
  * plus an error message — never as a plausible-looking duration. */
class BenchSpec extends SparkSpec {

  test("timeQueries reports failures explicitly") {
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "ok" -> ((s, _) => s.range(3).toDF("n")),
      "boom" -> ((_, _) => throw new IllegalStateException("injected failure")))
    val (times, errors) = Bench.timeQueries(spark, "/unused", qs)
    assert(times("ok") >= 0)
    assert(times("boom") == -1.0)
    assert(errors.keySet == Set("boom"))
    assert(errors("boom").contains("injected failure"))
  }

  test("timeQueries runs in sorted name order with min-of-reps timing") {
    val ran = scala.collection.mutable.ArrayBuffer.empty[String]
    val qs = Map[String, (SparkSession, String) => DataFrame](
      "zeta" -> ((s, _) => { ran += "zeta"; s.range(1).toDF("n") }),
      "alpha" -> ((s, _) => { ran += "alpha"; s.range(1).toDF("n") }),
      "mid" -> ((s, _) => { ran += "mid"; s.range(1).toDF("n") }))
    val (times, errors) = Bench.timeQueries(spark, "/unused", qs, reps = 3)
    // sorted execution order, each query invoked reps times back-to-back
    assert(ran.toSeq == Seq("alpha", "alpha", "alpha",
      "mid", "mid", "mid", "zeta", "zeta", "zeta"))
    assert(errors.isEmpty && times.values.forall(_ >= 0))
  }

  test("warmInputs never throws, even on a directory with no tables") {
    Bench.warmInputs(spark, "/nonexistent-dir")
  }
}
