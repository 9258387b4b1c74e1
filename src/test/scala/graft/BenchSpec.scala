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
}
