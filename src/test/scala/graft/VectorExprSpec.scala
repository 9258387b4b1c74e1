package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.pipeline.Ann

/** Native Catalyst expression (CosineF32): bit-identity with the typed
  * Ann.cosine on both the interpreted and whole-stage-codegen paths,
  * the SQL registry surface, null/length/zero-norm edge contracts,
  * and the plan shape (expression inside codegen, no UDF node). */
class VectorExprSpec extends SparkSpec {
  import spark.implicits._

  private def vecs(n: Int, dim: Int): Seq[(Long, Array[Float])] =
    (1 to n).map { i =>
      (i.toLong, Array.tabulate(dim)(j =>
        (((i * 31 + j * 17) % 19) - 9).toFloat / 7f))
    }

  test("graft_cosine == Ann.cosine bit-for-bit through a DataFrame " +
    "(codegen path) and SQL") {
    GraftFunctions.register(spark)
    val vs = vecs(40, 24)
    val df = vs.toDF("id", "v")
    val pairs = df.as("a").crossJoin(df.as("b"))
      .filter(col("a.id") < col("b.id"))
      .select(col("a.id").as("ia"), col("b.id").as("ib"),
        call_function("graft_cosine", col("a.v"), col("b.v")).as("cos"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val byId = vs.toMap
    pairs.foreach { case ((ia, ib), c) =>
      assert(c == Ann.cosine(byId(ia), byId(ib)), s"($ia,$ib)")
    }
    // SQL registry surface
    val viaSql = spark.sql(
      "SELECT graft_cosine(array(1.0F, 2.0F), array(2.0F, 4.0F))")
      .head().getDouble(0)
    assert(math.abs(viaSql - 1.0) < 1e-15)
  }

  test("edge contract: null propagates, zero norm scores 0, length " +
    "mismatch scores the common prefix") {
    GraftFunctions.register(spark)
    val one = spark.sql("SELECT graft_cosine(CAST(NULL AS ARRAY<FLOAT>), array(1.0F))")
    assert(one.head().isNullAt(0))
    assert(spark.sql("SELECT graft_cosine(array(0.0F), array(1.0F))")
      .head().getDouble(0) == 0.0)
    // common-prefix semantics: norms accumulate over min(len) elements
    // on BOTH sides, so this equals cosine of the 1-element prefixes
    val prefix = spark.sql(
      "SELECT graft_cosine(array(1.0F, 9.0F), array(1.0F))").head().getDouble(0)
    assert(prefix == Ann.cosine(Array(1f), Array(1f)))
  }

  test("bruteTopKNative == bruteTopK exactly; native plan keeps " +
    "whole-stage codegen with no UDF node") {
    val emb = vecs(60, 16).toDS()
    val qs = vecs(60, 16).take(4).toArray
    val typed = Ann.bruteTopK(emb, qs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    val native = Ann.bruteTopKNative(emb, qs, 8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
    assert(native.sortBy(x => (x._1, x._4)).toSeq ==
      typed.sortBy(x => (x._1, x._4)).toSeq)

    // AQE materializes codegen stages only once executed
    val nativeDf = Ann.bruteTopKNative(emb, qs, 8)
    nativeDf.collect()
    val plan = nativeDf.queryExecution.executedPlan.toString
    assert(plan.contains("graft_cosine"), s"expression missing:\n$plan")
    assert(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
      s"must not fall back to a UDF:\n$plan")
    // the '*(n)' marker is WholeStageCodegen in the compact plan print:
    // the Project evaluating the expression must carry it
    val scoringLine = plan.linesIterator
      .find(l => l.contains("graft_cosine") && l.contains("Project"))
    assert(scoringLine.exists(_.contains("*(")),
      s"scoring Project must sit inside a codegen stage:\n$plan")
  }
}
