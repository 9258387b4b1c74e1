package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** Micro-benchmark for the expression-ladder claim (native Catalyst
  * `Expression` with codegen vs composed built-ins vs a Scala UDF) on
  * the vector-cosine hot path: N synthetic 64-dim float vectors, one
  * aggregation over the cosine against a literal query vector, three
  * implementations. Prints one JSON line with seconds per variant
  * (best of `trials`, first trial discarded as warmup).
  *
  *   SPARK_GRAFT_CPUS=32 sbt "runMain graft.tools.ExprBench 2000000"
  */
object ExprBench {
  def main(args: Array[String]): Unit = {
    val n = if (args.nonEmpty) args(0).toLong else 2000000L
    val dim = 64
    val trials = if (args.length > 1) args(1).toInt else 3
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    GraftFunctions.register(spark)

    // deterministic corpus, materialized once so generation cost is
    // excluded from every variant
    val vecs = spark.range(n).select(col("id"),
        transform(sequence(lit(0), lit(dim - 1)),
          j => (((col("id") * 31 + j * 17) % 19 - 9) / lit(7.0)).cast("float"))
          .as("v"))
      .cache()
    vecs.count()
    val q = Array.tabulate(dim)(j => ((j * 13) % 19 - 9).toFloat / 7f)
    val qCol = typedLit(q)

    val udfCos = udf { (a: Seq[Float], b: Seq[Float]) =>
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val m = math.min(a.length, b.length)
      while (i < m) {
        val x = a(i).toDouble; val y = b(i).toDouble
        dot += x * y; na += x * x; nb += y * y
        i += 1
      }
      if (na == 0.0 || nb == 0.0) 0.0 else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    // composed built-ins: three aggregate() passes over the zipped arrays
    def composed = {
      def dotOf(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
        aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
          lit(0.0), (acc, x) => acc + x)
      dotOf(col("v"), qCol) /
        (sqrt(dotOf(col("v"), col("v"))) * sqrt(dotOf(qCol, qCol)))
    }

    def time(name: String, c: org.apache.spark.sql.Column): (String, Double) = {
      val lats = (0 until trials).map { _ =>
        val t0 = System.nanoTime()
        vecs.select(sum(c)).head()
        (System.nanoTime() - t0) / 1e9
      }
      // first trial is JIT/cache warmup; with a single trial there is
      // nothing to drop — fall back to the lone measurement
      (name, if (lats.size > 1) lats.drop(1).min else lats.min)
    }

    val results = Seq(
      time("native_expr", call_function("graft_cosine", col("v"), qCol)),
      time("zip_with", composed),
      time("scala_udf", udfCos(col("v"), qCol)))
    val js = results.map { case (k, v) => s""""$k":$v""" }.mkString(",")
    println(s"""{"n":$n,"dim":$dim,"cpus":$cpus,$js}""")
    spark.stop()
  }
}
