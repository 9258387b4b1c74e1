package graft.tools

import org.apache.spark.sql.SparkSession

import graft.corpus.Synthesizer
import graft.tokenize.Tokenizer

/** Compute-only scaling probe: tokenize+count with NO shuffle, NO cache,
  * NO disk — isolates the data-parallel fraction from the sandbox's
  * shared-disk interference. Short legs (~20 s) fit inside quiet
  * co-tenant windows. */
object ComputeScaling {
  def main(args: Array[String]): Unit = {
    val docs = args.headOption.map(_.toLong).getOrElse(300000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val trials = sys.env.getOrElse("SPARK_GRAFT_TRIALS", "3").toInt
    val times = (1 to trials).map { t =>
      val t0 = System.nanoTime()
      val n = Synthesizer.corpus(spark, docs, 400)
        .map(r => Tokenizer.tokenize(r.content).length.toLong)
        .reduce(_ + _)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"trial=$t $sec%.2fs tokens=$n cpus=$cpus")
      sec
    }
    println(f"CBEST ${times.min}%.2f cpus=$cpus docs=$docs")
    spark.stop()
  }
}
