package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import graft.api.DocsIndex

/** Ad-hoc query-latency profiler: stage-level wall clock for repeated
  * BM25 top-k queries. Not part of the driver contract. */
object QueryProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        val i = s.stageInfo
        val ms = (i.completionTime.getOrElse(0L) - i.submissionTime.getOrElse(0L))
        println(f"  stage ${i.stageId}%3d ${ms}%5d ms tasks=${i.numTasks}%3d ${i.name.take(80)}")
      }
    })

    if (sys.env.contains("SPARK_GRAFT_NO_AQE"))
      spark.conf.set("spark.sql.adaptive.enabled", "false")
    val (_, searcher, _) = DocsIndex.get(spark, sfDir)
    (1 to 3).foreach(_ => searcher.hits("FREE", "fast merge sort", 10).collect())
    println("=== timed runs ===")
    (1 to 5).foreach { i =>
      val t0 = System.nanoTime()
      searcher.hits("FREE", "fast merge sort", 10).collect()
      println(f"query $i: ${(System.nanoTime() - t0) / 1e6}%.1f ms")
    }
    spark.stop()
  }
}
