package graft.api

import org.apache.spark.sql.SparkSession

import graft.tokenize.Tokenizer

/** SQL-surface registration — the UDF twin of the tokenizer (SURVEY §2.2
  * P6: "SQL-surface twin registered as UDF so the naive oracle and DuckDB
  * SQL can share logic via exploded tables"). `explode(graft_tokenize(c))`
  * is the UDTF shape: one row in, N token rows out. */
object SqlSurface {
  def register(spark: SparkSession): Unit = {
    spark.udf.register("graft_tokenize",
      (content: String) => Tokenizer.tokenize(content))
    spark.udf.register("graft_query_terms",
      (text: String) => Tokenizer.queryTerms(text))
  }
}
