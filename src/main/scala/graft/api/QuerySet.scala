package graft.api

import graft.model.Query

/** The committed query set (src/main/resources/QUERIES.tsv) — the
  * repo's stand-in for the reference query set (the reference tree was
  * empty at survey time, SURVEY §0). Drives Bench's latency mix and the
  * rank-identity / serving-equivalence suites, so "rank-identical on
  * the query set" is pinned to a versioned fixture, not ad-hoc
  * literals. */
object QuerySet {
  def load(): Seq[Query] = {
    val in = getClass.getResourceAsStream("/QUERIES.tsv")
    require(in != null, "QUERIES.tsv missing from classpath")
    try {
      scala.io.Source.fromInputStream(in, "UTF-8").getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("#"))
        .map { l =>
          val f = l.split("\t")
          require(f.length == 4, s"bad QUERIES.tsv line: $l")
          Query(f(0).toLong, f(1), f(2), f(3).toInt)
        }.toList
    } finally in.close()
  }
}
