package graft

/** Driver-contract smoke: `SparkEntry.entry` must return rows on sf0.001,
  * and every `oracleSql` key must have a `queries` entry. */
class EntrySpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
    assert(df.columns.toSet == Set("doc_id", "score", "rank"))
  }

  test("every oracleSql key has a queries entry; names are well-formed") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o.diff(q)}")
    assert(q.forall(_.matches("[a-z0-9_]+")))
    // rows-only (un-oracled) queries are the deliberately approximate ops
    assert(q.diff(o) == Set("dedup_simhash", "ann_lsh", "ann_pq",
      "ann_ivfpq", "dedup_semantic"), q.diff(o).toString)
  }

  test("all queries run and return rows on sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val empties = Seq("dedup_exact", "q_anti_join") // legitimately empty at this sf
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, sf).count()
      assert(n >= 0, name)
      if (!empties.contains(name))
        assert(n > 0, s"$name returned no rows at sf0.001")
    }
  }
}
