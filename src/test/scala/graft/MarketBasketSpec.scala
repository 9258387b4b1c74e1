package graft

import graft.pipeline.MarketBasket

/** Brute-force and law checks for pairwise association rules; the
  * DuckDB twin (`assoc_rules`) pins cross-engine byte-equality. */
class MarketBasketSpec extends SparkSpec {
  import spark.implicits._

  test("rules on sf0.001 == brute-force enumeration from raw baskets") {
    val dir = "/root/testdata/sf0.001"
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey".as[Long], $"l_partkey".as[Long])
      .distinct().collect()
    val baskets = lp.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val nOrders = baskets.size.toDouble
    val itemN = lp.groupBy(_._2).map { case (p, xs) => (p, xs.length.toLong) }
    val pairN = baskets.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val expect = pairN.toSeq.filter(_._2 >= 3).flatMap { case ((a, b), nab) =>
      Seq((a, b, nab), (b, a, nab))
    }.map { case (x, y, nab) =>
      (x, y, nab, r6(nab.toDouble / itemN(x).toDouble),
        r6(nab.toDouble * nOrders / (itemN(x).toDouble * itemN(y).toDouble)))
    }.sortBy(t => (t._1, t._2))
    val got = MarketBasket.rules(spark, dir, minSupport = 3L)
      .as[(Long, Long, Long, Double, Double)].collect().toSeq
    assert(got.nonEmpty, "fixture must produce rules")
    assert(got == expect,
      s"first diff: ${got.zip(expect).find(p => p._1 != p._2)}")
  }

  test("tripleRules on sf0.001 == brute-force enumeration from raw baskets") {
    val dir = "/root/testdata/sf0.001"
    val lp = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey".as[Long], $"l_partkey".as[Long])
      .distinct().collect()
    val baskets = lp.groupBy(_._1).map { case (_, xs) => xs.map(_._2).toSet }
    val nOrders = baskets.size.toDouble
    val itemN = lp.groupBy(_._2).map { case (p, xs) => (p, xs.length.toLong) }
    val pairN = baskets.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(2).map(p => (p(0), p(1))))
      .groupBy(identity).map { case (p, xs) => (p, xs.length.toLong) }
    val tripleN = baskets.toSeq
      .flatMap(b => b.toSeq.sorted.combinations(3).map(t => (t(0), t(1), t(2))))
      .groupBy(identity).map { case (t, xs) => (t, xs.length.toLong) }
    def r6(x: Double) = math.floor(x * 1e6 + 0.5) / 1e6
    val minSup = 2L
    val expect = tripleN.toSeq.filter(_._2 >= minSup)
      .flatMap { case ((a, b, c), n) =>
        Seq((a, b, c, n), (a, c, b, n), (b, c, a, n))
      }
      .map { case (x, y, z, n) =>
        val nxy = pairN((x, y))
        (x, y, z, n, r6(n.toDouble / nxy.toDouble),
          r6(n.toDouble * nOrders / (nxy.toDouble * itemN(z).toDouble)))
      }.sortBy(t => (t._1, t._2, t._3))
    val got = MarketBasket.tripleRules(spark, dir, minSup)
      .as[(Long, Long, Long, Long, Double, Double)].collect().toSeq
    assert(got == expect,
      s"${got.size} vs ${expect.size}; first diff: " +
        s"${got.zip(expect).find(p => p._1 != p._2)}")
    // Apriori soundness: every rule's antecedent pair is frequent
    got.foreach { case (x, y, _, n, conf, _) =>
      assert(pairN((x, y)) >= n && conf <= 1.0 + 1e-12)
    }
  }

  test("laws: symmetry of support, confidence bounds, lift symmetry") {
    val got = MarketBasket.rules(spark, "/root/testdata/sf0.001", 2L)
      .as[(Long, Long, Long, Double, Double)].collect()
    val byPair = got.map(r => ((r._1, r._2), r)).toMap
    got.foreach { case (a, b, s, conf, lift) =>
      assert(conf > 0.0 && conf <= 1.0, s"conf out of range: $conf")
      assert(lift > 0.0)
      val rev = byPair((b, a))
      assert(rev._3 == s, "support must be orientation-free")
      assert(math.abs(rev._5 - lift) <= 1e-6, "lift must be symmetric")
    }
  }

  test("cap guard empties pathological baskets; support prunes") {
    val dir = "/root/testdata/sf0.001"
    assert(MarketBasket.rules(spark, dir, 2L, maxGroup = 1).count() == 0L)
    val s2 = MarketBasket.rules(spark, dir, 2L).count()
    val s3 = MarketBasket.rules(spark, dir, 3L).count()
    assert(s3 < s2 && s3 > 0)
  }

  test("cap-exceeded baskets are COUNTED, never silently dropped") {
    val dir = "/root/testdata/sf0.001"
    // maxGroup=1 drops every multi-item basket: the accumulator must
    // see every one of them (no silent truncation — the Dedup
    // discipline), and under the default cap it must stay 0, which is
    // what licenses the uncapped DuckDB twins.
    val acc = spark.sparkContext.longAccumulator("basket_drops")
    MarketBasket.pairCounts(spark, dir, maxGroup = 1, Some(acc)).count()
    val multiBaskets = spark.read.parquet(s"$dir/lineitem.parquet")
      .select($"l_orderkey", $"l_partkey").distinct()
      .groupBy($"l_orderkey").count().filter($"count" > 1).count()
    assert(acc.value == multiBaskets,
      s"accumulator ${acc.value} != dropped baskets $multiBaskets")

    val acc2 = spark.sparkContext.longAccumulator("basket_drops_default")
    MarketBasket.tripleCounts(spark, dir, dropped = Some(acc2)).count()
    assert(acc2.value == 0L, "default cap must not fire on TPC-H baskets")

    val acc3 = spark.sparkContext.longAccumulator("copurchase_drops")
    graft.pipeline.Graph.partCopurchaseEdges(spark, dir, maxGroup = 1,
      dropped = Some(acc3)).count()
    assert(acc3.value == multiBaskets,
      s"co-purchase accumulator ${acc3.value} != $multiBaskets")
  }
}
