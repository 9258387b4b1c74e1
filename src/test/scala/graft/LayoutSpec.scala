package graft

import org.apache.spark.sql.functions._

import graft.pipeline.Layout

/** Z-order layout clustering (pipeline/Layout.scala): bit-level
  * interleave goldens + brute-force equality over real testdata, the
  * prefix file rule, the data-skipping win vs the naive id-order
  * layout, parallelism invariance, and validation. */
class LayoutSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"
  private lazy val docs = spark.read.parquet(s"$sf/documents.parquet")
    .select(col("doc_id"), col("source"), col("n_chars"))

  test("interleave16 matches bit-position goldens and a string-built oracle") {
    assert(Layout.interleave16(0xffffL, 0L) == 0x55555555L)
    assert(Layout.interleave16(0L, 0xffffL) == 0xaaaaaaaaL)
    assert(Layout.interleave16(0xffffL, 0xffffL) == 0xffffffffL)
    assert(Layout.interleave16(1L, 0L) == 1L && Layout.interleave16(0L, 1L) == 2L)
    val rng = new java.util.SplittableRandom(5)
    (0 until 200).foreach { _ =>
      val x = rng.nextLong(1 << 16); val y = rng.nextLong(1 << 16)
      // independent oracle: build the binary string by hand
      val s = (15 to 0 by -1).flatMap(b =>
        Seq((y >>> b) & 1L, (x >>> b) & 1L)).mkString
      assert(Layout.interleave16(x, y) == java.lang.Long.parseLong(s, 2))
    }
  }

  test("zorder column rule == driver interleave; prefix file law; " +
       "skipping beats the id-order layout; invariance; validation") {
    val assign = Layout.zorder(docs, 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val rows = docs.collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val ranks = rows.map(_._2).distinct.sorted.zipWithIndex.toMap
    val s = ranks.size.toLong
    val (lo, hi) = (rows.map(_._3).min, rows.map(_._3).max)
    val wantZ = rows.map { case (id, src, nc) =>
      val xs = if (s > 1) ranks(src).toLong * 65535L / (s - 1) else 0L
      val ys = if (hi > lo) (nc - lo) * 65535L / (hi - lo) else 0L
      (id, Layout.interleave16(xs, ys))
    }.toMap
    assign.foreach { case (id, z, file) =>
      assert(z == wantZ(id), s"doc $id z $z != ${wantZ(id)}")
      assert(file == (z >>> 29), s"doc $id file $file != prefix ${z >>> 29}")
    }
    // the skipping audit: z-order files carry far narrower n_chars
    // spans than id-order files (that's the curve's entire purpose)
    val n = rows.length.toLong
    val zSpan = assign.groupBy(_._3).values.map { g =>
      val ncs = g.map(t => rows.find(_._1 == t._1).get._3)
      ncs.max - ncs.min
    }.sum
    val idSpan = rows.groupBy(t => t._1 * 8 / n).values.map { g =>
      g.map(_._3).max - g.map(_._3).min
    }.sum
    assert(zSpan * 2 < idSpan,
      s"z-order span $zSpan not clearly narrower than id-order $idSpan")
    // parallelism invariance
    val again = Layout.zorder(docs.repartition(7), 8).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(again.toSeq == assign.sortBy(_._1).toSeq)
    intercept[IllegalArgumentException](Layout.zorder(docs, 6))
    intercept[IllegalArgumentException](Layout.zorder(docs, 0))
  }
}
