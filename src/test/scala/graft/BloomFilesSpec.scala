package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

/** File-level Bloom index invariants on the real sf0.001 layout: no
  * false negatives ever (the present probe's file always survives and
  * the pruned read finds the row), absent probes find nothing, the
  * false-positive accounting is internally consistent, and pruning
  * actually prunes (candidates ≪ files). */
class BloomFilesSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark
  private val dir = "/root/testdata/sf0.001"

  private lazy val rows = Layout.bloomPruningFiles(spark, dir).collect()

  test("no false negatives: every present probe is found via the pruned read") {
    val present = rows.filter(_.getBoolean(1))
    assert(present.nonEmpty)
    present.foreach { r =>
      assert(r.getLong(4) == 1L, s"files_hit for probe ${r.getLong(0)}")
      assert(r.getLong(6) == 1L, s"rows_found for probe ${r.getLong(0)}")
      assert(r.getLong(3) >= 1L) // its own file among the candidates
    }
  }

  test("absent probes read nothing real; fp accounting is consistent") {
    val absent = rows.filter(!_.getBoolean(1))
    assert(absent.nonEmpty)
    absent.foreach { r =>
      assert(r.getLong(4) == 0L) // files_hit
      assert(r.getLong(6) == 0L) // rows_found
      assert(r.getLong(5) == r.getLong(3)) // fp = all candidates
    }
    rows.foreach { r =>
      assert(r.getLong(5) == r.getLong(3) - r.getLong(4)) // fp = cand − hit
      assert(r.getLong(3) <= r.getLong(2)) // candidates ≤ files_total
    }
  }

  test("the index prunes: mean candidate files well under the layout size") {
    val total = rows.head.getLong(2)
    val meanCand = rows.map(_.getLong(3)).sum.toDouble / rows.length
    // 8 bits/key k=4 designs for ~2–3% fp; allow a wide band but the
    // lookup must clearly not degenerate to a full scan
    assert(meanCand < total * 0.25,
      s"mean candidates $meanCand of $total files")
  }

  test("ingest: merge loses nothing, delta probes serve, fp accounting holds") {
    val ing = Layout.bloomIngest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    // files_total counts REAL shard dirs: all 64 base files plus the
    // delta shards the (tiny) sf0.001 batch actually populated
    val totals = ing.map(_._4).distinct.toSeq
    assert(totals.size == 1 &&
      totals.head > Layout.CompactFragments.toLong &&
      totals.head <= Layout.CompactFragments + Layout.BloomDeltaFiles.toLong,
      s"files_total $totals")
    val byKind = ing.groupBy(_._1)
    // base probes still found after ingest — the merge loses nothing
    byKind("base").foreach { p =>
      assert(p._6 == 1L && p._8 == 1L, s"base probe ${p._2} lost")
    }
    // the add path serves: delta probes found (in delta files, by id)
    assert(byKind.contains("delta"), "no delta probe hit the mod rule")
    byKind("delta").foreach { p =>
      assert(p._6 == 1L && p._8 == 1L, s"delta probe ${p._2} not served")
      assert(p._2 >= Layout.BloomIngestShift)
    }
    // absent populations: nothing real read, fp = all candidates
    (byKind.getOrElse("absent_base", Array.empty) ++
      byKind.getOrElse("absent_delta", Array.empty)).foreach { p =>
      assert(!p._3 && p._6 == 0L && p._8 == 0L && p._7 == p._5)
    }
    // reruns are deterministic (idempotent delta overwrite)
    val again = Layout.bloomIngest(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getBoolean(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6), r.getLong(7)))
    assert(ing.toSeq == again.toSeq)
  }
}
