package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{CorpusMerge, Layout}

/** Bloom file-index retraction pins (r10 VERDICT directive #5):
  *
  *  - a FORGOTTEN doc_id never appears as a true hit: every
  *    `probe_kind = 'erased'` row reports files_hit = 0 and
  *    rows_found = 0 (a surviving files_candidate > 0 is a Bloom
  *    false positive, counted in fp_files — the census says so);
  *  - every KEPT present probe is still found (the touched-file
  *    rewrite loses nothing);
  *  - the kept corpus is exactly the non-erased documents
  *    (rows_found totals reconcile with the erasure rule);
  *  - reruns are idempotent (the layout is write-once per corpus).
  *
  * Incremental ≡ rebuild-on-kept is the REGISTERED oracle's job — the
  * DuckDB chain rebuilds everything from `documents` minus the erasure
  * list, so the driver's hash match is the machine proof. */
class BloomForgetSpec extends AnyFunSuite {
  private val spark = SparkTestSession.spark

  private val dir = "/root/testdata/sf0.001"

  private lazy val report = Layout.bloomForget(spark, dir).collect()

  test("a forgotten doc_id never surfaces as a true hit") {
    val erased = report.filter(_.getString(0) == "erased")
    assert(erased.nonEmpty)
    erased.foreach { r =>
      assert(!r.getBoolean(2), s"erased probe ${r.getLong(1)} expected=true")
      assert(r.getLong(5) == 0L, s"erased probe ${r.getLong(1)} files_hit>0")
      assert(r.getLong(7) == 0L, s"erased probe ${r.getLong(1)} rows_found>0")
    }
  }

  test("every kept present probe is still found exactly once") {
    val kept = report.filter(_.getString(0) == "kept")
    assert(kept.nonEmpty)
    kept.foreach { r =>
      assert(r.getBoolean(2))
      assert(r.getLong(5) == 1L, s"kept probe ${r.getLong(1)} files_hit != 1")
      assert(r.getLong(6) >= 0L)
      assert(r.getLong(7) == 1L)
      // the erasure rule and the kept population are disjoint
      assert(r.getLong(1) % CorpusMerge.ForgetMod != CorpusMerge.ForgetRem)
    }
  }

  test("absent probes stay empty; rerun is identical") {
    report.filter(_.getString(0) == "absent").foreach { r =>
      assert(!r.getBoolean(2))
      assert(r.getLong(5) == 0L && r.getLong(7) == 0L)
    }
    val again = Layout.bloomForget(spark, dir).collect()
    assert(report.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }
}
