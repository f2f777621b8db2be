package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fixture spec for Bench's prior-round tail-scrape fallback (r16,
  * VERDICT r15 task #4): since r14 the driver's graded envelope keeps
  * only a ~2000-char stdout TAIL — no parseable `queries` object — so
  * vs_prev/box_ratio rest on `tailScrape`'s regex recovery. A silent
  * mis-scrape would corrupt the normalization arithmetic without ever
  * failing, so the scraper is pinned against (a) the REAL graded
  * BENCH_r14.json — the exact head-truncated artifact the fallback
  * was built for — and (b) a synthetic envelope exercising the r15
  * ADVICE escape hazard (jsonEscape'd error text whose \\ and \"
  * sequences double-escape in the envelope).
  */
class BenchScrapeSpec extends AnyFunSuite {

  test("tailScrape recovers medians, calibration and watch values from " +
      "the real BENCH_r14.json graded envelope") {
    val f = new java.io.File("BENCH_r14.json")
    assume(f.isFile, "graded BENCH_r14.json not in the repo root")
    val pb = Bench.tailScrape(f).getOrElse(fail("tailScrape returned None"))
    // values literally present in r14's truncated compact line
    assert(pb.medians("knn_pq") == 1.2073)
    assert(pb.medians("dd_semantic_best_delta") == 18.1354)
    assert(pb.medians("knn_ivfpq_served") == 0.4682)
    // queries-map value preferred over the terser watch {"m":…} copy
    // when both survive (q18: map 1.1832, watch 1.183)
    assert(pb.medians("q18_large_orders") == 1.1832)
    assert(pb.medians("dd_semantic") == 3.5315)
    // the calibration fields the box_ratio arithmetic divides by
    assert(pb.calib.contains(0.5031))
    assert(pb.sched.contains(0.0515))
    // head-truncated rows are genuinely absent, not hallucinated: r14
    // lost its wc_* head rows (the reason r15 moved them last)
    assert(!pb.medians.contains("wc_wordcount"))
    // nothing scraped that is not a registered query (the watch m/n/g
    // keys and envelope fields must not leak in as medians)
    assert(pb.medians.keySet.subsetOf(SparkEntry.queries.keySet))
  }

  test("tailScrape decodes \\\\ as well as \\\" so jsonEscape'd error " +
      "text cannot shift scoping or inject fake medians") {
    // stdout as Bench prints it: a detail line whose err field carries
    // jsonEscape'd text (embedded \" quotes around a registered-query
    // name — the fake-fragment hazard), then the compact line with the
    // true medians. The driver envelope stores this tail as a JSON
    // string, so every backslash doubles and every quote gains one.
    val stdoutTail =
      """{"metric":"bench_detail","stats":{"dd_exact":{"n":0,"err":""" +
        """"AnalysisException: cannot resolve \"dd_exact\":9.9 in plan """ +
        """C:\\tmp"}},"sf":"/x"}""" + "\n" +
        """{"metric":"total","value":1.0,"unit":"sec","queries":""" +
        """{"dd_exact":0.2394,"wc_wordcount":0.2655},"calibration":0.5,""" +
        """"calibration_sched":0.04,"sf":"/x"}"""
    def envelope(tail: String): String = {
      val esc = tail.flatMap {
        case '"' => "\\\""
        case '\\' => "\\\\"
        case '\n' => "\\n"
        case c => c.toString
      }
      s"""{"n":16,"rc":0,"tail":"$esc","parsed":null}"""
    }
    val f = java.io.File.createTempFile("bench_scrape_fixture", ".json")
    f.deleteOnExit()
    java.nio.file.Files.writeString(f.toPath, envelope(stdoutTail))
    val pb = Bench.tailScrape(f).getOrElse(fail("tailScrape returned None"))
    // scoped to the compact line: the err fragment's 9.9 must lose to
    // the real median even though it names a registered query
    assert(pb.medians("dd_exact") == 0.2394)
    assert(pb.medians("wc_wordcount") == 0.2655)
    assert(pb.calib.contains(0.5))
    assert(pb.sched.contains(0.04))

    // and when the compact-line head marker is truncated away, the
    // membership filter still bounds the damage to registered names
    val headless = envelope(stdoutTail.substring(
      stdoutTail.indexOf("\"queries\"")))
    val f2 = java.io.File.createTempFile("bench_scrape_fixture2", ".json")
    f2.deleteOnExit()
    java.nio.file.Files.writeString(f2.toPath, headless)
    val pb2 = Bench.tailScrape(f2).getOrElse(fail("tailScrape returned None"))
    assert(pb2.medians.keySet.subsetOf(SparkEntry.queries.keySet))
    assert(pb2.medians("wc_wordcount") == 0.2655)
  }
}
