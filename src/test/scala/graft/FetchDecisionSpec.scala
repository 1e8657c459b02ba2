package graft

import java.time.Instant
import org.scalatest.funsuite.AnyFunSuite
import graft.profile.FetchDecision
import graft.profile.FetchDecision._

/** The conditional-request decision ladder (reference
  * profiling.py:524-597, 177-227) as pure logic. */
class FetchDecisionSpec extends AnyFunSuite {

  private val sig = FreshnessSignal(Instant.parse("2026-01-10T12:00:00Z"), "datetime")

  test("signal ladder: newer cache reuses, older cache refetches unconditionally") {
    assert(plan(Some("2026-01-11T00:00:00Z"), Some("lm"), Some(sig)) == UseCache)
    assert(plan(Some("2026-01-09T00:00:00Z"), Some("lm"), Some(sig)) == Fetch(None))
    // equal instant is fresh (>=)
    assert(plan(Some("2026-01-10T12:00:00Z"), None, Some(sig)) == UseCache)
  }

  test("date precision collapses both sides to days") {
    val dateSig = FreshnessSignal(Instant.parse("2026-01-10T23:59:00Z"), "date")
    // profiled earlier the same day still counts as fresh
    assert(signalAllowsCache(Some("2026-01-10T00:30:00Z"), dateSig))
    assert(!signalAllowsCache(Some("2026-01-09T23:59:00Z"), dateSig))
  }

  test("no signal: conditional fetch with If-Modified-Since from the cache") {
    assert(plan(Some("2026-01-01T00:00:00Z"), Some("Wed, 21 Oct 2015 07:28:00 GMT"), None) ==
      Fetch(Some("Wed, 21 Oct 2015 07:28:00 GMT")))
    assert(plan(Some("2026-01-01T00:00:00Z"), Some("  "), None) == Fetch(None))
    assert(plan(None, Some("lm"), None) == Fetch(None))
  }

  test("unparsable profiled_at never proves freshness") {
    assert(!signalAllowsCache(Some("not a date"), sig))
    assert(!signalAllowsCache(None, sig))
  }

  test("header equality: parsed date match + size agreement") {
    val lm = "Wed, 21 Oct 2015 07:28:00 GMT"
    val lmPlusTz = "Wed, 21 Oct 2015 08:28:00 +0100" // same instant
    assert(headersAllowCache(Some(lm), Some(10L), Some(lmPlusTz), Some("10")))
    assert(!headersAllowCache(Some(lm), Some(10L), Some(lmPlusTz), Some("11")))
    // one side missing size → date equality decides
    assert(headersAllowCache(Some(lm), None, Some(lm), Some("11")))
    assert(headersAllowCache(Some(lm), Some(10L), Some(lm), None))
    // unparsable dates fall back to trimmed string equality
    assert(headersAllowCache(Some("opaque-v2 "), Some(1L), Some("opaque-v2"), Some("1")))
    assert(!headersAllowCache(Some("opaque-v2"), None, Some("opaque-v3"), None))
    // absent either side → cannot prove
    assert(!headersAllowCache(None, None, Some(lm), None))
    assert(!headersAllowCache(Some(lm), None, None, None))
  }

  test("iso parser accepts Z, offsets, naive, and bare dates as UTC") {
    assert(FetchDecision.parseIso("2026-01-10T12:00:00Z").contains(Instant.parse("2026-01-10T12:00:00Z")))
    assert(FetchDecision.parseIso("2026-01-10T13:00:00+01:00").contains(Instant.parse("2026-01-10T12:00:00Z")))
    assert(FetchDecision.parseIso("2026-01-10T12:00:00").contains(Instant.parse("2026-01-10T12:00:00Z")))
    assert(FetchDecision.parseIso("2026-01-10").contains(Instant.parse("2026-01-10T00:00:00Z")))
    assert(FetchDecision.parseIso("garbage").isEmpty)
  }
}
