package graft.profile

import java.time.{Instant, LocalDate, LocalDateTime, OffsetDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

/** Scan-skipping decision ladder for the conditional-request ingest
  * (SURVEY.md §4 "Scan-skipping via HTTP conditional requests";
  * reference: profiling.py:524-597 decision flow, signal check
  * :177-192, header equality :201-227). The HTTP transport itself is
  * out of scope (zero egress); this is the pure decision core a
  * downloader drives:
  *
  *   1. `plan` — before any network touch: a freshness signal newer
  *      than the cached profile forces a fetch; a signal at-or-older
  *      reuses the cache outright; no signal → fetch with
  *      If-Modified-Since when the cache has a Last-Modified.
  *   2. caller sends the request; HTTP 304 → reuse cache.
  *   3. `headersAllowCache` — 200 with unchanged Last-Modified (+
  *      matching Content-Length when both sides have one) → reuse
  *      cache without reading the body.
  */
object FetchDecision {

  sealed trait Decision
  /** Cache is provably fresh — no request needed. */
  case object UseCache extends Decision
  /** Fetch; include If-Modified-Since when present. */
  final case class Fetch(ifModifiedSince: Option[String]) extends Decision

  /** A source-side freshness observation (freshness/models.py shape):
    * when the source says it last changed, at date or datetime
    * precision. */
  final case class FreshnessSignal(sourceModifiedAt: Instant, precision: String)

  /** Lenient ISO-8601 (Z or offset or naive-as-UTC) → Instant
    * (reference _parse_iso_datetime, profiling.py:150-162). */
  def parseIso(value: String): Option[Instant] = {
    val text = Option(value).map(_.trim).filter(_.nonEmpty).getOrElse(return None)
    val candidates = Seq[() => Instant](
      () => Instant.parse(text),
      () => OffsetDateTime.parse(text).toInstant,
      () => LocalDateTime.parse(text).toInstant(ZoneOffset.UTC),
      () => LocalDate.parse(text).atStartOfDay.toInstant(ZoneOffset.UTC))
    candidates.view.flatMap(f => try Some(f()) catch { case _: Exception => None })
      .headOption
  }

  /** RFC-1123 HTTP date → Instant (reference _parse_http_datetime,
    * profiling.py:165-174). */
  def parseHttp(value: String): Option[Instant] = {
    val text = Option(value).map(_.trim).filter(_.nonEmpty).getOrElse(return None)
    try Some(OffsetDateTime.parse(text, DateTimeFormatter.RFC_1123_DATE_TIME).toInstant)
    catch { case _: Exception => None }
  }

  /** profiled_at ≥ source_modified_at, collapsed to whole days when the
    * signal only carries a date (profiling.py:177-192). An unparsable
    * profiled_at can never prove freshness. */
  def signalAllowsCache(profiledAt: Option[String], signal: FreshnessSignal): Boolean =
    profiledAt.flatMap(parseIso) match {
      case None => false
      case Some(at) =>
        if (signal.precision == "date")
          !at.atZone(ZoneOffset.UTC).toLocalDate
            .isBefore(signal.sourceModifiedAt.atZone(ZoneOffset.UTC).toLocalDate)
        else !at.isBefore(signal.sourceModifiedAt)
    }

  /** Pre-request decision (profiling.py:536-556): signal present →
    * authoritative; otherwise conditional fetch when the cache carries a
    * Last-Modified. No cache → plain fetch. */
  def plan(cachedProfiledAt: Option[String], cachedLastModified: Option[String],
           signal: Option[FreshnessSignal]): Decision =
    (cachedProfiledAt, signal) match {
      case (Some(_), Some(sig)) if signalAllowsCache(cachedProfiledAt, sig) => UseCache
      case (Some(_), Some(_)) => Fetch(None) // provably stale — unconditional refetch
      case (Some(_), None) => Fetch(cachedLastModified.map(_.trim).filter(_.nonEmpty))
      case (None, _) => Fetch(None)
    }

  /** Post-response header equality (profiling.py:216-227): equal
    * Last-Modified (parsed when both parse, else trimmed string
    * equality) and, when both sides carry a size, equal size. */
  def headersAllowCache(cachedLastModified: Option[String], cachedSize: Option[Long],
                        respLastModified: Option[String],
                        respContentLength: Option[String]): Boolean = {
    val (cl, rl) = (cachedLastModified.getOrElse(""), respLastModified.getOrElse(""))
    if (cl.trim.isEmpty || rl.trim.isEmpty) return false
    val same = (parseHttp(cl), parseHttp(rl)) match {
      case (Some(a), Some(b)) => a == b
      case _ => cl.trim == rl.trim
    }
    if (!same) return false
    val respSize = respContentLength.flatMap(s => s.trim.toLongOption)
    (respSize, cachedSize) match {
      case (Some(r), Some(c)) => r == c
      case _ => true
    }
  }
}
