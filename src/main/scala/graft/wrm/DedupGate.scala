package graft.wrm

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/** Content-hash ingest dedup gate (S3/T5; reference raw_all.py:83-150).
  *
  * Exact reference scope (SURVEY §7.4.6): the new payload's SHA-256 is
  * compared against the SINGLE most recent prior file only — a payload
  * identical to an older-but-not-latest file is re-ingested. State is
  * keep-last-1, so in streaming this is a trivially bounded checkpoint.
  */
object DedupGate {

  def sha256Hex(payload: String): String =
    MessageDigest.getInstance("SHA-256")
      .digest(payload.getBytes(StandardCharsets.UTF_8))
      .map("%02x".format(_)).mkString

  final case class Decision(isDuplicate: Boolean, hash: String)

  /** Compare a new payload against the most recent stored hash. */
  def check(payload: String, lastHash: Option[String]): Decision = {
    val h = sha256Hex(payload)
    Decision(lastHash.contains(h), h)
  }

  /** Driver-side gate over a sequence of (ingest-ordered) payloads: keeps
    * each payload only if it differs from the immediately preceding kept
    * one — the reference's exact skip semantics.
    */
  def filterIngest(payloads: Seq[String]): Seq[String] = {
    val out = Seq.newBuilder[String]
    var last: Option[String] = None
    payloads.foreach { p =>
      val d = check(p, last)
      if (!d.isDuplicate) { out += p; last = Some(d.hash) }
    }
    out.result()
  }
}
