package graft.wrm

import java.nio.charset.StandardCharsets
import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Encoding repair (S2/F11; reference `ftfy.fix_text`, raw_all.py:80) — the
  * one genuine UDF in the pipeline (everything else is column expressions).
  *
  * Covers the tested surface (test_raw.py:100-123) plus ftfy's most common
  * real-world case: UTF-8 bytes mis-decoded as windows-1252 (smart quotes,
  * "â€œquotedâ€<9d>") or as latin1 ("KrzyÅ¼owa" → "Krzyżowa"), then NFC
  * normalization.
  *
  * Like ftfy's "sloppy-windows-1252", the inverse decode maps every char
  * ≤ 0xFF to its own byte (latin1 identity — this covers the five cp1252
  * positions 0x81/8D/8F/90/9D that lenient decoders pass through as C1
  * controls) and the 27 cp1252 punctuation chars (€ " – ™ œ …) back to
  * their 0x80-0x9F bytes. If the resulting bytes decode as clean,
  * strictly-shorter UTF-8, the string was mojibake — return the repair.
  */
object TextFix {

  /** cp1252 0x80-0x9F → Unicode, inverted: the punctuation a cp1252
    * mis-decode injects, mapped back to the original byte.
    */
  private val Cp1252Inverse: Map[Char, Byte] = Map(
    '€' -> 0x80, '‚' -> 0x82, 'ƒ' -> 0x83, '„' -> 0x84,
    '…' -> 0x85, '†' -> 0x86, '‡' -> 0x87, 'ˆ' -> 0x88,
    '‰' -> 0x89, 'Š' -> 0x8A, '‹' -> 0x8B, 'Œ' -> 0x8C,
    'Ž' -> 0x8E, '‘' -> 0x91, '’' -> 0x92, '“' -> 0x93,
    '”' -> 0x94, '•' -> 0x95, '–' -> 0x96, '—' -> 0x97,
    '˜' -> 0x98, '™' -> 0x99, 'š' -> 0x9A, '›' -> 0x9B,
    'œ' -> 0x9C, 'ž' -> 0x9E, 'Ÿ' -> 0x9F
  ).map { case (k, v) => k -> v.toByte }

  def fixText(s: String): String = {
    if (s == null) return null
    // Iterate the mojibake repair like ftfy: DOUBLE-encoded text (mojibake
    // that was itself re-encoded and mis-decoded) needs one pass per
    // encoding layer. Each successful repair strictly shrinks the string,
    // so this terminates; 4 passes covers any plausible layering.
    var cur = s
    var pass = 0
    var repaired = true
    while (repaired && pass < 4) {
      repairMojibake(cur) match {
        case Some(r) => cur = r
        case None => repaired = false
      }
      pass += 1
    }
    nfc(unescapeEntities(cur))
  }

  /** HTML entity repair (ftfy `unescape_html` analog): the common named
    * entities plus numeric `&#NNN;` / `&#xHH;` forms, applied ONCE (ftfy
    * also unescapes a single level — `&amp;amp;` → `&amp;`). Anything
    * unrecognized or malformed is left verbatim: bare `&` (AT&T), unknown
    * names, out-of-range code points.
    */
  private val NamedEntities: Map[String, String] = Map(
    "amp" -> "&", "lt" -> "<", "gt" -> ">", "quot" -> "\"", "apos" -> "'",
    "nbsp" -> " ", "ndash" -> "–", "mdash" -> "—",
    "hellip" -> "…", "lsquo" -> "‘", "rsquo" -> "’",
    "ldquo" -> "“", "rdquo" -> "”", "bull" -> "•",
    "copy" -> "©", "reg" -> "®", "trade" -> "™",
    "deg" -> "°", "euro" -> "€", "pound" -> "£",
    "agrave" -> "à", "aacute" -> "á", "acirc" -> "â",
    "auml" -> "ä", "ccedil" -> "ç", "egrave" -> "è",
    "eacute" -> "é", "ecirc" -> "ê", "iacute" -> "í",
    "ntilde" -> "ñ", "oacute" -> "ó", "ouml" -> "ö",
    "uacute" -> "ú", "uuml" -> "ü", "szlig" -> "ß")

  private val EntityRe = "&(#[xX]?[0-9a-fA-F]+|[a-zA-Z][a-zA-Z0-9]{1,30});".r

  private[wrm] def unescapeEntities(s: String): String = {
    if (s.indexOf('&') < 0) return s
    EntityRe.replaceAllIn(s, m => {
      val body = m.group(1)
      val replacement =
        if (body.length > 1 && body.charAt(0) == '#') {
          val hex = body.charAt(1) == 'x' || body.charAt(1) == 'X'
          val digits = if (hex) body.substring(2) else body.substring(1)
          try {
            val cp = Integer.parseInt(digits, if (hex) 16 else 10)
            // exclude surrogate code points: Character.isValidCodePoint is
            // TRUE for 0xD800-0xDFFF, but emitting a lone surrogate makes
            // ill-formed UTF-16 that downstream UTF-8 encoders mangle;
            // ftfy leaves such references verbatim too
            if (Character.isValidCodePoint(cp) && cp != 0 &&
                !(cp >= Character.MIN_SURROGATE && cp <= Character.MAX_SURROGATE))
              new String(Character.toChars(cp))
            else m.matched
          } catch { case _: NumberFormatException => m.matched }
        } else NamedEntities.getOrElse(body, m.matched)
      scala.util.matching.Regex.quoteReplacement(replacement)
    })
  }

  /** The 0xC2-0xF4 precondition is the UTF-8 lead-byte range (as seen
    * after either mis-decode, bytes ≥ 0xA0 map to themselves): without
    * one, no multi-byte sequence exists to repair.
    */
  private def repairMojibake(s: String): Option[String] = {
    if (!s.exists(c => c >= 0xC2 && c <= 0xF4)) return None
    val bytes = new Array[Byte](s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c <= 0xFF) bytes(i) = c.toByte
      else Cp1252Inverse.get(c) match {
        case Some(b) => bytes(i) = b
        case None => return None // not representable: was never mis-decoded
      }
      i += 1
    }
    val decoded = new String(bytes, StandardCharsets.UTF_8)
    // replacement char means it wasn't really UTF-8; a repair strictly
    // shrinks (multi-byte sequences collapse) — otherwise keep original
    if (decoded.contains('�') || decoded.length >= s.length) None
    else Some(decoded)
  }

  private def nfc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFC)

  val fixTextUdf = udf(fixText _)

  def fix_text(c: Column): Column = fixTextUdf(c)
}
