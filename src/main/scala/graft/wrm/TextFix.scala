package graft.wrm

import java.nio.charset.StandardCharsets
import java.text.Normalizer
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Encoding repair (S2/F11; reference `ftfy.fix_text`, raw_all.py:80) — the
  * one genuine UDF in the pipeline (everything else is column expressions).
  *
  * Covers the tested surface (test_raw.py:100-123): UTF-8-decoded-as-latin1
  * mojibake ("KrzyÅ¼owa" → "Krzyżowa") plus NFC normalization. Strategy:
  * if re-encoding latin1→UTF-8 yields a strictly more plausible string
  * (decodes cleanly and shrinks), use it.
  */
object TextFix {

  def fixText(s: String): String = {
    if (s == null) return null
    val repaired =
      if (s.forall(_ <= 0xFF) && s.exists(c => c >= 0xC2 && c <= 0xF4)) {
        // candidate mojibake: bytes of a UTF-8 string mis-decoded as latin1
        val decoded = new String(s.map(_.toByte).toArray, StandardCharsets.UTF_8)
        // replacement char means it wasn't really UTF-8 — keep original
        if (decoded.contains('�') || decoded.length >= s.length) s else decoded
      } else s
    nfc(repaired)
  }

  private def nfc(s: String): String = Normalizer.normalize(s, Normalizer.Form.NFC)

  val fixTextUdf = udf(fixText _)

  def fix_text(c: Column): Column = fixTextUdf(c)
}
