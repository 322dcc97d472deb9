package graft.wrm

import java.nio.file.{Files, Path, Paths}
import java.nio.charset.StandardCharsets

/** Deterministic raw-snapshot fixture generator in the reference's exact
  * file format (FIXTURES.md §1; test_processed.py:29-87): used by the
  * rows-only wrm_* queries and the ScalaTest specs.
  */
object WrmFixture {

  val Header =
    "#id,1705147845.123|3600|-3600,name,lat,lon,bikes,spaces,installed,locked,temporary,total_docks,givesbonus_acceptspedelecs_fbbattlevel,pedelecs"

  /** Station-name templates for the multibyte sweep (VERDICT r16 item 5:
    * the wrm corpus was ASCII-dominant while the reference's ftfy tests
    * are mojibake-centric, test_raw.py:100-123): CJK, Polish/Turkish
    * diacritics, Cyrillic, Greek, RTL Arabic, emoji — plus one literal
    * MOJIBAKE string carried AS DATA, pinning that the batch parse path
    * preserves bytes verbatim (encoding repair runs at the S2
    * ingest-save boundary, [[graft.sources.RawTextSink]], never inside
    * the parse — same placement as the reference). No commas or pipes:
    * both are the format's structural delimiters.
    */
  private[wrm] val MultibyteNames = Vector(
    "Plac Grunwaldzki 広場前",
    "Śródmieście–Łokietka",
    "Şehir Merkezi İstasyonu",
    "Вокзал Центральный",
    "Πλατεία Νίκης",
    "محطة المدينة",
    "Rondo 🚲 Kaźmierza",
    "Station Ã©lÃ¨ve å¤§")

  /** One synthetic snapshot: `n` stations + `nBikes` free bikes, offset by
    * `tick` so consecutive snapshots differ. Stations beyond the base 8
    * carry multibyte names (see [[MultibyteNames]]) — the scale-1 fixture
    * stays byte-identical to every earlier round's, while any scaled run
    * (the x100 stream/wrm gate, the x10000 parse gate) sweeps multibyte
    * content through the whole raw→enhanced→oracle chain.
    */
  def payload(tick: Int, n: Int = 8, nBikes: Int = 4): String = {
    val epoch = 1705147845L + tick * 60
    val stations = (1 to n).map { i =>
      val bikes = (i + tick) % 10
      val spaces = 15 - bikes
      val name = if (i <= 8) s"Station $i"
                 else s"${MultibyteNames((i - 9) % MultibyteNames.size)} $i"
      f"$i%03d,$epoch.${100 + i}%d|3600|-3600,$name%s,${51.10 + i * 0.001}%.4f,${17.03 + i * 0.001}%.4f,$bikes%d,$spaces%d,true,false,false,15,false,${i % 3}%d"
    }
    val bikes = (1 to nBikes).map { i =>
      f"fb$i%03d,$epoch.${200 + i}%d|3600|-3600,BIKE 640$i%02d,${51.11 + (i + tick) * 0.002}%.4f,${17.02 + (i + tick) * 0.002}%.4f,1,0,true,false,false,1,true,0"
    }
    (Header +: (stations ++ bikes)).mkString("\n")
  }

  /** Filename wall-clock slot for tick `t`: stays the historical
    * `HH-00-00` shape up to 14 ticks/date (hours 10..23) and the
    * 10-minute-slot shape up to 84 (both preserve the byte-identical
    * fixtures earlier rounds gated on); past 84 ticks spread over
    * per-minute slots from midnight (1440/day), and past 1440 over
    * per-second slots (86400/day) — so S7 timestamp extraction always
    * sees a valid time at any supported [[WrmScale]].
    */
  private[wrm] def tickHms(t: Int, ticksPerDate: Int): (Int, Int, Int) =
    if (ticksPerDate <= 14) (10 + t, 0, 0)
    else if (ticksPerDate <= 84) (10 + t / 6, (t % 6) * 10, 0)
    else if (ticksPerDate <= 1440) (t / 60, t % 60, 0)
    else (t / 3600, (t / 60) % 60, t % 60)

  /** Write `ticksPerDate` snapshot files for each date under
    * `root/dt=<date>/wrm_stations_<ts>.txt` and return the root. Reuses an
    * existing directory (deterministic content); see [[tickHms]] for the
    * filename-timestamp shape.
    */
  def writeRawFiles(root: Path, dates: Seq[String], ticksPerDate: Int = 3,
                    n: Int = 8, nBikes: Int = 4): Path = {
    // tick base per date: disjoint tick ranges across dates (no payload
    // epoch collision → the content-hash dedup gate never sees identical
    // snapshots on different dates); 100 preserves the historical
    // fixtures byte-for-byte at ticksPerDate <= 100
    val tickBase = math.max(100, ticksPerDate)
    dates.zipWithIndex.foreach { case (date, d) =>
      val dir = root.resolve(s"dt=$date")
      Files.createDirectories(dir)
      (0 until ticksPerDate).foreach { t =>
        val (hh, mm, ss) = tickHms(t, ticksPerDate)
        val f = dir.resolve(f"wrm_stations_${date}_$hh%02d-$mm%02d-$ss%02d.txt")
        val bytes = payload(d * tickBase + t, n, nBikes).getBytes(StandardCharsets.UTF_8)
        // skip the rewrite when content already matches: Files.write
        // truncates first, and a concurrent reader (another JVM's Spark
        // listing) must never observe a half-written fixture
        if (!Files.exists(f) ||
            !java.util.Arrays.equals(Files.readAllBytes(f), bytes))
          Files.write(f, bytes)
      }
    }
    root
  }

  /** Shared fixture for the wrm_* queries: built once per JVM under the
    * scale-suffixed root (see [[WrmScale]]; /tmp/graft_wrm_fixture at the
    * default scale 1, 100× rows via SPARK_GRAFT_WRM_SCALE=100).
    */
  lazy val defaultRoot: Path = {
    val root = Paths.get(s"${WrmScale.root}/raw")
    writeRawFiles(root, Seq("2025-05-01", "2025-05-02"),
      ticksPerDate = 3 * WrmScale.fileFactor,
      n = 8 * WrmScale.rowFactor, nBikes = 4 * WrmScale.rowFactor)
    root
  }
}
