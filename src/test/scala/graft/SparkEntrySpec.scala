package graft

/** The driver contract itself: entry smoke, registry↔map consistency,
  * and oracle coverage — pinned so a refactor can't silently break the
  * surface the driver calls.
  */
class SparkEntrySpec extends SparkSpec {

  test("entry returns rows on the smoke fixture") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("queries/oracleSql derive 1:1 from the registry") {
    val names = SparkEntry.registry.map(_.name).toSet
    assert(SparkEntry.queries.keySet == names)
    assert(SparkEntry.oracleSql.keySet ==
      SparkEntry.registry.filter(_.oracle.isDefined).map(_.name).toSet)
    // every oracle is non-empty trimmed SQL
    assert(SparkEntry.oracleSql.values.forall(s => s.nonEmpty && s == s.trim))
  }
}
