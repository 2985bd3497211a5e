package graft

/** Every SparkEntry query must at least execute at sf0.001 and the
  * flagship must return rows — the driver's smoke contract.
  */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a query") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without queries: $missing")
  }

  test("every catalog query is documented in SURVEY") {
    // Guards against doc drift: a new operator must land with its
    // SURVEY inventory row — referenced by its qNNN id or inside a
    // qA-qB range ("q70-q73").
    val survey = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("SURVEY.md")), "UTF-8")
    val range = """q(\d+)-q(\d+)""".r
    val covered = scala.collection.mutable.Set[Int]()
    range.findAllMatchIn(survey).foreach { m =>
      (m.group(1).toInt to m.group(2).toInt).foreach(covered += _)
    }
    """q(\d+)""".r.findAllMatchIn(survey).foreach(m => covered += m.group(1).toInt)
    val undocumented = SparkEntry.queries.keySet
      .map(_.drop(1).takeWhile(_.isDigit).toInt)
      .filterNot(covered)
    assert(undocumented.isEmpty,
      s"queries with no SURVEY mention: ${undocumented.toSeq.sorted.map("q" + _)}")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"$name executes at sf0.001") {
      val df = fn(spark, sf001)
      assert(df.columns.nonEmpty)
      df.count() // force full execution
    }
  }
}
