package graft

/** Flagship queries vs their committed sf0.001 goldens (SURVEY §5.6).
  * A failure here means the query's observable contract changed — either
  * fix the regression or deliberately regenerate via `GoldenMain` and
  * review the golden diff.
  */
class GoldenSpec extends SparkSpec {

  Golden.All.foreach { name =>
    test(s"$name matches its committed sf0.001 golden") {
      val expectedPath = java.nio.file.Paths.get(Golden.path(name))
      assert(java.nio.file.Files.exists(expectedPath),
        s"missing golden ${Golden.path(name)} — run Test/runMain graft.GoldenMain")
      val expected = scala.jdk.CollectionConverters
        .ListHasAsScala(java.nio.file.Files.readAllLines(expectedPath)).asScala.toSeq
      val actual = Golden.canon(SparkEntry.queries(name)(spark, sf001))
      assert(actual.size == expected.size,
        s"$name: ${actual.size - 1} rows vs golden ${expected.size - 1}")
      actual.zip(expected).zipWithIndex.collectFirst {
        case ((a, e), i) if a != e => (i, a, e)
      }.foreach { case (i, a, e) =>
        fail(s"$name line $i differs:\n  actual:   $a\n  expected: $e")
      }
    }
  }
}
