package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** Doc-accuracy pin (r15 verdict item 7): the README's procedures table
  * must list EXACTLY the set `GraftCatalog.listProcedures` registers.
  * A procedure added to the catalog without a documented row — or a
  * documented row whose procedure was dropped/renamed — fails here, so
  * the README can't silently drift from the SQL surface users discover
  * procedures through. */
class ReadmeAccuracySpec extends AnyFunSuite {

  test("README procedures table matches the registered set exactly") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    // rows of the procedures table: | `name` | ... |
    val row = """(?m)^\|\s*`([a-z_]+)`\s*\|""".r
    val documented = row.findAllMatchIn(readme).map(_.group(1)).toSet
    assert(documented.nonEmpty, "procedures table not found in README.md")

    val cat = new GraftCatalog()
    cat.initialize("readme_pin", new org.apache.spark.sql.util.CaseInsensitiveStringMap(
      java.util.Map.of("root", java.nio.file.Files.createTempDirectory("readme_pin").toString)))
    val registered = cat.listProcedures(Array("sys")).map(_.name()).toSet

    assert(documented == registered,
      s"README procedures table drifted from the registry:\n" +
        s"  documented-only: ${(documented -- registered).toSeq.sorted.mkString(", ")}\n" +
        s"  registered-only: ${(registered -- documented).toSeq.sorted.mkString(", ")}")
  }
}
