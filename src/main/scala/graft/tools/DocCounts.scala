package graft.tools

import java.nio.charset.StandardCharsets.UTF_8
import java.nio.file.{Files, Paths}

/** Rewrites the query/oracle count phrases in the prose docs from the
  * ONE source of truth — `SparkEntry.queries.size` /
  * `SparkEntry.oracleSql.size` — so the counts can never drift again
  * (they drifted three rounds running while hand-maintained).
  *
  * Only the tightly-anchored CURRENT-state phrases are rewritten;
  * historical sentences like "Round 3 (104 queries…)" in SCALE.md are
  * deliberately untouched — they describe past rounds, not the present.
  *
  * Run before committing: sbt "runMain graft.tools.DocCounts"
  * (no SparkSession needed — it only reads the registry maps).
  */
object DocCounts {
  def main(args: Array[String]): Unit = {
    val q = graft.SparkEntry.queries.size
    val o = graft.SparkEntry.oracleSql.size
    val ro = q - o
    val edits: Seq[(String, String, String)] = Seq(
      // README.md layout line
      ("README.md",
        """\d+ queries \+ \d+ DuckDB oracles""",
        s"$q queries + $o DuckDB oracles"),
      // NOTES.md state paragraph
      ("NOTES.md",
        """\d+ registered queries \(\d+ DuckDB-oracle-matched, \d+ rows-only""",
        s"$q registered queries ($o DuckDB-oracle-matched, $ro rows-only"),
      // COVERAGE.md totals line
      ("COVERAGE.md",
        """\d+ registered queries — \d+ with DuckDB oracles, \d+ rows-only""",
        s"$q registered queries — $o with DuckDB oracles, $ro rows-only"))
    var failed = false
    edits.foreach { case (file, pattern, replacement) =>
      val path = Paths.get(file)
      val before = new String(Files.readAllBytes(path), UTF_8)
      val after = pattern.r.replaceAllIn(before,
        scala.util.matching.Regex.quoteReplacement(replacement))
      if (pattern.r.findFirstIn(before).isEmpty) {
        // a missing anchor means someone reworded the marker line — that
        // must fail loudly, or the count silently goes stale again
        println(s"[doccounts] ERROR: no match for '$pattern' in $file")
        failed = true
      } else if (after != before) {
        Files.write(path, after.getBytes(UTF_8))
        println(s"[doccounts] $file: -> '$replacement'")
      } else println(s"[doccounts] $file: already current ('$replacement')")
    }
    println(s"[doccounts] source of truth: queries=$q oracles=$o rows-only=$ro")
    if (failed) sys.exit(1)
  }
}
