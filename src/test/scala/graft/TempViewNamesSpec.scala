package graft

import org.scalatest.funsuite.AnyFunSuite

/** Static invariant: every temp-view name is registered from exactly ONE
  * site in src/main. The batch lanes run CONCURRENTLY on a shared
  * SparkSession in RelationalSpec's mini-verify; temp views are
  * session-global, so two lanes calling createOrReplaceTempView on the
  * same name race — safe only while both definitions happen to be
  * identical, which nothing structural guaranteed (ADVICE r13: orders_v
  * was registered by two Relational6 lanes). One-site-per-name makes the
  * safety property checkable instead of coincidental. Pure file scan, no
  * SparkSession.
  */
class TempViewNamesSpec extends AnyFunSuite {

  import scala.jdk.CollectionConverters._

  private def srcFiles: Seq[(java.nio.file.Path, String)] = {
    val root = java.nio.file.Paths.get("src/main/scala")
    // Files.walk holds open directory handles until closed (javadoc
    // requires try-with-resources) — Using closes it even on assertion
    // throw, instead of leaking handles in the long-lived sbt test JVM
    scala.util.Using.resource(java.nio.file.Files.walk(root)) { stream =>
      stream.iterator().asScala
        .filter(_.toString.endsWith(".scala")).toSeq
    }.map(p => p -> new String(java.nio.file.Files.readAllBytes(p), "UTF-8"))
  }

  private def assertOneSite(sites: Seq[(String, String)], kind: String): Unit = {
    val dups = sites.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"$kind registered from multiple sites (concurrent-lane " +
        s"race risk): ${dups.map { case (n, s) => s"$n -> ${s.map(_._2)}" }}")
  }

  test("each temp-view name has exactly one registration site in src/main") {
    val re = """createOrReplaceTempView\("([^"]+)"\)""".r
    assertOneSite(srcFiles.flatMap { case (p, txt) =>
      re.findAllMatchIn(txt).map(m => m.group(1) -> p.toString).toSeq
    }, "temp-view names")
  }

  test("each TEMPORARY FUNCTION name has exactly one registration site") {
    // ADVICE r14: CREATE OR REPLACE TEMPORARY FUNCTION registrations
    // are session-global with the identical concurrent-lane race shape
    // as temp views — two lanes re-registering the same function name
    // is safe only while both bodies happen to be identical. SQL is
    // case-insensitive, so the scan is too; names are folded to lower
    // case so `Foo` and `foo` count as the same function.
    val re =
      """(?i)CREATE\s+OR\s+REPLACE\s+TEMPORARY\s+FUNCTION\s+(\w+)""".r
    assertOneSite(srcFiles.flatMap { case (p, txt) =>
      re.findAllMatchIn(txt)
        .map(m => m.group(1).toLowerCase -> p.toString).toSeq
    }, "TEMPORARY FUNCTION names")
  }

  test("no TEMPORARY FUNCTION registration uses an interpolated name") {
    // a dynamically-built function name ($name / ${...}) escapes the
    // one-site scan above the same way a non-literal view name would —
    // require the token after FUNCTION to be a plain identifier
    val interp =
      """(?i)TEMPORARY\s+FUNCTION\s+[$]""".r
    srcFiles.foreach { case (p, txt) =>
      assert(interp.findFirstIn(txt).isEmpty,
        s"$p registers a TEMPORARY FUNCTION with an interpolated name — " +
          "unscannable by the one-site invariant")
    }
  }

  test("no non-literal createOrReplaceTempView call site exists") {
    // a dynamically-built view name escapes the one-site scan above —
    // every call must pass a string literal so the invariant stays
    // statically checkable
    val anyCall = """createOrReplaceTempView\(""".r
    val literalCall = """createOrReplaceTempView\("[^"]+"\)""".r
    srcFiles.foreach { case (p, txt) =>
      val total = anyCall.findAllMatchIn(txt).size
      val literal = literalCall.findAllMatchIn(txt).size
      assert(total === literal,
        s"$p has ${total - literal} createOrReplaceTempView call(s) with a " +
          "non-literal view name — unscannable by the one-site invariant")
    }
  }
}
