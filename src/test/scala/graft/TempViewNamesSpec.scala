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

  test("each temp-view name has exactly one registration site in src/main") {
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get("src/main/scala")
    val re = """createOrReplaceTempView\("([^"]+)"\)""".r
    // Files.walk holds open directory handles until closed (javadoc
    // requires try-with-resources) — Using closes it even on assertion
    // throw, instead of leaking handles in the long-lived sbt test JVM
    val sites: Seq[(String, String)] =
      scala.util.Using.resource(java.nio.file.Files.walk(root)) { stream =>
        stream.iterator().asScala
          .filter(_.toString.endsWith(".scala")).toSeq
      }.flatMap { p =>
        val txt = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        re.findAllMatchIn(txt).map(m => m.group(1) -> p.toString).toSeq
      }
    val dups = sites.groupBy(_._1).filter(_._2.size > 1)
    assert(dups.isEmpty,
      s"temp-view names registered from multiple sites (concurrent-lane " +
        s"race risk): ${dups.map { case (n, s) => s"$n -> ${s.map(_._2)}" }}")
  }
}
