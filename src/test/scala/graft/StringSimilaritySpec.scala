package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions.{JaroWinklerUtil, StringSimilarity}
import org.apache.spark.unsafe.types.UTF8String

/** Pins the jaro_winkler expression to the DuckDB/RapidFuzz semantics
  * its oracle replays: every golden value below was read back from
  * `jaro_winkler_similarity` in DuckDB v1.0.0 at full double precision,
  * and the kernel's arithmetic order is required to be bit-identical
  * (straight ==, no tolerance).
  */
class StringSimilaritySpec extends AnyFunSuite with SparkTestBase {

  private def jw(a: String, b: String): Double =
    JaroWinklerUtil.similarity(UTF8String.fromString(a), UTF8String.fromString(b))

  test("golden values match DuckDB bit-for-bit") {
    assert(jw("martha", "marhta") === 0.9611111111111111)
    assert(jw("dwayne", "duane") === 0.8400000000000001)
    assert(jw("DIXON", "DICKSONX") === 0.8133333333333332)
    assert(jw("ab", "abcdefghij") === 0.7866666666666667)
    assert(jw("blue anvil", "blue bolt") === 0.8533333333333333)
  }

  test("no Winkler boost at or below the 0.7 jaro threshold") {
    // jaro = 0.5 with common prefix 2: boost must NOT fire (DuckDB: 0.5)
    assert(jw("aaxxxxxx", "aayyyyyy") === 0.5)
  }

  test("empty and degenerate inputs follow DuckDB (any empty side -> 0)") {
    assert(jw("", "") === 0.0)
    assert(jw("", "abc") === 0.0)
    assert(jw("abc", "") === 0.0)
    assert(jw("abc", "abc") === 1.0)
    assert(jw("a", "a") === 1.0)
    // window 0: only same-position bytes can match
    assert(jw("ab", "ba") === 0.0)
  }

  test("byte-level (not codepoint) semantics on multibyte UTF-8") {
    // DuckDB scores the UTF-8 bytes: 'é' is 2 bytes, so |a|=5 here
    assert(jw("café", "cafe") === 0.8483333333333334)
  }

  test("symmetry on real part names") {
    val names = Tables.part(spark, sf0001).select("p_name")
      .distinct().limit(30).collect().map(_.getString(0))
    for (a <- names.take(10); b <- names.take(10))
      assert(jw(a, b) === jw(b, a))
  }

  test("codegen == interpreted on real part-name pairs") {
    val key = "spark.sql.codegen.factoryMode"
    val prev = spark.conf.get(key, "FALLBACK")
    def run: Array[Double] = {
      val n = Tables.part(spark, sf0001)
        .select(col("p_name"), col("p_partkey"))
      n.as("a").join(n.as("b"), col("a.p_partkey") =!= col("b.p_partkey"))
        .limit(500)
        .select(StringSimilarity.jaroWinkler(col("a.p_name"), col("b.p_name")))
        .collect().map(_.getDouble(0))
    }
    try {
      spark.conf.set(key, "CODEGEN_ONLY")
      val gen = run
      spark.conf.set(key, "NO_CODEGEN")
      val interp = run
      assert(gen.toSeq === interp.toSeq)
      assert(gen.length === 500 && gen.exists(_ > 0.0))
    } finally spark.conf.set(key, prev)
  }

  test("SQL surface: jaro_winkler registered via extensions") {
    val r = spark.sql("SELECT jaro_winkler('martha', 'marhta') AS s").head().getDouble(0)
    assert(r === 0.9611111111111111)
  }
}
