package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.JaroWinkler

/** The native Jaro-Winkler kernel: textbook values, the DuckDB-pinned
  * contracts (empty string, boost threshold), and a brute-force
  * reference sweep. */
class JaroWinklerSpec extends SparkSpec {
  import spark.implicits._

  private def jw(a: String, b: String): Double =
    JaroWinkler.score(UTF8String.fromString(a), UTF8String.fromString(b))

  /** Independent reference: the standard definition, written differently
    * (list-based matching) so a shared bug can't hide. */
  private def ref(a: String, b: String): Double = {
    val (la, lb) = (a.length, b.length)
    if (la == 0 || lb == 0) return 0.0
    val window = math.max(math.max(la, lb) / 2 - 1, 0)
    val mb = Array.fill(lb)(false)
    val matchedA = for {
      i <- 0 until la
      j <- (math.max(0, i - window) until math.min(lb, i + window + 1))
        .find(j => !mb(j) && b(j) == a(i)).map { j => mb(j) = true; j }
    } yield i
    val m = matchedA.length
    if (m == 0) return 0.0
    val bMatched = (0 until lb).filter(mb)
    val t = matchedA.map(a(_)).zip(bMatched.map(b(_)))
      .count { case (x, y) => x != y } / 2
    val j = (m.toDouble / la + m.toDouble / lb +
      (m.toDouble - t) / m) / 3.0
    if (j <= 0.7) j
    else {
      val l = a.zip(b).take(4).takeWhile { case (x, y) => x == y }.length
      j + l * 0.1 * (1.0 - j)
    }
  }

  test("textbook values") {
    jw("martha", "marhta") shouldBe (0.9611111111 +- 1e-9)
    jw("DIXON", "DICKSONX") shouldBe (0.8133333333 +- 1e-9)
    jw("JELLYFISH", "SMELLYFISH") shouldBe (0.8962962963 +- 1e-9)
    jw("dwayne", "duane") shouldBe (0.84 +- 1e-9)
    jw("abc", "abc") shouldBe 1.0
  }

  test("DuckDB-pinned contracts: empty strings, boost threshold") {
    jw("", "") shouldBe 0.0          // NOT 1.0 — the DuckDB contract
    jw("", "abc") shouldBe 0.0
    jw("ab", "ba") shouldBe 0.0      // window 0: no matches
    // jaro exactly 0.5 with prefix 2: boost requires j > 0.7, so none
    jw("abcdefgh", "abzzzzzz") shouldBe 0.5
    // jaro ≈ 0.708 > 0.7 with prefix 2: boosted
    jw("ab", "abcdefghijklmnop") shouldBe (0.7666666667 +- 1e-9)
  }

  test("brute-force reference sweep over random short strings") {
    val rnd = new scala.util.Random(1234)
    def word() = (0 until 1 + rnd.nextInt(10))
      .map(_ => ('a' + rnd.nextInt(4)).toChar).mkString
    for (_ <- 1 to 2000) {
      val (a, b) = (word(), word())
      withClue(s"jw($a, $b): ") { jw(a, b) shouldBe ref(a, b) }
    }
  }

  test("symmetry and bounds") {
    val rnd = new scala.util.Random(7)
    def word() = (0 until 1 + rnd.nextInt(8))
      .map(_ => ('a' + rnd.nextInt(3)).toChar).mkString
    for (_ <- 1 to 500) {
      val (a, b) = (word(), word())
      val s = jw(a, b)
      s shouldBe jw(b, a)
      s should be >= 0.0
      s should be <= 1.0
    }
  }

  test("the Column API rides codegen and handles nulls") {
    val df = Seq(("martha", "marhta"), ("abc", "abc"), (null, "x"))
      .toDF("a", "b")
      .select(round(JaroWinkler(col("a"), col("b")), 6).as("jw"))
    val got = df.collect().map(r => if (r.isNullAt(0)) null
      else java.lang.Double.valueOf(r.getDouble(0)))
    got shouldBe Array(0.961111, 1.0, null)
  }

  test("the SQL registration resolves") {
    graft.functions.GraftFunctions.register(spark)
    spark.sql("SELECT graft_jaro_winkler('crate', 'trace') AS s")
      .as[Double].head() shouldBe (0.7333333333 +- 1e-9)
  }
}
