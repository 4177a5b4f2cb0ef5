package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The deterministic ln: scoring-grade accuracy against libm, exact values
  * on exactly-representable points, and null/edge behavior. Cross-ENGINE
  * bit-equality is proven by the q_bm25_search oracle gate (the DuckDB
  * mirror executes the same stage list); this spec pins the engine side.
  */
class ExactMathSpec extends SparkSpec {
  import spark.implicits._

  test("lnColumn within 4e-16 relative of Math.log across 14 decades") {
    // deterministic log-uniform sweep over (1e-6, 1e8) plus BM25-shaped idf
    // inputs; seeded, no runtime RNG
    val rnd = new scala.util.Random(11)
    val xs = Seq.fill(20000)(math.exp((rnd.nextDouble() - 0.3) * 32)) ++
      (for (n <- Seq(500L, 5000L, 500000L); df <- 1L to 40L)
        yield (n - df + 0.5) / (df + 0.5) + 1.0)
    val out = ExactMath.lnColumn(xs.toDF("x"), "x", "lnx")
      .select($"x", $"lnx").collect()
    assert(out.length == xs.length)
    out.foreach { r =>
      val (x, got) = (r.getDouble(0), r.getDouble(1))
      val want = math.log(x)
      val tol = math.max(math.abs(want), 1e-3) * 4e-16
      assert(math.abs(got - want) <= tol,
        s"x=$x got=$got want=$want err=${math.abs(got - want)}")
    }
  }

  test("exact at 1.0 and at powers of two (pure e*ln2 path, s=0)") {
    val xs = Seq(1.0, 2.0, 4.0, 0.5, 1024.0, math.pow(2.0, 40))
    val out = ExactMath.lnColumn(xs.toDF("x"), "x", "lnx")
      .select($"x", $"lnx").collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    assert(out(1.0) == 0.0)
    val ln2 = math.log(2.0)
    assert(out(2.0) == ln2) // m=1 exactly → result is 1*ln2 with zero series
    assert(out(0.5) == -ln2)
    assert(out(1024.0) == 10.0 * ln2)
  }

  test("stage list is engine-agnostic SQL (no backticks, no UDF names)") {
    ExactMath.lnStages("x", "out").foreach { case (_, sql) =>
      assert(!sql.contains("`") && !sql.contains("java"))
    }
  }
}
