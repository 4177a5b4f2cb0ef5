package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.ops.{Dedup, Sessionize}

/** Property-based invariants (SURVEY §5.2-2). ScalaCheck generators feed
  * deterministic seeds; generated cases are BATCHED into single Spark jobs
  * where the property allows it, so the suite stays fast.
  */
class PropertySpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("exactSum is invariant under any partitioning (order-independence)") {
    val centsGen = Gen.listOfN(60, Gen.chooseNum(-1000000L, 1000000L))
    (1 to 10).foreach { i =>
      val cents = sample(centsGen, i.toLong)
      val expected = cents.sum / 100.0 // exact: integer sum below 2^53
      val values = cents.map(_ / 100.0)
      Seq(1, 3, 7).foreach { parts =>
        val got = values.toDF("v").repartition(parts)
          .agg(ExactNum.exactSum(col("v"), 2).as("s"))
          .head().getDouble(0)
        assert(got == expected,
          s"seed=$i parts=$parts: exactSum=$got expected=$expected")
      }
    }
  }

  test("bround matches BigDecimal HALF_EVEN on the shortest decimal repr") {
    // values on a 1/1000 grid exercise the x.xx5 tie cases
    val gen = Gen.listOfN(300, Gen.chooseNum(-200000L, 200000L).map(_ / 1000.0))
    val values = sample(gen, 42L)
    val got = values.toDF("v").select(col("v"), bround(col("v"), 2).as("b"))
      .collect().map(r => r.getDouble(0) -> r.getDouble(1)).toMap
    values.foreach { v =>
      val expected = java.math.BigDecimal.valueOf(v)
        .setScale(2, java.math.RoundingMode.HALF_EVEN).doubleValue()
      assert(got(v) == expected, s"bround($v, 2) = ${got(v)}, expected $expected")
    }
  }

  test("cleanSymbols: output is a valid subset of trimmed input; idempotent") {
    val symGen = Gen.oneOf(
      Gen.listOfN(4, Gen.alphaNumChar).map(_.mkString),
      Gen.listOfN(7, Gen.alphaNumChar).map(_.mkString), // too long
      Gen.const("BRK.B"), Gen.const(" AA "), Gen.const(""),
      Gen.const("B_D"), Gen.const("GO-1"))
    val raw = sample(Gen.listOfN(200, symGen), 7L)
    val once = etl.StockEtl.cleanSymbols(raw.toDF("Symbol"))
    val out = once.as[String].collect().toSeq
    val trimmedInput = raw.map(_.trim).toSet
    assert(out.forall(trimmedInput.contains), "output not a subset of trimmed input")
    assert(out.forall(s => s.nonEmpty && s.length <= 5 &&
      s.replaceAll("[.-]", "").matches("^[A-Za-z0-9]+$")), s"invalid symbol survived: $out")
    val twice = etl.StockEtl.cleanSymbols(once.toDF("Symbol")).as[String].collect().toSeq
    assert(twice.sorted == out.sorted, "cleanSymbols is not idempotent")
  }

  test("connectedComponents matches a driver-side union-find on random graphs") {
    def unionFind(edges: Seq[(Long, Long)]): Map[Long, Long] = {
      val parent = scala.collection.mutable.Map.empty[Long, Long]
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      parent.keys.map(k => k -> find(k)).toMap
    }
    val edgeGen = for {
      n <- Gen.chooseNum(2, 25)
      es <- Gen.listOfN(n,
        Gen.zip(Gen.chooseNum(0L, 14L), Gen.chooseNum(0L, 14L)))
    } yield es
    (1 to 4).foreach { i =>
      val edges = sample(edgeGen, 100L + i)
      val expected = unionFind(edges)
      val got = Dedup.connectedComponents(edges.toDF("a", "b"), "a", "b")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == expected, s"seed=$i: cc=$got expected=$expected")
    }
  }

  test("sessionize session counts match a driver-side fold for random event streams") {
    val gapS = 100L
    val userGen = for {
      uid <- Gen.chooseNum(1L, 20L)
      n <- Gen.chooseNum(1, 12)
      ts <- Gen.listOfN(n, Gen.chooseNum(0L, 5000L))
    } yield (uid, ts)
    val users = sample(Gen.listOfN(15, userGen), 9L)
      .groupBy(_._1).map { case (uid, xs) => uid -> xs.flatMap(_._2).sorted }
    val rows = users.toSeq.flatMap { case (uid, ts) =>
      ts.zipWithIndex.map { case (t, i) =>
        (uid, new java.sql.Timestamp(t * 1000L), uid * 1000L + i)
      }
    }
    val expected = users.map { case (uid, ts) =>
      uid -> (1L + ts.sliding(2).count {
        case Seq(a, b) => b - a > gapS
        case _ => false
      })
    }
    val got = Sessionize.userSessionStats(
      rows.toDF("user_id", "ts", "event_id"), "user_id", "ts", "event_id", gapS)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected.toMap, s"sessions=$got expected=$expected")
  }
}
