package graft.expr

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

class StringMetricsSpec extends AnyFunSuite {

  private def goldens: Seq[(String, String, Int, Double, Double)] = {
    val src = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/string_metrics_golden.csv"), "UTF-8")
    try {
      val lines = src.getLines().drop(1).toList
      lines.map { line =>
        // csv written by python csv module; quotes only when needed. Parse
        // minimally: fields never contain commas except none in our vocab.
        val parts = parseCsvLine(line)
        (parts(0), parts(1), parts(2).toInt, parts(3).toDouble, parts(4).toDouble)
      }
    } finally src.close()
  }

  private def parseCsvLine(line: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    val cur = new StringBuilder
    var inQ = false
    var i = 0
    while (i < line.length) {
      val c = line.charAt(i)
      if (inQ) {
        if (c == '"' && i + 1 < line.length && line.charAt(i + 1) == '"') { cur += '"'; i += 1 }
        else if (c == '"') inQ = false
        else cur += c
      } else {
        if (c == '"') inQ = true
        else if (c == ',') { out += cur.toString; cur.clear() }
        else cur += c
      }
      i += 1
    }
    out += cur.toString
    out.toArray
  }

  test("partial_ratio matches difflib/fuzzywuzzy goldens exactly") {
    var n = 0
    goldens.foreach { case (a, b, pr, _, _) =>
      assert(StringMetrics.partialRatio(a, b) == pr, s"partial_ratio('$a','$b')")
      n += 1
    }
    assert(n > 400)
  }

  test("difflib ratio matches goldens exactly") {
    goldens.foreach { case (a, b, _, _, r) =>
      assert(math.abs(StringMetrics.ratio(a, b) - r) < 1e-12, s"ratio('$a','$b')")
    }
  }

  test("jaccard_char_distance matches goldens exactly") {
    goldens.foreach { case (a, b, _, jd, _) =>
      assert(math.abs(StringMetrics.jaccardCharDistance(a, b) - jd) < 1e-12,
        s"jaccard('$a','$b')")
    }
  }

  test("metric axioms: symmetry, identity, bounds") {
    val gs = Gen.chooseNum(0, 14).flatMap(n => Gen.listOfN(n, Gen.alphaNumChar)).map(_.mkString)
    val pairs = for {
      i <- 0 until 500
      a <- gs(Gen.Parameters.default, Seed(i.toLong))
      b <- gs(Gen.Parameters.default, Seed(i.toLong + 100000))
    } yield (a, b)
    assert(pairs.size > 400)
    pairs.foreach { case (a: String, b: String) =>
      val pr = StringMetrics.partialRatio(a, b)
      assert(pr >= 0 && pr <= 100)
      // partial_ratio is asymmetric when lengths are equal (fuzzywuzzy picks
      // s1 as "shorter" on ties) — only assert symmetry on distinct lengths
      if (a.length != b.length) assert(pr == StringMetrics.partialRatio(b, a))
      val j = StringMetrics.jaccardCharDistance(a, b)
      assert(j >= 0.0 && j <= 1.0)
      assert(j == StringMetrics.jaccardCharDistance(b, a))
      assert(StringMetrics.jaccardCharDistance(a, a) == 0.0)
      if (a.nonEmpty) assert(StringMetrics.partialRatio(a, a) == 100)
    }
  }
}
