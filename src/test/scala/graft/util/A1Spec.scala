package graft.util

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalatest.funsuite.AnyFunSuite

/** A1-range math (`utils.py:29-60`): goldens + round-trip property. */
class A1Spec extends AnyFunSuite {

  private def check(p: Prop): Unit = {
    val res = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), p)
    assert(res.passed, res.status.toString)
  }

  test("bijective base-26 goldens") {
    assert(A1.intToBijectiveBase26(1) == "A")
    assert(A1.intToBijectiveBase26(26) == "Z")
    assert(A1.intToBijectiveBase26(27) == "AA")
    assert(A1.intToBijectiveBase26(52) == "AZ")
    assert(A1.intToBijectiveBase26(53) == "BA")
    assert(A1.intToBijectiveBase26(702) == "ZZ")
    assert(A1.intToBijectiveBase26(703) == "AAA")
  }

  test("round-trip property: int -> base26 -> int") {
    check(Prop.forAll(Gen.choose(1, 1000000)) { n =>
      A1.bijectiveBase26ToInt(A1.intToBijectiveBase26(n)) == n
    })
  }

  test("range goldens match reference semantics (header row included)") {
    // 5 rows x 5 cols -> A1:E6 (utils.py __main__ demo shape)
    assert(A1.range(5, 5) == "A1:E6")
    assert(A1.range(5, 5, "column_range") == "A:E")
    // offsets shift both corners
    assert(A1.range(100, 16, "full_range", verticalOffset = 1, horizontalOffset = 2) == "C2:R102")
  }

  test("unknown range mode raises") {
    intercept[IllegalArgumentException] { A1.range(1, 1, "diagonal") }
  }

  test("parseRange goldens: rectangle, column range, single cell, open-ended") {
    assert(A1.parseRange("A1:E6") == ((1, Some(1L), 5, Some(6L))))
    assert(A1.parseRange("C2:R102") == ((3, Some(2L), 18, Some(102L))))
    assert(A1.parseRange("A:E") == ((1, None, 5, None)))
    assert(A1.parseRange("B2") == ((2, Some(2L), 2, Some(2L))))
    assert(A1.parseRange("B2:D") == ((2, Some(2L), 4, None)))
    intercept[IllegalArgumentException] { A1.parseRange("2A:4B") }
    intercept[IllegalArgumentException] { A1.parseRange("E1:A5") }
  }

  test("round-trip property: range -> parseRange") {
    check(Prop.forAll(Gen.choose(0L, 10000L), Gen.choose(1, 800),
        Gen.choose(0, 50), Gen.choose(0, 50)) { (rows, cols, vo, ho) =>
      val full = A1.parseRange(A1.range(rows, cols, "full_range", vo, ho))
      val colr = A1.parseRange(A1.range(rows, cols, "column_range", vo, ho))
      full == ((1 + ho, Some(1L + vo), cols + ho, Some(rows + 1 + vo))) &&
        colr == ((1 + ho, None, cols + ho, None))
    })
  }
}
