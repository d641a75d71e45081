package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.PandasCsv

/** Python-`repr` float rendering edge cases the golden files don't
  * reach: the 1e16/1e-4 notation boundaries, signed zero, subnormals,
  * extremes. Each expected string is CPython's repr of the value. */
class PandasCsvSpec extends AnyFunSuite {

  private val cases = Seq(
    0.1 -> "0.1",
    2.0 -> "2.0",
    -3.5 -> "-3.5",
    1e15 -> "1000000000000000.0",
    9999999999999998.0 -> "9999999999999998.0", // largest below 1e16
    1e16 -> "1e+16",
    1.5e16 -> "1.5e+16",
    1e-4 -> "0.0001",
    9.999e-5 -> "9.999e-05",
    1e-5 -> "1e-05",
    123456789012345.67 -> "123456789012345.67",
    0.15000000000000002 -> "0.15000000000000002", // 1 - 0.85
    5e-324 -> "5e-324", // min subnormal
    1.7976931348623157e308 -> "1.7976931348623157e+308", // max double
    0.0 -> "0.0",
    -0.0 -> "-0.0")

  test("pyFloat matches CPython repr on notation-boundary cases") {
    cases.foreach { case (x, want) =>
      assert(PandasCsv.pyFloat(x) == want, s"pyFloat($x)")
    }
  }

  test("rendered floats round-trip to the identical double") {
    cases.map(_._1).filterNot(x => x == 0.0 && 1 / x < 0).foreach { x =>
      assert(PandasCsv.pyFloat(x).toDouble == x)
    }
  }

  test("NaN and infinities follow pandas cell semantics") {
    assert(PandasCsv.pyFloat(Double.NaN) == "")
    assert(PandasCsv.pyFloat(Double.PositiveInfinity) == "inf")
    assert(PandasCsv.pyFloat(Double.NegativeInfinity) == "-inf")
  }

  test("minimal quoting doubles embedded quotes") {
    assert(PandasCsv.quoteMinimal("Korea, South") == "\"Korea, South\"")
    assert(PandasCsv.quoteMinimal("say \"hi\"") == "\"say \"\"hi\"\"\"")
    assert(PandasCsv.quoteMinimal("plain") == "plain")
  }
}
