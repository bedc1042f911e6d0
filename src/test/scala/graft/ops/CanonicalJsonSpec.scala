package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Byte-for-byte parity with CPython `json.dumps(sort_keys=True)` — the
  * fixture strings/hashes below were produced by CPython itself. */
class CanonicalJsonSpec extends AnyFunSuite {
  import CanonicalJson._

  test("nested map/list, sorted keys, dumps separators") {
    val v = Map("b" -> 1L, "a" -> Seq(1.5, "x", null), "c" -> Map("y" -> true))
    val s = serialize(v)
    assert(s == """{"a": [1.5, "x", null], "b": 1, "c": {"y": true}}""")
    assert(sha1Hex(s) == "feb445f8f765d8879d52404b9eb03815ca97067a")
  }

  test("floats, ints, infinities as python repr") {
    val v = Map("score" -> 123.456, "n" -> 42L,
      "inf" -> Double.PositiveInfinity, "neg" -> Double.NegativeInfinity)
    val s = serialize(v)
    assert(s == """{"inf": Infinity, "n": 42, "neg": -Infinity, "score": 123.456}""")
    assert(sha1Hex(s) == "18cde86fbf95f5ad722f9fdf8f73ee01eb2979c8")
  }

  test("ensure_ascii escaping of non-ASCII and control chars") {
    val v = Map("s" -> "héllo\"w\norld", "i" -> -7L)
    val s = serialize(v)
    val expected = "{\"i\": -7, \"s\": \"h\\u00e9llo\\\"w\\norld\"}"
    assert(s == expected)
    assert(sha1Hex(s) == "d29264e51d5ebb0d6946f798259ccf0fd762d24e")
  }

  test("python float repr across magnitude ranges") {
    val v = Map("f1" -> 1.0, "f2" -> 0.1, "f3" -> 1e-05, "f4" -> 1.5e+17,
      "f5" -> 12345678901234.5)
    val s = serialize(v)
    assert(s == """{"f1": 1.0, "f2": 0.1, "f3": 1e-05, "f4": 1.5e+17, "f5": 12345678901234.5}""")
    assert(sha1Hex(s) == "02bbf8138ac7fb069c49abb04dd69ec6c8475ee5")
  }

  test("pyFloatRepr edge values") {
    assert(pyFloatRepr(0.0) == "0.0")
    assert(pyFloatRepr(-2.0) == "-2.0")
    assert(pyFloatRepr(Double.NaN) == "NaN")
    assert(pyFloatRepr(1e16) == "1e+16")
    assert(pyFloatRepr(0.0001) == "0.0001")
    assert(pyFloatRepr(1e-5) == "1e-05")
  }
}
