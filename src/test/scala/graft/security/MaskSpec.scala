package graft.security

import org.scalatest.funsuite.AnyFunSuite

class MaskSpec extends AnyFunSuite {
  test("masks all occurrences, keeps last 4 of long secrets") {
    assert(Mask.safeForLog("API key is ABCD1234EFGH", "ABCD1234EFGH")
      == "API key is ********EFGH")
    assert(Mask.safeForLog("k1: AAAABBBBCCCC k2: WXYZ5678IJKL and again AAAABBBBCCCC",
      "AAAABBBBCCCC", "WXYZ5678IJKL")
      == "k1: ********CCCC k2: ********IJKL and again ********CCCC")
  }
  test("short secrets are fully masked; empty secrets ignored") {
    assert(Mask.safeForLog("pin 1234 end", "1234") == "pin ******** end")
    assert(Mask.safeForLog("nothing", "") == "nothing")
  }
}
