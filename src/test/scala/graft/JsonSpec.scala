package graft

import org.scalatest.funsuite.AnyFunSuite

/** The one shared JSON escaper: everything the Verify artifact and
  * the mark-store wire depend on, pinned. */
class JsonSpec extends AnyFunSuite {
  test("escapes quotes, backslashes, and every control char") {
    assert(Json.str("plain") == "\"plain\"")
    assert(Json.str("a\"b") == "\"a\\\"b\"")
    assert(Json.str("a\\b") == "\"a\\\\b\"")
    assert(Json.str("a\nb\rc\td") == "\"a\\nb\\rc\\td\"")
    assert(Json.str("ab") == "\"a\\u0001b\"")
    // round-trip through a real JSON parser
    val om = new com.fasterxml.jackson.databind.ObjectMapper()
    val nasty = "q\"s\\t\tn\nr\rzend"
    assert(om.readTree(Json.str(nasty)).asText == nasty)
  }
}
