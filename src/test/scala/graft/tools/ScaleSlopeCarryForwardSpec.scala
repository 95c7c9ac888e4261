package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** The scaleslope artifact's section carry-forward: a combined rewrite
  * whose run skipped the flat/d38 sections must preserve the previously
  * recorded entries rather than clobber them with empty shells (the r16
  * advice finding).
  */
class ScaleSlopeCarryForwardSpec extends AnyFunSuite {

  private def write(s: String): java.nio.file.Path = {
    val p = java.nio.file.Files.createTempFile("slope", ".json")
    java.nio.file.Files.writeString(p, s)
    p
  }

  test("extracts a recorded entry with nested braces, balanced") {
    val p = write("""{"samples":[{"scale":"x10","sec":{"a":1.0}}],""" +
      """"st19_flatness":{"scale":"x10","batch_sec":[1.0,2.0],""" +
      """"inner":{"q":3}},"d38_crossover":{"budget":50,"rows":[]}}""")
    assert(ScaleSlope.carryForward(p, "st19_flatness").contains(
      """"st19_flatness":{"scale":"x10","batch_sec":[1.0,2.0],""" +
        """"inner":{"q":3}}"""))
    assert(ScaleSlope.carryForward(p, "d38_crossover").contains(
      """"d38_crossover":{"budget":50,"rows":[]}"""))
  }

  test("absent key, absent file, and non-object value all yield None") {
    val p = write("""{"samples":[],"st19_flatness":{"a":1}}""")
    assert(ScaleSlope.carryForward(p, "d38_crossover").isEmpty)
    assert(ScaleSlope.carryForward(
      java.nio.file.Paths.get("/nonexistent/slope.json"),
      "st19_flatness").isEmpty)
    val bad = write("""{"st19_flatness":[1,2,3]}""")
    assert(ScaleSlope.carryForward(bad, "st19_flatness").isEmpty)
  }

  test("a truncated (torn) artifact yields None instead of garbage") {
    val p = write("""{"st19_flatness":{"scale":"x10","batch_sec":[1.0""")
    assert(ScaleSlope.carryForward(p, "st19_flatness").isEmpty)
  }
}
