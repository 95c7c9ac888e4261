package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the custom expressions' compute kernels against
  * straightforward reference implementations -- no SparkSession, so these
  * cover thousands of adversarial inputs (unicode, control chars,
  * boundaries) cheaply.
  */
class ExpressionPropertySpec extends AnyFunSuite {

  /** Minimal property loop (no scalatestplus bridge in the offline cache). */
  private def forAllGen[A](gen: Gen[A], n: Int = 500)(f: A => Unit): Unit =
    (0 until n).foreach { i =>
      gen.apply(Gen.Parameters.default, Seed(i.toLong)).foreach(f)
    }

  private val texts: Gen[String] = {
    val piece: Gen[String] = Gen.oneOf(
      Gen.alphaNumChar.map(_.toString),
      Gen.oneOf(" ", "\t", "\n", "\u000b", "\f", "\r"),
      Gen.oneOf("\u00e9", "\u4e16", "\ud83d\ude42", "\u00df", "\u00a1"),
      Gen.choose(' ', '\u00ff').map(_.toString))
    Gen.frequency(
      3 -> Gen.asciiPrintableStr,
      2 -> Gen.listOf(piece).map(_.mkString),
      1 -> Gen.const(""))
  }

  test("Md5Prefix60.compute == BigInteger of the first 15 md5 hex digits") {
    forAllGen(texts) { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s.getBytes("UTF-8"))
        .map(b => f"${b & 0xff}%02x").mkString
      val ref = new java.math.BigInteger(hex.substring(0, 15), 16).longValue()
      assert(Md5Prefix60.compute(UTF8String.fromString(s)) == ref, s)
    }
  }

  private def bitmap(set: String): (Long, Long) = {
    var lo = 0L; var hi = 0L
    set.foreach(c => if (c < 64) lo |= 1L << c else hi |= 1L << (c - 64))
    (lo, hi)
  }

  test("CharClassCount runs/count/count_not == regex references") {
    val lower = "abcdefghijklmnopqrstuvwxyz"
    val word = lower + lower.toUpperCase + "0123456789 \t\n\u000b\f\r"
    val (wlo, whi) = bitmap(lower)
    val (dlo, dhi) = bitmap("0123456789")
    val (nlo, nhi) = bitmap(word)
    val (plo, phi) = bitmap(".!?,;:")
    forAllGen(texts) { s =>
      val u = UTF8String.fromString(s)
      assert(CharClassCount.compute(
        UTF8String.fromString(s.toLowerCase), 0, wlo, whi) ==
        "[a-z]+".r.findAllIn(s.toLowerCase).size, s)
      assert(CharClassCount.compute(u, 0, dlo, dhi) ==
        "[0-9]+".r.findAllIn(s).size, s)
      assert(CharClassCount.compute(u, 1, plo, phi) ==
        s.count(".!?,;:".contains(_)), s)
      assert(CharClassCount.compute(u, 2, nlo, nhi) ==
        "[^a-zA-Z0-9\\s]".r.findAllIn(s).size, s)
    }
  }

  test("WordShingles.shinglesOf: distinct, ordered, complete") {
    forAllGen(texts) { s =>
      val toks = s.trim.split("\\s+").toSeq
      val out = WordShingles.shinglesOf(s).toSeq
      if (toks.length < 3) assert(out == Seq(s), s)
      else assert(out == toks.sliding(3).map(_.mkString(" ")).toSeq.distinct, s)
    }
  }

  test("HourBucket.compute matches java.time for a wide instant range") {
    forAllGen(Gen.choose(-4e15.toLong, 4e15.toLong)) { micros =>
      val i = java.time.Instant.EPOCH.plus(micros, java.time.temporal.ChronoUnit.MICROS)
      val z = i.atZone(java.time.ZoneOffset.UTC)
      val ref = z.getYear * 1000000L + z.getMonthValue * 10000L +
        z.getDayOfMonth * 100L + z.getHour
      assert(HourBucket.compute(micros) == ref, micros)
    }
  }
}
