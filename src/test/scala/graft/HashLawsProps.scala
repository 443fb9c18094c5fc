package graft

import org.scalacheck.{Gen, Prop, Properties}
import graft.functions.{PortableHash64, RollingHash}

/** ScalaCheck laws for the two native hash Expressions, checked against
  * independent JVM references (BigInteger fold / MessageDigest + hex
  * parse) — no Spark session, pure eval-path coverage.
  */
object HashLawsProps extends Properties("NativeHashes") {

  private val genStr: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr,
    Gen.listOf(Gen.oneOf(Gen.alphaNumChar, Gen.oneOf('ü', 'ø', '∂', '\t', ' '))).map(_.mkString))

  // (base, mod) pairs across the legal space the fromExprs overflow
  // guard admits: (mod-1)*base + 255 <= Long.MaxValue
  private val genBaseMod: Gen[(Long, Long)] = for {
    base <- Gen.choose(2L, 100000L)
    mod <- Gen.choose(2L, (Long.MaxValue - 255) / base + 1)
  } yield (base, mod)

  property("RollingHash.nullSafeEval equals the BigInteger fold for ANY legal (base, mod)") =
    Prop.forAll(genStr, genBaseMod) { case (s, (base, mod)) =>
      val got = RollingHash(null, base, mod)
        .nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .asInstanceOf[Long]
      val m = java.math.BigInteger.valueOf(mod)
      val b = java.math.BigInteger.valueOf(base)
      val want = s.getBytes("UTF-8").foldLeft(java.math.BigInteger.ZERO) { (acc, by) =>
        acc.multiply(b).add(java.math.BigInteger.valueOf(by & 0xff)).mod(m)
      }.longValueExact()
      got == want
    }

  private def evalPortable(salt: String, v: String): Long = {
    val u = org.apache.spark.unsafe.types.UTF8String.fromString _
    PortableHash64(null, null).nullSafeEval(u(salt), u(v)).asInstanceOf[Long]
  }

  property("PortableHash64.nullSafeEval equals parsing the first 15 md5 hex chars of salt:value") =
    Prop.forAll(genStr, genStr) { (salt, v) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"$salt:$v".getBytes("UTF-8")).map(x => f"$x%02x").mkString
      evalPortable(salt, v) == java.lang.Long.parseLong(hex.take(15), 16)
    }

  property("shared MessageDigest resets between calls (no state leak across rows)") =
    Prop.forAll(genStr, genStr) { (a, b) =>
      val e = PortableHash64(null, null) // ONE expression instance, two rows
      val u = org.apache.spark.unsafe.types.UTF8String.fromString _
      val first = e.nullSafeEval(u("x"), u(a)).asInstanceOf[Long]
      e.nullSafeEval(u("y"), u(b)) // interleave another row
      first == e.nullSafeEval(u("x"), u(a)).asInstanceOf[Long]
    }

  property("portable hash lands in [0, 2^60) — the KMV estimator domain") =
    Prop.forAll(genStr) { s =>
      val h = evalPortable("d", s)
      h >= 0L && h < (1L << 60)
    }
}
