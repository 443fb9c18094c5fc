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

  property("RollingHash.nullSafeEval equals the BigInteger fold over utf-8 bytes") =
    Prop.forAll(genStr) { s =>
      val got = RollingHash(null, RollingHash.DefaultBase, RollingHash.DefaultMod)
        .nullSafeEval(org.apache.spark.unsafe.types.UTF8String.fromString(s))
        .asInstanceOf[Long]
      val m = java.math.BigInteger.valueOf(RollingHash.DefaultMod)
      val b = java.math.BigInteger.valueOf(RollingHash.DefaultBase)
      val want = s.getBytes("UTF-8").foldLeft(java.math.BigInteger.ZERO) { (acc, by) =>
        acc.multiply(b).add(java.math.BigInteger.valueOf(by & 0xff)).mod(m)
      }.longValueExact()
      got == want
    }

  property("PortableHash64.first60Bits equals parsing the first 15 md5 hex chars") =
    Prop.forAll(genStr, genStr) { (salt, v) =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(s"$salt:$v".getBytes("UTF-8"))
      val hex = digest.map(x => f"$x%02x").mkString
      PortableHash64.first60Bits(digest) == java.lang.Long.parseLong(hex.take(15), 16)
    }

  property("portable hash lands in [0, 2^60) — the KMV estimator domain") =
    Prop.forAll(genStr) { s =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val h = PortableHash64.first60Bits(md.digest(s.getBytes("UTF-8")))
      h >= 0L && h < (1L << 60)
    }
}
