package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.unsafe.hash.Murmur3_x86_32
import org.apache.spark.unsafe.types.UTF8String
import graft.functions.Murmur3Ops

/** Canonical Murmur3_x86_32 vectors + cross-check against Spark's
  * implementation on the block path (lengths % 4 == 0, where Spark's
  * lenient tail handling never kicks in and both must agree exactly).
  */
class Murmur3Spec extends AnyFunSuite {

  private def h(bytes: Array[Byte], seed: Int): Int = Murmur3Ops.hashBytes(bytes, seed)
  private def hs(s: String, seed: Int): Int = h(s.getBytes("UTF-8"), seed)

  test("canonical empty-input vectors") {
    assert(h(Array.empty, 0) === 0)
    assert(h(Array.empty, 1) === 0x514E28B7)
    assert(h(Array.empty, 0xffffffff) === 0x81F16F39)
  }

  test("canonical byte-tail vectors (seed 0)") {
    assert(h(Array(0xff, 0xff, 0xff, 0xff).map(_.toByte), 0) === 0x76293B50)
    assert(h(Array(0x21, 0x43, 0x65, 0x87).map(_.toByte), 0) === 0xF55B516B)
    assert(h(Array(0x21, 0x43, 0x65).map(_.toByte), 0) === 0x7E4A8634)
    assert(h(Array(0x21, 0x43).map(_.toByte), 0) === 0xA0F7B07A)
    assert(h(Array(0x21).map(_.toByte), 0) === 0x72661CF4)
  }

  test("canonical string vectors (seed 0x9747b28c)") {
    val seed = 0x9747b28c
    assert(hs("aaaa", seed) === 0x5A97808A)
    assert(hs("aaa", seed) === 0x283E0130)
    assert(hs("aa", seed) === 0x5D211726)
    assert(hs("a", seed) === 0x7FA09EA6)
    assert(hs("abcd", seed) === 0xF0478627)
    assert(hs("abc", seed) === 0xC84A62DD)
    assert(hs("ab", seed) === 0x74875592)
    assert(hs("Hello, world!", seed) === 0x24884CBA)
    assert(hs("The quick brown fox jumps over the lazy dog", seed) === 0x2FA826CD)
  }

  test("agrees with Spark Murmur3_x86_32 on 4-byte-multiple inputs") {
    val rnd = new scala.util.Random(42)
    (1 to 500).foreach { _ =>
      val n = rnd.nextInt(17) * 4
      val s = Seq.fill(n)(('a' + rnd.nextInt(26)).toChar).mkString
      val seed = rnd.nextInt()
      val u = UTF8String.fromString(s)
      val expected = Murmur3_x86_32.hashUnsafeBytes(
        u.getBaseObject, u.getBaseOffset, u.numBytes, seed)
      assert(Murmur3Ops.hashString(u, seed) === expected, s"input=$s seed=$seed")
    }
  }

  test("deterministic and seed-sensitive") {
    assert(hs("user@example.org", 666) === hs("user@example.org", 666))
    assert(hs("user@example.org", 666) !== hs("user@example.org", 667))
  }
}
