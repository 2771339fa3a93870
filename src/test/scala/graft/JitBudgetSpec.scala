package graft

import org.scalatest.funsuite.AnyFunSuite
import java.io.{DataInputStream, BufferedInputStream, FileInputStream}
import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

/** Guards the JVM JIT budget: HotSpot NEVER compiles a method whose bytecode
  * exceeds 8,000 bytes (-XX:DontCompileHugeMethods, on by default) — it runs
  * interpreted forever. Round 5 hit this silently: small additions pushed
  * `NerFeaturesFast.idsAt` to 8,196 bytes and the whole tagging path ran at
  * 4.4× CPU with utilization ≈ 1.0 and clean GC, indistinguishable from a
  * degraded host by every load gate. This spec parses every compiled graft
  * class file directly (constant pool walk → method Code attributes) and
  * fails if any method's code_length crosses a 7,500-byte budget, naming the
  * offender — so the next cold-branch addition to a hot method fails the
  * suite instead of shipping an interpreted engine.
  */
class JitBudgetSpec extends AnyFunSuite {

  private val Budget = 7500

  /** (method name+descriptor, code_length) pairs of one class file. */
  private def methodSizes(p: Path): Seq[(String, Int)] = {
    val in = new DataInputStream(new BufferedInputStream(new FileInputStream(p.toFile)))
    try {
      require(in.readInt() == 0xcafebabe, s"not a class file: $p")
      in.readInt() // version
      val cpCount = in.readUnsignedShort()
      val utf8 = new Array[String](cpCount)
      var i = 1
      while (i < cpCount) {
        val tag = in.readUnsignedByte()
        tag match {
          case 1 => utf8(i) = in.readUTF()
          case 7 | 8 | 16 | 19 | 20 => in.skipBytes(2)
          case 15 => in.skipBytes(3)
          case 3 | 4 | 9 | 10 | 11 | 12 | 17 | 18 => in.skipBytes(4)
          case 5 | 6 => in.skipBytes(8); i += 1 // long/double take two slots
          case t => fail(s"unknown constant pool tag $t in $p")
        }
        i += 1
      }
      in.skipBytes(6) // access, this, super
      in.skipBytes(2 * in.readUnsignedShort()) // interfaces
      def skipAttributes(): Unit = {
        val n = in.readUnsignedShort()
        var k = 0
        while (k < n) { in.skipBytes(2); in.skipBytes(in.readInt()); k += 1 }
      }
      // fields
      val nFields = in.readUnsignedShort()
      var f = 0
      while (f < nFields) { in.skipBytes(6); skipAttributes(); f += 1 }
      // methods: find each Code attribute's code_length
      val nMethods = in.readUnsignedShort()
      val out = Seq.newBuilder[(String, Int)]
      var m = 0
      while (m < nMethods) {
        in.skipBytes(2)
        val nameIdx = in.readUnsignedShort()
        val descIdx = in.readUnsignedShort()
        val nAttr = in.readUnsignedShort()
        var size = 0
        var a = 0
        while (a < nAttr) {
          val attrName = utf8(in.readUnsignedShort())
          val len = in.readInt()
          if (attrName == "Code") {
            in.skipBytes(4) // max_stack, max_locals
            size = in.readInt()
            in.skipBytes(len - 8)
          } else in.skipBytes(len)
          a += 1
        }
        out += ((utf8(nameIdx) + utf8(descIdx), size))
        m += 1
      }
      out.result()
    } finally in.close()
  }

  test(s"no graft method exceeds the $Budget-byte JIT budget (HotSpot huge-method limit is 8000)") {
    val root = Paths.get("target/scala-2.13/classes/graft")
    assert(Files.isDirectory(root), s"compiled classes not found at $root — run from the repo root")
    val offenders = Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".class"))
      .flatMap { p =>
        methodSizes(p).collect { case (meth, size) if size > Budget =>
          (p.toString.stripPrefix("target/scala-2.13/classes/"), meth.takeWhile(_ != '('), size)
        }
      }.toSeq
    val biggest = Files.walk(root).iterator().asScala
      .filter(_.toString.endsWith(".class"))
      .flatMap(p => methodSizes(p).map { case (m, s) => (s, p.getFileName.toString, m.takeWhile(_ != '(')) })
      .toSeq.sorted.reverse.take(3)
    info(s"largest methods: ${biggest.map { case (s, c, m) => s"$c.$m=$s" }.mkString(", ")}")
    assert(offenders.isEmpty,
      s"methods over the JIT budget (extract cold branches into helpers, emission order preserved): " +
        offenders.map { case (c, m, s) => s"$c $m ($s bytes)" }.mkString("; "))
  }
}
