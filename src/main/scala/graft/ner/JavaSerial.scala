package graft.ner

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import scala.collection.mutable

/** Minimal generic reader for the Java Object Serialization Stream Protocol
  * (the publicly specified wire format: Java Object Serialization
  * Specification, ch. 6 — grammar of TC_OBJECT / TC_CLASSDESC / handles /
  * block data). It parses a stream WITHOUT the originating classes on the
  * classpath: class descriptors in the stream fully describe default-
  * serialized fields, so objects come back as generic (className, field map)
  * records.
  *
  * Classes that override writeObject (SC_WRITE_METHOD) append custom data as
  * an "object annotation"; we capture it generically (block-data segments as
  * byte arrays, nested objects parsed recursively so handle numbering stays
  * correct) and interpret it only for the well-known JDK collections whose
  * serialized forms are fixed by compatibility: ArrayList, HashMap, HashSet
  * (+ LinkedHashMap/LinkedHashSet/Hashtable sharing those layouts).
  *
  * Scope: exactly what reference-serialized CRF classifier bundles need
  * (CRFClassifier.serializeClassifier, /root/reference/src/edu/stanford/nlp/
  * ie/crf/CRFClassifier.java:1541-1571); proxies, externalizable and enum
  * constants are rejected with a clear error.
  */
object JavaSerial {

  // stream constants (public protocol)
  private final val StreamMagic = 0xaced
  private final val StreamVersion = 5
  private final val TcNull = 0x70
  private final val TcReference = 0x71
  private final val TcClassDesc = 0x72
  private final val TcObject = 0x73
  private final val TcString = 0x74
  private final val TcArray = 0x75
  private final val TcClass = 0x76
  private final val TcBlockData = 0x77
  private final val TcEndBlockData = 0x78
  private final val TcReset = 0x79
  private final val TcBlockDataLong = 0x7a
  private final val TcException = 0x7b
  private final val TcLongString = 0x7c
  private final val TcProxyClassDesc = 0x7d
  private final val TcEnum = 0x7e
  private final val ScWriteMethod = 0x01
  private final val ScSerializable = 0x02
  private final val ScExternalizable = 0x04

  final case class FieldDesc(typeCode: Char, name: String, className: String)

  /** An enum constant: TC_ENUM classDesc newHandle constantName. */
  final case class JEnum(className: String, constant: String)

  final class ClassDesc(val name: String, val suid: Long) {
    var flags: Int = 0
    var fields: Array[FieldDesc] = Array.empty
    var superDesc: ClassDesc = _
    /** super-first chain for classdata order. */
    def chain: List[ClassDesc] = (if (superDesc == null) Nil else superDesc.chain) :+ this
    override def toString = s"ClassDesc($name)"
  }

  /** A default-serialized object: field values merged across the hierarchy
    * (duplicate names keep the most-derived class's value), plus captured
    * writeObject annotations per class (byte arrays for block data, parsed
    * values for nested objects).
    */
  final class JObj(val desc: ClassDesc) {
    val fields = new mutable.LinkedHashMap[String, Any]()
    val annotations = mutable.ArrayBuffer[Any]()
    def className: String = desc.name
    def apply(name: String): Any = fields.getOrElse(name,
      throw new IllegalArgumentException(s"$className has no field '$name' (has: ${fields.keys.mkString(",")})"))
    override def toString = s"JObj($className)"
  }

  final class Reader(in0: InputStream) {
    private val in = new DataInputStream(new BufferedInputStream(in0, 1 << 16))
    private val handles = mutable.ArrayBuffer[Any]()

    require(in.readUnsignedShort() == StreamMagic, "not a Java serialization stream (bad magic)")
    require(in.readUnsignedShort() == StreamVersion, "unsupported serialization stream version")

    private def fail(msg: String): Nothing = throw new IllegalArgumentException(s"JavaSerial: $msg")

    /** Read the next stream content as an object reference (no block data
      * allowed here — use readBlockInt for raw writeInt values).
      */
    def readObject(): Any = readObject(in.readUnsignedByte())

    private def readObject(tc: Int): Any = tc match {
      case TcNull => null
      case TcReference =>
        val h = in.readInt() - 0x7e0000
        if (h < 0 || h >= handles.length) fail(s"bad handle $h")
        handles(h)
      case TcString =>
        val s = in.readUTF(); handles += s; s
      case TcLongString =>
        val len = in.readLong()
        if (len > Int.MaxValue - 16) fail("long string too large")
        val bytes = new Array[Byte](len.toInt); in.readFully(bytes)
        val s = new String(bytes, "UTF-8") // modified-UTF8 ~ UTF-8 for BMP text
        handles += s; s
      case TcObject => readOrdinaryObject()
      case TcArray => readArray()
      case TcClass =>
        val d = readClassDesc(); handles += d; d
      case TcClassDesc | TcProxyClassDesc => readClassDesc(tc)
      case TcEnum =>
        val desc = readClassDesc()
        val slot = handles.length
        handles += null // enum handle precedes its constant-name string
        val const = readObject().asInstanceOf[String]
        val e = JEnum(if (desc == null) "?" else desc.name, const)
        handles(slot) = e
        e
      case TcException => fail("stream recorded a serialization exception")
      case TcReset => handles.clear(); readObject()
      case TcBlockData | TcBlockDataLong => fail("unexpected block data where an object was required")
      case other => fail(f"unknown type code 0x$other%02x")
    }

    private def readClassDesc(): ClassDesc = readClassDesc(in.readUnsignedByte())

    private def readClassDesc(tc: Int): ClassDesc = tc match {
      case TcNull => null
      case TcReference =>
        val h = in.readInt() - 0x7e0000
        handles(h) match {
          case d: ClassDesc => d
          case o => fail(s"handle $h is not a class descriptor: $o")
        }
      case TcProxyClassDesc => fail("dynamic proxy class descriptors not supported")
      case TcClassDesc =>
        val name = in.readUTF()
        val suid = in.readLong()
        val d = new ClassDesc(name, suid)
        handles += d // handle assigned BEFORE flags/fields/super (spec order)
        d.flags = in.readUnsignedByte()
        if ((d.flags & ScExternalizable) != 0) fail(s"$name is Externalizable — unsupported")
        val n = in.readUnsignedShort()
        d.fields = Array.fill(n) {
          val t = in.readUnsignedByte().toChar
          val fname = in.readUTF()
          val cls = if (t == 'L' || t == '[') readObject().asInstanceOf[String] else null
          FieldDesc(t, fname, cls)
        }
        skipOrCaptureAnnotation(null) // classAnnotation (rarely used; discard)
        d.superDesc = readClassDesc()
        d
      case other => fail(f"bad classdesc type code 0x$other%02x")
    }

    /** Read contents until TC_ENDBLOCKDATA; if sink is non-null, append each
      * item (Array[Byte] for block segments, parsed value for objects).
      */
    private def skipOrCaptureAnnotation(sink: mutable.ArrayBuffer[Any]): Unit = {
      while (true) {
        val tc = in.readUnsignedByte()
        tc match {
          case TcEndBlockData => return
          case TcBlockData =>
            val len = in.readUnsignedByte()
            val b = new Array[Byte](len); in.readFully(b)
            if (sink != null) sink += b
          case TcBlockDataLong =>
            val len = in.readInt()
            val b = new Array[Byte](len); in.readFully(b)
            if (sink != null) sink += b
          case other =>
            val v = readObject(other) // must parse (handle numbering) even if discarded
            if (sink != null) sink += v
        }
      }
    }

    private def readOrdinaryObject(): Any = {
      val desc = readClassDesc()
      if (desc == null) fail("object with null class descriptor")
      val obj = new JObj(desc)
      handles += obj // handle BEFORE field data (cycles)
      for (d <- desc.chain) {
        if ((d.flags & ScSerializable) != 0) {
          for (f <- d.fields) obj.fields(f.name) = readFieldValue(f)
          if ((d.flags & ScWriteMethod) != 0) skipOrCaptureAnnotation(obj.annotations)
        } else {
          // NOT serializable at this level (fields written by writeObject only)
          if ((d.flags & ScWriteMethod) != 0) skipOrCaptureAnnotation(obj.annotations)
        }
      }
      obj
    }

    private def readFieldValue(f: FieldDesc): Any = f.typeCode match {
      case 'B' => in.readByte()
      case 'C' => in.readChar()
      case 'D' => in.readDouble()
      case 'F' => in.readFloat()
      case 'I' => in.readInt()
      case 'J' => in.readLong()
      case 'S' => in.readShort()
      case 'Z' => in.readBoolean()
      case 'L' | '[' => readObject()
      case t => fail(s"unknown field type code '$t'")
    }

    private def readArray(): Any = {
      val desc = readClassDesc()
      val size = {
        // handle assigned before size per spec
        val slot = handles.length
        handles += null
        val s = in.readInt()
        (slot, s)
      }
      val (slot, n) = size
      val out: Any = desc.name match {
        case "[B" => val a = new Array[Byte](n); in.readFully(a); a
        case "[C" => Array.fill(n)(in.readChar())
        case "[D" => Array.fill(n)(in.readDouble())
        case "[F" => Array.fill(n)(in.readFloat())
        case "[I" => Array.fill(n)(in.readInt())
        case "[J" => Array.fill(n)(in.readLong())
        case "[S" => Array.fill(n)(in.readShort())
        case "[Z" => Array.fill(n)(in.readBoolean())
        case _ => Array.fill[Any](n)(readObject())
      }
      handles(slot) = out
      out
    }

    /** Raw writeInt at top level (e.g. CRFClassifier's windowSize) arrives as
      * a block-data segment.
      */
    def readBlockInt(): Int = {
      val tc = in.readUnsignedByte()
      val len = tc match {
        case TcBlockData => in.readUnsignedByte()
        case TcBlockDataLong => in.readInt()
        case other => fail(f"expected block data for raw int, got 0x$other%02x")
      }
      if (len < 4) fail(s"block data too short for an int: $len")
      val v = in.readInt()
      in.skipBytes(len - 4)
      v
    }
  }

  // ---- interpreters for well-known JDK collection layouts ----

  private def dataOf(bytes: Seq[Any]): DataInputStream = {
    val all = bytes.collect { case b: Array[Byte] => b }.toArray.flatten
    new DataInputStream(new java.io.ByteArrayInputStream(all))
  }

  /** Elements of a serialized ArrayList/LinkedList/Vector-like annotation:
    * everything in the annotation that is not raw block data.
    */
  private def annObjects(o: JObj): Vector[Any] =
    o.annotations.iterator.filterNot(_.isInstanceOf[Array[Byte]]).toVector

  def asList(v: Any): Vector[Any] = v match {
    case o: JObj if o.className == "java.util.ArrayList" =>
      val size = o("size").asInstanceOf[Int]
      val els = annObjects(o)
      require(els.length == size, s"ArrayList size $size != ${els.length} annotation elements")
      els
    case o: JObj => throw new IllegalArgumentException(s"not a supported List: ${o.className}")
    case other => throw new IllegalArgumentException(s"not a List: $other")
  }

  def asMap(v: Any): Vector[(Any, Any)] = v match {
    case o: JObj if o.className.startsWith("java.util.") && o.className.endsWith("HashMap") ||
        (v match { case j: JObj => j.className == "java.util.Hashtable"; case _ => false }) =>
      val d = dataOf(o.annotations.toSeq)
      d.readInt() // buckets / capacity
      val size = d.readInt()
      val els = annObjects(o)
      require(els.length == 2 * size, s"${o.className} size $size != ${els.length / 2} entries")
      els.grouped(2).map(p => (p(0), p(1))).toVector
    case o: JObj => throw new IllegalArgumentException(s"not a supported Map: ${o.className}")
    case other => throw new IllegalArgumentException(s"not a Map: $other")
  }

  def asSet(v: Any): Vector[Any] = v match {
    case o: JObj if o.className == "java.util.HashSet" || o.className == "java.util.LinkedHashSet" =>
      val d = dataOf(o.annotations.toSeq)
      d.readInt() // capacity
      d.readFloat() // load factor
      val size = d.readInt()
      val els = annObjects(o)
      require(els.length == size, s"${o.className} size $size != ${els.length} elements")
      els
    case o: JObj => throw new IllegalArgumentException(s"not a supported Set: ${o.className}")
    case other => throw new IllegalArgumentException(s"not a Set: $other")
  }
}
