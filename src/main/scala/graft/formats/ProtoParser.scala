package graft.formats

import graft.formats.ProtoCodec._

import scala.collection.mutable

/** Minimal proto3 source-text → [[ProtoCodec.MessageDescriptor]]
  * compiler — the capability the reference ships a shaded Confluent
  * compiler for (`lib/kpipe-format-protobuf-confluent/.../
  * ConfluentProtobufDescriptorCompiler.java`): Confluent's registry
  * stores protobuf schemas as `.proto` source, so SR-mode decode must
  * turn source text into descriptors at runtime.
  *
  * Supported grammar (the subset registry schemas actually use):
  * `syntax`/`package`/`option`/`import` headers, top-level and nested
  * `message` definitions, scalar fields, `repeated`, `map<K,V>`,
  * message-type fields (same-file references), `enum` (decoded as
  * int), `reserved`, `oneof` (members become nullable columns plus a
  * trailing `which_<oneof>` tag column naming the set branch — see
  * [[ProtoCodec.MessageDescriptor]]), comments. Unsupported:
  * `extend`, groups, `service`.
  */
object ProtoParser {

  final case class Compiled(topLevel: List[MessageDescriptor],
                            byName: Map[String, MessageDescriptor]) {

    /** Message-index path → descriptor (Confluent dispatch table):
      * `[i]` = i-th top-level message, `[i, j]` = j-th nested message
      * of the i-th top-level message, recursively.
      */
    lazy val byIndexPath: Map[List[Int], MessageDescriptor] = {
      val out = mutable.Map.empty[List[Int], MessageDescriptor]
      def walk(prefix: List[Int], descs: List[MessageDescriptor],
               nested: Map[String, List[MessageDescriptor]]): Unit =
        descs.zipWithIndex.foreach { case (d, i) =>
          out(prefix :+ i) = d
          walk(prefix :+ i, nested.getOrElse(d.name, Nil), nested)
        }
      walk(Nil, topLevel, nestedChildren)
      out.toMap
    }
    private[ProtoParser] var nestedChildren: Map[String, List[MessageDescriptor]] = Map.empty
  }

  /** Compile proto3 source text. Throws IllegalArgumentException on
    * syntax errors with a token-position diagnostic.
    */
  def compile(source: String): Compiled = {
    val toks = tokenize(source)
    val p = new Parser(toks)
    // raw message AST: name → (fields, nested messages), in order
    final case class RawField(repeated: Boolean, tpe: String, mapKey: Option[String],
                              mapValue: Option[String], name: String, number: Int,
                              oneof: Option[String] = None)
    final case class RawMessage(name: String, fields: List[RawField],
                                nested: List[RawMessage], enums: Set[String])

    def parseMessage(): RawMessage = {
      p.expect("message")
      val name = p.ident()
      p.expect("{")
      val fields = mutable.ListBuffer.empty[RawField]
      val nested = mutable.ListBuffer.empty[RawMessage]
      val enums = mutable.Set.empty[String]
      while (p.peek != "}") {
        p.peek match {
          case "message" => nested += parseMessage()
          case "enum" =>
            p.next(); enums += p.ident(); p.expect("{")
            while (p.peek != "}") p.next()
            p.expect("}")
          case "reserved" | "option" =>
            while (p.peek != ";") p.next()
            p.expect(";")
          case "oneof" =>
            p.next()
            val oneofName = p.ident()
            p.expect("{")
            while (p.peek != "}") {
              if (p.peek == "option") {
                while (p.peek != ";") p.next()
                p.expect(";")
              } else {
                // members are plain fields on the wire; the oneof tag
                // drives which-branch tracking + presence semantics
                val tpe = p.next()
                val fname = p.ident()
                p.expect("=")
                val num = p.int()
                skipFieldOptions(p)
                p.expect(";")
                fields += RawField(repeated = false, tpe, None, None, fname, num,
                  oneof = Some(oneofName))
              }
            }
            p.expect("}")
          case _ =>
            val repeated = p.peek == "repeated"
            if (repeated) p.next()
            if (p.peek == "map") {
              p.next(); p.expect("<")
              val k = p.next()
              p.expect(",")
              val v = p.next()
              p.expect(">")
              val fname = p.ident()
              p.expect("=")
              val num = p.int()
              skipFieldOptions(p)
              p.expect(";")
              fields += RawField(repeated = false, "map", Some(k), Some(v), fname, num)
            } else {
              val tpe = p.next()
              val fname = p.ident()
              p.expect("=")
              val num = p.int()
              skipFieldOptions(p)
              p.expect(";")
              fields += RawField(repeated, tpe, None, None, fname, num)
            }
        }
      }
      p.expect("}")
      RawMessage(name, fields.toList, nested.toList, enums.toSet)
    }

    def skipFieldOptions(p: Parser): Unit =
      if (p.peek == "[") { while (p.peek != "]") p.next(); p.expect("]") }

    val topRaw = mutable.ListBuffer.empty[RawMessage]
    while (p.hasMore) {
      p.peek match {
        case "syntax" | "package" | "option" | "import" =>
          while (p.peek != ";") p.next()
          p.expect(";")
        case "enum" =>
          p.next(); p.ident(); p.expect("{")
          while (p.peek != "}") p.next()
          p.expect("}")
        case "message" => topRaw += parseMessage()
        case other => throw new IllegalArgumentException(s"unexpected top-level token '$other'")
      }
    }

    // two-pass resolution: collect all message names (qualified by
    // enclosing scope and bare), then build descriptors with lazy
    // message references so same-file type refs (incl. forward) work.
    val built = mutable.Map.empty[String, MessageDescriptor]
    val childIndex = mutable.Map.empty[String, List[MessageDescriptor]]
    val allEnums = mutable.Set.empty[String]
    def collectEnums(m: RawMessage): Unit = { allEnums ++= m.enums; m.nested.foreach(collectEnums) }
    topRaw.foreach(collectEnums)

    val rawByName = mutable.Map.empty[String, RawMessage]
    def indexRaw(m: RawMessage): Unit = { rawByName(m.name) = m; m.nested.foreach(indexRaw) }
    topRaw.foreach(indexRaw)

    def scalarType(t: String): Option[PType] = t match {
      case "int32" | "uint32" => Some(PInt32)
      case "int64" | "uint64" => Some(PInt64)
      case "sint32" => Some(PSInt32)
      case "sint64" => Some(PSInt64)
      case "bool" => Some(PBool)
      case "fixed32" | "sfixed32" => Some(PFixed32)
      case "fixed64" | "sfixed64" => Some(PFixed64)
      case "float" => Some(PFloat)
      case "double" => Some(PDouble)
      case "string" => Some(PString)
      case "bytes" => Some(PBytes)
      case _ => None
    }

    def build(m: RawMessage): MessageDescriptor = built.getOrElseUpdate(m.name, {
      val fields = m.fields.map { f =>
        val ptype: PType =
          if (f.tpe == "map") {
            val kt = scalarType(f.mapKey.get).getOrElse(
              throw new IllegalArgumentException(s"map key must be scalar: ${f.mapKey.get}"))
            val vt = resolve(f.mapValue.get)
            PMap(kt, vt)
          } else resolve(f.tpe)
        FieldDescriptor(f.number, f.name, ptype, f.repeated, f.oneof)
      }
      MessageDescriptor(m.name, fields)
    })

    def resolve(t: String): PType =
      scalarType(t).getOrElse {
        val bare = t.split('.').last
        if (allEnums.contains(bare)) PEnum
        else rawByName.get(bare) match {
          case Some(raw) => PMessage(build(raw))
          case None => throw new IllegalArgumentException(s"unresolved type '$t'")
        }
      }

    val top = topRaw.map(build).toList
    def buildChildren(m: RawMessage): Unit = {
      childIndex(m.name) = m.nested.map(build)
      m.nested.foreach(buildChildren)
    }
    topRaw.foreach(buildChildren)

    val compiled = Compiled(top, built.toMap)
    compiled.nestedChildren = childIndex.toMap
    compiled
  }

  // ------------------------------------------------------------------ //
  // Lexer                                                              //
  // ------------------------------------------------------------------ //

  private def tokenize(src: String): Vector[String] = {
    val noBlock = "(?s)/\\*.*?\\*/".r.replaceAllIn(src, " ")
    val noLine = "//[^\n]*".r.replaceAllIn(noBlock, " ")
    val noStrings = "\"[^\"]*\"".r.replaceAllIn(noLine, "\"\"")
    "[A-Za-z_][A-Za-z0-9_.]*|\\d+|\"\"|[{}<>=;,\\[\\]]".r
      .findAllIn(noStrings).toVector
  }

  private final class Parser(toks: Vector[String]) {
    private var i = 0
    def hasMore: Boolean = i < toks.length
    def peek: String =
      if (i < toks.length) toks(i)
      else throw new IllegalArgumentException("unexpected end of input")
    def next(): String = { val t = peek; i += 1; t }
    def expect(t: String): Unit = {
      val got = next()
      if (got != t) throw new IllegalArgumentException(
        s"expected '$t' but found '$got' at token $i")
    }
    def ident(): String = {
      val t = next()
      if (!t.head.isLetter && t.head != '_')
        throw new IllegalArgumentException(s"expected identifier, found '$t'")
      t
    }
    def int(): Int = next().toInt
  }
}
