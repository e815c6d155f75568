package graft.formats

import graft.formats.ProtoCodec._

/** Protobuf wire-evolution checker — can data encoded with `oldD` be
  * decoded by `newD`'s descriptor (and vice versa on the shared
  * numbers)? Implements the rules of the public protobuf language
  * guide ("Updating A Message Type",
  * protobuf.dev/programming-guides/proto3):
  *
  *  - fields are identified by NUMBER; renames are wire-safe,
  *    removals and additions are wire-safe (unknown fields skip);
  *  - a number that stays must keep a wire-compatible type:
  *    int32/int64/bool/enum interchange (varint, truncation rules);
  *    sint32/sint64 interchange with each other but NOT with the
  *    plain varints (ZigZag reinterprets the bits); fixed32 and
  *    fixed64 families stay put; float/double never interchange
  *    with integers or each other;
  *  - string↔bytes interchange (valid-UTF-8 caveat), and
  *    bytes↔embedded-message interchange (a message is its encoded
  *    bytes);
  *  - flipping singular↔repeated is safe for string/bytes/message
  *    (LEN wire either way) but NOT for packed-capable scalars
  *    (packed repeated writes ONE length-delimited record a
  *    singular reader cannot parse);
  *  - moving an EXISTING field into (or out of) a `oneof` is
  *    flagged: the guide marks it unsafe (clients disagree on
  *    which-field-wins semantics);
  *  - nested messages recurse by number; map fields must keep their
  *    key/value wire classes.
  *
  * Returns every incompatibility with its field path — empty means
  * the evolution is wire-safe. The companion of [[SchemaCompat]]
  * for the registry's protobuf subjects, next to the
  * [[ProtoParser]] `.proto` compiler that produces the descriptors.
  */
object ProtoCompat {

  final case class Incompat(path: String, reason: String)

  private sealed trait Wire
  private case object Varint extends Wire // int32/int64/bool/enum
  private case object ZigZag extends Wire // sint32/sint64
  private case object Fix32 extends Wire
  private case object Fix64 extends Wire
  private case object F32 extends Wire    // float
  private case object F64 extends Wire    // double
  private case object Len extends Wire    // string/bytes
  private case object Msg extends Wire
  private case object MapW extends Wire

  private def wire(t: PType): Wire = t match {
    case PInt32 | PInt64 | PBool | PEnum => Varint
    case PSInt32 | PSInt64               => ZigZag
    case PFixed32                        => Fix32
    case PFixed64                        => Fix64
    case PFloat                          => F32
    case PDouble                         => F64
    case PString | PBytes                => Len
    case _: PMessage                     => Msg
    case _: PMap                         => MapW
  }

  /** Packed-capable scalars: repeated encodes as ONE LEN record. */
  private def packable(t: PType): Boolean = wire(t) match {
    case Varint | ZigZag | Fix32 | Fix64 | F32 | F64 => true
    case _ => false
  }

  def canEvolve(oldD: MessageDescriptor,
                newD: MessageDescriptor): Seq[Incompat] =
    checkMessage(oldD, newD, "$")

  private def checkMessage(o: MessageDescriptor, n: MessageDescriptor,
                           path: String): Seq[Incompat] =
    o.fields.flatMap { of =>
      n.byNumber.get(of.number) match {
        case None => Seq.empty // removal: unknown-field skip
        case Some(nf) =>
          val p = s"$path.${nf.name}(#${of.number})"
          checkType(of.ptype, nf.ptype, p) ++
            checkCardinality(of, nf, p) ++
            checkOneof(of, nf, p)
      }
    }
    // new-only numbers are additions: wire-safe

  private def checkType(o: PType, n: PType, p: String): Seq[Incompat] =
    (o, n) match {
      case (PMessage(od), PMessage(nd)) => checkMessage(od, nd, p)
      case (PMap(ok2, ov), PMap(nk, nv)) =>
        checkType(ok2, nk, s"$p<key>") ++ checkType(ov, nv, s"$p<value>")
      // a message is interchangeable with its encoded bytes
      case (_: PMessage, PBytes) | (PBytes, _: PMessage) => Seq.empty
      case _ if wire(o) == wire(n) => Seq.empty
      case _ => Seq(Incompat(p,
        s"wire class ${wire(o)} cannot evolve to ${wire(n)}"))
    }

  private def checkCardinality(of: FieldDescriptor, nf: FieldDescriptor,
                               p: String): Seq[Incompat] =
    if (of.repeated == nf.repeated) Seq.empty
    else if (packable(of.ptype) || packable(nf.ptype))
      Seq(Incompat(p, "singular/repeated flip on a packed-capable " +
        "scalar: packed repeated is one LEN record a singular reader " +
        "cannot parse"))
    else Seq.empty // string/bytes/message: LEN either way

  private def checkOneof(of: FieldDescriptor, nf: FieldDescriptor,
                         p: String): Seq[Incompat] =
    (of.oneofName, nf.oneofName) match {
      case (None, Some(o)) => Seq(Incompat(p,
        s"existing field moved INTO oneof '$o' (unsafe per the " +
          "language guide: which-field-wins semantics diverge)"))
      case (Some(o), None) => Seq(Incompat(p,
        s"field moved OUT of oneof '$o' (same hazard, reversed)"))
      case _ => Seq.empty
    }
}
