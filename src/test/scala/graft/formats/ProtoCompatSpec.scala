package graft.formats

import graft.formats.ProtoCodec._
import org.scalatest.funsuite.AnyFunSuite

class ProtoCompatSpec extends AnyFunSuite {

  private def msg(name: String, fs: FieldDescriptor*) =
    MessageDescriptor(name, fs)

  test("renames, removals, and additions are wire-safe") {
    val old = msg("M", FieldDescriptor(1, "a", PInt32),
      FieldDescriptor(2, "b", PString))
    val renamedDropAdd = msg("M", FieldDescriptor(1, "a_renamed", PInt32),
      FieldDescriptor(3, "c", PBool))
    assert(ProtoCompat.canEvolve(old, renamedDropAdd).isEmpty)
  }

  test("varint family interchanges; zigzag does not cross into it") {
    val old = msg("M", FieldDescriptor(1, "a", PInt32),
      FieldDescriptor(2, "b", PSInt32))
    val ok = msg("M", FieldDescriptor(1, "a", PInt64),
      FieldDescriptor(2, "b", PSInt64))
    assert(ProtoCompat.canEvolve(old, ok).isEmpty)
    val bad = msg("M", FieldDescriptor(1, "a", PSInt32),
      FieldDescriptor(2, "b", PInt32))
    val errs = ProtoCompat.canEvolve(old, bad)
    assert(errs.size === 2)
    assert(errs.forall(_.reason.contains("wire class")))
  }

  test("fixed/float classes never interchange with varints or each other") {
    val old = msg("M", FieldDescriptor(1, "a", PFixed32),
      FieldDescriptor(2, "b", PFloat))
    assert(ProtoCompat.canEvolve(old,
      msg("M", FieldDescriptor(1, "a", PInt32))).nonEmpty)
    assert(ProtoCompat.canEvolve(old,
      msg("M", FieldDescriptor(2, "b", PDouble))).nonEmpty)
    assert(ProtoCompat.canEvolve(old,
      msg("M", FieldDescriptor(1, "a", PFixed32),
        FieldDescriptor(2, "b", PFloat))).isEmpty)
  }

  test("string/bytes and bytes/message interchange; nested recursion") {
    val inner = msg("I", FieldDescriptor(1, "x", PInt32))
    val old = msg("M", FieldDescriptor(1, "s", PString),
      FieldDescriptor(2, "m", PMessage(inner)))
    val ok = msg("M", FieldDescriptor(1, "s", PBytes),
      FieldDescriptor(2, "m", PBytes))
    assert(ProtoCompat.canEvolve(old, ok).isEmpty)
    // nested type break surfaces with the nested path
    val innerBad = msg("I", FieldDescriptor(1, "x", PFloat))
    val bad = msg("M", FieldDescriptor(1, "s", PString),
      FieldDescriptor(2, "m", PMessage(innerBad)))
    val errs = ProtoCompat.canEvolve(old, bad)
    assert(errs.exists(e => e.path.contains(".m(#2).x(#1)")))
  }

  test("repeated flip: fine for LEN types, fatal for packed scalars") {
    val old = msg("M", FieldDescriptor(1, "s", PString),
      FieldDescriptor(2, "n", PInt32))
    val ok = msg("M", FieldDescriptor(1, "s", PString, repeated = true),
      FieldDescriptor(2, "n", PInt32))
    assert(ProtoCompat.canEvolve(old, ok).isEmpty)
    val bad = msg("M", FieldDescriptor(1, "s", PString),
      FieldDescriptor(2, "n", PInt32, repeated = true))
    assert(ProtoCompat.canEvolve(old, bad)
      .exists(_.reason.contains("packed")))
  }

  test("moving an existing field into or out of a oneof is flagged") {
    val old = msg("M", FieldDescriptor(1, "a", PInt32),
      FieldDescriptor(2, "b", PString, oneofName = Some("pick")))
    val into = msg("M",
      FieldDescriptor(1, "a", PInt32, oneofName = Some("pick")),
      FieldDescriptor(2, "b", PString, oneofName = Some("pick")))
    assert(ProtoCompat.canEvolve(old, into)
      .exists(_.reason.contains("INTO oneof")))
    val outOf = msg("M", FieldDescriptor(1, "a", PInt32),
      FieldDescriptor(2, "b", PString))
    assert(ProtoCompat.canEvolve(old, outOf)
      .exists(_.reason.contains("OUT of oneof")))
  }

  test("map key/value classes are held") {
    val old = msg("M",
      FieldDescriptor(1, "m", PMap(PString, PInt32)))
    assert(ProtoCompat.canEvolve(old,
      msg("M", FieldDescriptor(1, "m", PMap(PBytes, PInt64)))).isEmpty)
    assert(ProtoCompat.canEvolve(old,
      msg("M", FieldDescriptor(1, "m", PMap(PString, PFloat))))
      .exists(_.path.contains("<value>")))
  }
}
