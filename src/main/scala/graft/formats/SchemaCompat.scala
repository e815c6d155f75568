package graft.formats

import org.apache.avro.Schema

import scala.jdk.CollectionConverters._

/** Avro schema-evolution compatibility checker — the client-side
  * mirror of the registry's BACKWARD check: can data written with
  * `writer` be read as `reader`? Implements the resolution rules of
  * the public Avro specification ("Schema Resolution" section;
  * avro.apache.org/docs/1.12.0/specification) over parsed
  * `org.apache.avro.Schema` trees:
  *
  *  - primitives must match, modulo the spec's promotions
  *    (int→long/float/double, long→float/double, float→double,
  *    string↔bytes);
  *  - records match by full name (or reader alias); each reader
  *    field is matched by name (or its aliases) against the writer,
  *    and a reader field absent from the writer must carry a
  *    default;
  *  - enums match by name; writer symbols missing from the reader
  *    are errors unless the reader declares an enum default;
  *  - fixed match by name AND size; arrays/maps recurse on their
  *    element/value schemas;
  *  - unions: a writer union requires EVERY branch readable (any
  *    branch can appear in the data); a reader union accepts a
  *    writer schema readable as AT LEAST ONE branch.
  *
  * Returns every incompatibility with its JSON-path-style location —
  * an empty result means compatible. Recursive record types are
  * guarded by the visited (reader, writer) name-pair set.
  *
  * Reference scope: kpipe's registry modes delegate this check to
  * the Confluent server (`lib/kpipe-format-avro`); a pipeline
  * validating subjects BEFORE deploy needs it client-side, next to
  * the [[AvroCodec]] evolution decode that consumes the result.
  */
object SchemaCompat {

  final case class Incompat(path: String, reason: String)

  /** Check reader-can-read-writer; empty = compatible. */
  def canRead(readerJson: String, writerJson: String): Seq[Incompat] = {
    val p1 = new Schema.Parser()
    val p2 = new Schema.Parser()
    check(p1.parse(readerJson), p2.parse(writerJson), "$", Set.empty)
  }

  private def promotable(w: Schema.Type, r: Schema.Type): Boolean = {
    import Schema.Type._
    (w, r) match {
      case (INT, LONG) | (INT, FLOAT) | (INT, DOUBLE) => true
      case (LONG, FLOAT) | (LONG, DOUBLE)             => true
      case (FLOAT, DOUBLE)                            => true
      case (STRING, BYTES) | (BYTES, STRING)          => true
      case _                                          => false
    }
  }

  private def nameMatches(r: Schema, w: Schema): Boolean =
    r.getFullName == w.getFullName ||
      Option(r.getAliases).exists(_.asScala.contains(w.getFullName))

  private def check(r: Schema, w: Schema, path: String,
                    seen: Set[(String, String)]): Seq[Incompat] = {
    import Schema.Type._
    (w.getType, r.getType) match {
      // writer union: every branch can appear in the data
      case (UNION, _) =>
        w.getTypes.asScala.toSeq.flatMap { b =>
          val errs =
            if (r.getType == UNION) checkAgainstUnion(r, b, path, seen)
            else check(r, b, path, seen)
          errs.map(e => e.copy(
            reason = s"writer union branch ${b.getName}: ${e.reason}"))
        }
      // reader union, writer single: one readable branch suffices
      case (_, UNION) => checkAgainstUnion(r, w, path, seen)
      case (wt, rt) if wt == rt => (wt: @unchecked) match {
        case RECORD => checkRecord(r, w, path, seen)
        case ENUM =>
          if (!nameMatches(r, w))
            Seq(Incompat(path, s"enum name mismatch: reader " +
              s"${r.getFullName}, writer ${w.getFullName}"))
          else {
            val missing = w.getEnumSymbols.asScala.toSeq
              .filterNot(r.getEnumSymbols.asScala.contains)
            if (missing.isEmpty || r.getEnumDefault != null) Seq.empty
            else Seq(Incompat(path, "writer enum symbols " +
              missing.mkString("[", ", ", "]") +
              " absent from reader and reader has no enum default"))
          }
        case FIXED =>
          if (!nameMatches(r, w))
            Seq(Incompat(path, s"fixed name mismatch: reader " +
              s"${r.getFullName}, writer ${w.getFullName}"))
          else if (r.getFixedSize != w.getFixedSize)
            Seq(Incompat(path, s"fixed size mismatch: reader " +
              s"${r.getFixedSize}, writer ${w.getFixedSize}"))
          else Seq.empty
        case ARRAY =>
          check(r.getElementType, w.getElementType, s"$path[]", seen)
        case MAP =>
          check(r.getValueType, w.getValueType, s"$path{}", seen)
        case _ => Seq.empty // identical primitive
      }
      case (wt, rt) if promotable(wt, rt) => Seq.empty
      case (wt, rt) =>
        Seq(Incompat(path, s"type mismatch: reader $rt cannot read " +
          s"writer $wt"))
    }
  }

  private def checkAgainstUnion(rUnion: Schema, w: Schema, path: String,
                                seen: Set[(String, String)]): Seq[Incompat] = {
    val branches = rUnion.getTypes.asScala.toSeq
    if (branches.exists(b => check(b, w, path, seen).isEmpty)) Seq.empty
    else Seq(Incompat(path, s"no reader union branch can read writer " +
      s"${w.getType}" +
      (if (w.getType == Schema.Type.RECORD ||
           w.getType == Schema.Type.ENUM ||
           w.getType == Schema.Type.FIXED) s" ${w.getFullName}" else "")))
  }

  private def checkRecord(r: Schema, w: Schema, path: String,
                          seen: Set[(String, String)]): Seq[Incompat] = {
    if (!nameMatches(r, w))
      return Seq(Incompat(path, s"record name mismatch: reader " +
        s"${r.getFullName}, writer ${w.getFullName}"))
    val key = (r.getFullName, w.getFullName)
    if (seen.contains(key)) return Seq.empty // recursive type, proven
    val seen2 = seen + key
    r.getFields.asScala.toSeq.flatMap { rf =>
      val names = rf.name() +: Option(rf.aliases())
        .map(_.asScala.toSeq).getOrElse(Seq.empty)
      names.flatMap(n => Option(w.getField(n))).headOption match {
        case Some(wf) =>
          check(rf.schema(), wf.schema(), s"$path.${rf.name()}", seen2)
        case None if rf.hasDefaultValue => Seq.empty
        case None => Seq(Incompat(s"$path.${rf.name()}",
          "field absent from writer and reader has no default"))
      }
    }
    // writer-only fields are skipped by the reader — never an error
  }
}
