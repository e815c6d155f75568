package graft.formats

import org.scalatest.funsuite.AnyFunSuite

class SchemaCompatSpec extends AnyFunSuite {

  private def rec(name: String, fields: String) =
    s"""{"type":"record","name":"$name","fields":[$fields]}"""

  test("identical record and spec promotions are compatible") {
    val w = rec("R", """{"name":"a","type":"int"},{"name":"b","type":"string"}""")
    assert(SchemaCompat.canRead(w, w).isEmpty)
    val r = rec("R", """{"name":"a","type":"long"},{"name":"b","type":"bytes"}""")
    assert(SchemaCompat.canRead(r, w).isEmpty) // int→long, string→bytes
    // narrowing is NOT a promotion
    val bad = SchemaCompat.canRead(w, r)
    assert(bad.exists(i => i.path == "$.a" && i.reason.contains("LONG")))
  }

  test("new reader field needs a default; writer-only fields are fine") {
    val w = rec("R", """{"name":"a","type":"int"}""")
    val rDef = rec("R",
      """{"name":"a","type":"int"},{"name":"b","type":"int","default":7}""")
    assert(SchemaCompat.canRead(rDef, w).isEmpty)
    val rNoDef = rec("R",
      """{"name":"a","type":"int"},{"name":"b","type":"int"}""")
    val errs = SchemaCompat.canRead(rNoDef, w)
    assert(errs === Seq(SchemaCompat.Incompat("$.b",
      "field absent from writer and reader has no default")))
    // dropping a writer field never breaks reads
    assert(SchemaCompat.canRead(w,
      rec("R", """{"name":"a","type":"int"},{"name":"z","type":"string"}"""))
      .isEmpty)
  }

  test("reader field alias matches the writer's old name") {
    val w = rec("R", """{"name":"old","type":"int"}""")
    val r = rec("R",
      """{"name":"renamed","type":"int","aliases":["old"]}""")
    assert(SchemaCompat.canRead(r, w).isEmpty)
  }

  test("enum symbol removal needs a reader enum default") {
    val w = """{"type":"enum","name":"E","symbols":["A","B","C"]}"""
    val rMissing = """{"type":"enum","name":"E","symbols":["A","B"]}"""
    assert(SchemaCompat.canRead(rMissing, w)
      .exists(_.reason.contains("[C]")))
    val rDefault =
      """{"type":"enum","name":"E","symbols":["A","B"],"default":"A"}"""
    assert(SchemaCompat.canRead(rDefault, w).isEmpty)
  }

  test("fixed requires same name and size; arrays/maps recurse") {
    val w8 = """{"type":"fixed","name":"F","size":8}"""
    val w16 = """{"type":"fixed","name":"F","size":16}"""
    assert(SchemaCompat.canRead(w8, w8).isEmpty)
    assert(SchemaCompat.canRead(w16, w8)
      .exists(_.reason.contains("size mismatch")))
    assert(SchemaCompat.canRead(
      """{"type":"array","items":"double"}""",
      """{"type":"array","items":"int"}""").isEmpty)
    val mapErr = SchemaCompat.canRead(
      """{"type":"map","values":"int"}""",
      """{"type":"map","values":"string"}""")
    assert(mapErr.exists(i => i.path == "${}" &&
      i.reason.contains("type mismatch")))
  }

  test("union direction matters") {
    val u = """["null","string"]"""
    // reader union accepts a plain writer string
    assert(SchemaCompat.canRead(u, "\"string\"").isEmpty)
    // writer union requires EVERY branch readable: null is not
    val errs = SchemaCompat.canRead("\"string\"", u)
    assert(errs.exists(_.reason.contains("writer union branch null")))
    // widening the reader union fixes it
    assert(SchemaCompat.canRead("""["null","string","int"]""", u).isEmpty)
  }

  test("recursive record types terminate and read themselves") {
    val list = """{"type":"record","name":"Node","fields":[
      {"name":"v","type":"int"},
      {"name":"next","type":["null","Node"],"default":null}]}"""
    assert(SchemaCompat.canRead(list, list).isEmpty)
  }
}
