package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The stream offset must survive the checkpoint offset log verbatim —
  * hostile path characters (spaces, quotes, backslashes, non-ASCII)
  * round-trip losslessly through the JSON form. */
class NiftiStreamOffsetSpec extends AnyFunSuite {

  test("JSON round-trip is lossless for hostile path characters") {
    val paths = Seq("/a/plain.nii", "/sp ace/v.nii", "/quo\"te/v.nii",
      "/uni/ßä漢.nii", "/back\\slash/v.nii", "/new\nline/v.nii")
    val off = NiftiStreamOffset(paths)
    assert(NiftiStreamOffset.fromJson(off.json()) == off)
    // and the json itself is single-line (the offset log is line-oriented)
    assert(!off.json().contains('\n'), "offset JSON must stay single-line")
  }

  test("set semantics: of() accepts a foreign Offset via its json") {
    val off = NiftiStreamOffset(Seq("/x/a.nii", "/x/b.nii"))
    val foreign = new org.apache.spark.sql.connector.read.streaming.Offset {
      override def json(): String = off.json()
    }
    assert(NiftiStreamOffset.of(foreign) == off)
  }
}
