package graft.ingest

import org.scalatest.funsuite.AnyFunSuite

class SanitizeSpec extends AnyFunSuite {

  /** Deterministic fuzz corpus (no scalatestplus bridge in the offline
    * cache — seeded random strings give the same property coverage).
    */
  private val fuzz: Seq[String] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(300)(rnd.nextString(rnd.nextInt(24))) ++
      Seq("", "_", "__", "___", "a b", "ü.ö-ä", "日本語", "a\tb\nc")
  }

  test("replaceInString rewrites non-alphanumerics to underscore") {
    assert(Sanitize.replaceInString("col name-1!") == "col_name_1_")
    assert(Sanitize.replaceInString("ok_name_9") == "ok_name_9")
    assert(Sanitize.replaceInString("a.b,c") == "a_b_c")
  }

  test("double-underscore collapse is a SINGLE non-overlapping pass (reference quirk)") {
    // helper_utils.py:35 does one str.replace pass: a___b -> a__b, not a_b
    assert(Sanitize.replaceInString("a___b") == "a__b")
    assert(Sanitize.replaceInString("a__b") == "a_b")
    assert(Sanitize.replaceInString("a____b") == "a__b")
    assert(Sanitize.replaceInString("a..b") == "a_b")
  }

  test("fileName strips directory and extension, then sanitizes") {
    assert(Sanitize.fileName("/data/in/My File (1).csv") == "My_File_1_")
    assert(Sanitize.fileName("/data/in/plain") == "plain")
    assert(Sanitize.fileName("rel/path.to/file.csv") == "file")
    // extension dot before last slash => keep whole basename
    assert(Sanitize.fileName("/a.b/noext") == "noext")
  }

  test("fileType returns extension of basename or empty") {
    assert(Sanitize.fileType("/x/y/data.csv") == "csv")
    assert(Sanitize.fileType("/x.y/data") == "")
    assert(Sanitize.fileType("archive.tar.gz") == "gz")
  }

  test("preprocessHeader only rewrites space/dash (weaker pandas-path rule)") {
    assert(Sanitize.preprocessHeader("  a b-c  ") == "a_b_c")
    assert(Sanitize.preprocessHeader("keep.dots!") == "keep.dots!")
  }

  test("property: replaceInString output is always [A-Za-z0-9_]*") {
    fuzz.foreach { s =>
      assert(Sanitize.replaceInString(s).matches("[A-Za-z0-9_]*"), s"input: ${s.toList}")
    }
  }

  test("property: sanitized names are fixed under a second full-sanitize pass except the __ quirk") {
    fuzz.foreach { s =>
      val once = Sanitize.replaceInString(s)
      val twice = Sanitize.replaceInString(once)
      // the char-class rewrite is idempotent; only the single-pass __
      // collapse can change on re-application
      assert(twice.length <= once.length)
      assert(twice.matches("[A-Za-z0-9_]*"))
    }
  }
}
