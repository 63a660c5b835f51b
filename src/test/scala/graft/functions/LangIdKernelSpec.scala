package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.TextFunctions

/** Pins the LangId kernel to the exact output of the original
  * regexp_count + 20-contains CASE-chain formulation, over adversarial
  * inputs (boundaries, ties, CJK edges, malformed UTF-8, nulls, multi-
  * space runs) and random token soup — both evaluated by Spark itself.
  */
class LangIdKernelSpec extends SparkSpec {
  import spark.implicits._

  private val adversarial: Seq[String] = Seq(
    null, "", " ", "  ", "the", "the and of", "THE AND OF", "the the the",
    "xthe and of", "the and ofx", " the and of ", "of", "to", "in el le",
    // boundary forms: word at start / end / alone / multiple spaces
    "the cat", "cat the", "a the b", "a  the  b", "a\tthe\tb", "the\nand",
    // exact-tie cases: en vs de vs es vs fr tie orders
    "the der", "der the", "der el", "el le", "the der el le",
    "und die der nicht ist", "el que los una por", "le et les des une",
    "the and of to in", "und", "une", "des moines", "los angeles",
    // overlapping-language words: "in" (en) inside "nicht"; "et" in "lets"
    "nicht", "lets", "pets et", "zune une", "laune une zaune",
    // CJK: in-range, boundary U+4E00 / U+9FFF, just-outside U+4DFF / U+A000
    "中文 text", "text 中", "一", "鿿", "䷿", "ꀀ",
    "the and 中", "ｈａｌｆ width", "καλημέρα el",
    // 4-byte (supplementary) chars, not CJK-BMP range
    "😀 the", "𪜀 x",
    // accented text
    "der schöne tag und die nacht", "él qué", "el día que por",
    "le café et les croissants des une")

  // malformed UTF-8 needs byte-level construction — exercised via the
  // kernel object directly against Spark's own evaluation of the
  // original expression on the same UTF8String bytes
  private val rnd = new scala.util.Random(11)
  private val vocab = Seq("the", "and", "of", "to", "in", "der", "und", "die",
    "nicht", "ist", "el", "que", "los", "una", "por", "le", "et", "les",
    "des", "une", "cat", "dog", "中文", "x", "thé", "zz", "")
  private val random: Seq[String] = (1 to 2000).map { _ =>
    (1 to rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.size)))
      .mkString(if (rnd.nextBoolean()) " " else "  ")
  }

  test("LangId kernel == original CASE-chain formulation") {
    val df = (adversarial ++ random).toDF("s")
    df.select($"s", TextFunctions.languageId($"s").as("k"),
        TextFunctions.languageIdReference($"s").as("r"))
      .collect().foreach { r =>
        assert(r.getString(1) === r.getString(2), s"input <${r.getString(0)}>")
      }
  }

  test("LangId kernel == original on MALFORMED UTF-8 (binary→string cast)") {
    // cast(binary as string) keeps the raw bytes in the UTF8String, so
    // both the kernel and the regexp/contains formulation evaluate the
    // SAME malformed sequences (plain Scala strings can't express these)
    val malformed: Seq[Array[Byte]] = Seq(
      Array(0xE4, 0xB8).map(_.toByte), // truncated CJK lead
      Array(0xE4, 0xB8, 0x80).map(_.toByte), // valid U+4E00 alone
      Array('t', 'h', 'e', ' ', 0xE4, 'x').map(_.toByte), // stray lead then ASCII
      Array(0xB8, 0xE4, 0xB8, 0x80).map(_.toByte), // stray continuation then CJK
      Array(0xF0, 0xE4, 0xB8, 0x80).map(_.toByte), // bad 4-byte lead then CJK
      Array(0xF0, 0xA4, 0xB8, 0x80).map(_.toByte), // valid supplementary (not BMP CJK)
      Array('t', 'h', 'e', 0xC0, ' ', 'a', 'n', 'd', ' ', 'o', 'f').map(_.toByte),
      Array(0xE4, 0x20, 0x74, 0x68, 0x65, 0x20).map(_.toByte), // lead, then " the "
      Array(0xFF, 0xFE, 'l', 'e', ' ', 'e', 't').map(_.toByte),
      Array(0x80).map(_.toByte), Array(0xE9, 0xBF, 0xBF).map(_.toByte)) // U+9FFF
    val df = malformed.map(Tuple1(_)).toDF("b")
      .select(col("b").cast("string").as("s"))
    df.select(col("s"), TextFunctions.languageId(col("s")).as("k"),
        TextFunctions.languageIdReference(col("s")).as("r"))
      .collect().foreach { r =>
        assert(r.getString(1) === r.getString(2),
          s"bytes <${r.getString(0).getBytes("UTF-8").map(b => f"$b%02x").mkString(" ")}>")
      }
  }

  test("LangId is non-nullable and null text maps to und") {
    val out = Seq[String](null).toDF("s")
      .select(TextFunctions.languageId($"s").as("k")).collect()
    assert(out.head.getString(0) === "und")
  }
}
