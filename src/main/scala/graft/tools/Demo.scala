package graft.tools

import graft.core._

/** Tiny CLI over the core library — the analog of the reference's `grams`
  * command (fulltext.go:396-397) plus codec/chunker demos. Used for manual
  * end-to-end verification of the pure core without a Spark session.
  */
object Demo {
  def main(args: Array[String]): Unit = args.toList match {
    case "grams" :: rest if rest.nonEmpty =>
      println(Gram.gramsSorted(partial = false, rest).map(Gram.gramString).mkString(" "))
    case "grams-partial" :: rest if rest.nonEmpty =>
      println(Gram.gramsSorted(partial = true, rest).map(Gram.gramString).mkString(" "))
    case "varint" :: n :: Nil =>
      val v = java.lang.Long.parseUnsignedLong(n)
      val buf = new Array[Byte](9)
      val end = Varint.put(v, buf, 0)
      println(buf.take(end).map(b => f"${b & 0xff}%02x").mkString(" "))
    case "postings-demo" :: Nil =>
      val sb = new Postings.SegmentBuilder(1.2, 0.75, 10.0, 4)
      Seq((3L, 2, 10L), (9L, 1, 12L), (40L, 5, 8L), (41L, 1, 9L), (100L, 3, 30L))
        .foreach { case (d, t, l) => sb.add(d, t, l) }
      val seg = sb.result()
      val it = new Postings.SegmentIterator(seg)
      println(s"encoded ${seg.length} bytes, ${it.numDocs} docs, ${it.numBlocks} blocks")
      println(s"skipTo(40) -> ${it.skipTo(40L)} doc=${it.docId} tf=${it.tf}")
      println("decode: " + Postings.decodeAll(seg)._1.mkString(","))
    case "chunks" :: text :: Nil =>
      Chunker.linesLenient(text.replace("\\n", "\n")).foreach { c =>
        println(s"line=${c.line} runeOff=${c.runeOff} runeLen=${c.runeLen} " +
          s"byteStart=${c.byteStart} byteLen=${c.byteLen} text=${c.text.stripLineEnd}")
      }
    case "org-chunks" :: text :: Nil =>
      OrgChunker.chunks(text.replace("\\n", "\n")).foreach { c =>
        println(s"line=${c.line} byteStart=${c.byteStart} byteLen=${c.byteLen} " +
          s"text=${c.text.replace("\n", "\\n")}")
      }
    case "gram-parse" :: rest if rest.nonEmpty =>
      // reference -gx / -gd / unicode literal forms (gramFor fts-lmdb.go:780-793)
      val (hex, dec) = (rest.contains("-gx"), rest.contains("-gd"))
      val lits = rest.filterNot(Set("-gx", "-gd"))
      println(lits.map(l => Gram.parseGram(l, hex, dec))
        .map(g => s"$g=${Gram.gramString(g)}").mkString(" "))
    case "verify" :: chunk :: terms =>
      println(Tokenizer.verifyAll(chunk, terms, partial = false))
    case _ =>
      System.err.println(
        """usage: Demo grams TEXT... | grams-partial TEXT... | varint N
          |       postings-demo | chunks TEXT | org-chunks TEXT
          |       gram-parse [-gx|-gd] LIT... | verify CHUNK TERM...""".stripMargin)
      sys.exit(1)
  }
}
