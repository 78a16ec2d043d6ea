package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.config.Framing
import graft.config.Framing._

/** The decoding framing set (reference lib/codecs/src/decoding/
  * framing/), pinned where possible to the reference's OWN inline test
  * vectors (octet_counting.rs, length_delimited.rs,
  * varint_length_delimited.rs tests).
  */
class FramingSpec extends AnyFunSuite {

  private def s(frames: Seq[Array[Byte]]): Seq[String] =
    frames.map(new String(_, "UTF-8"))
  private def b(str: String): Array[Byte] = str.getBytes("UTF-8")

  // ---------------------------------------------------- octet counting
  test("octet counting: newline fallback across chunk boundaries (reference vector)") {
    val f = new OctetCounting(128)
    assert(f.push(b("<57>Mar 25 21:47:46 gleichner6005 quaerat[2444]: There were ")).isEmpty)
    assert(s(f.push(b("8 penguins in the shop.\n"))) ==
      Seq("<57>Mar 25 21:47:46 gleichner6005 quaerat[2444]: There were 8 penguins in the shop."))
    assert(f.eof().isEmpty)
    assert(f.errors == 0)
  }

  test("octet counting: a counted frame spans chunks and embedded digits don't re-trigger (reference vector)") {
    val f = new OctetCounting(30)
    assert(f.push(b("28 abcdefghijklm")).isEmpty)
    assert(s(f.push(b("3 nopqrstuvwxyz"))) == Seq("abcdefghijklm3 nopqrstuvwxyz"))
  }

  test("octet counting: invalid length digits move past the bad prefix (reference vector)") {
    val f = new OctetCounting(16)
    assert(f.push(b("232>1 zork")).isEmpty) // "232>1" is not a number
    assert(f.errors == 1)
    // "zork" stays buffered as a line; eof flushes it
    assert(s(f.eof()) == Seq("zork"))
  }

  test("octet counting: an oversized counted frame discards exactly its payload (reference vector)") {
    val f = new OctetCounting(16)
    // declared 32 > max 16: discard the 32 payload bytes, then resume
    val out = f.push(b("32 abcdefghijklmnopqrstuvwxyzabcdef8 penguins"))
    assert(s(out) == Seq("penguins"))
    assert(f.errors == 1)
  }

  test("octet counting: mixed counted and newline frames in one stream") {
    val f = new OctetCounting(1024)
    val m1 = "<165>1 2024-01-01T00:00:00Z host app 1 ID - hello"
    val m2 = "<13>1 2024-01-01T00:00:01Z host2 app2 2 ID2 - line framed"
    val m3 = "<14>1 2024-01-01T00:00:02Z host3 app3 3 ID3 - counted again"
    val bytes = s"${m1.getBytes("UTF-8").length} $m1" + s"$m2\n" +
      s"${m3.getBytes("UTF-8").length} $m3"
    assert(s(f.frameAll(b(bytes))) == Seq(m1, m2, m3))
    assert(f.errors == 0)
  }

  test("octet counting: truncated counted frame drops at eof") {
    val f = new OctetCounting(1024)
    assert(f.push(b("100 only a few bytes")).isEmpty)
    assert(f.eof().isEmpty)
    assert(f.errors == 1)
  }

  // -------------------------------------------------- length delimited
  test("length delimited: 4-byte big-endian default (reference vector 00 00 00 03 foo)") {
    val f = new LengthDelimited(4, bigEndian = true, 0, 8 * 1024 * 1024)
    assert(s(f.push(Array[Byte](0, 0, 0, 3) ++ b("foo"))) == Seq("foo"))
    assert(f.push(Array.empty).isEmpty)
    assert(f.eof().isEmpty)
  }

  test("length delimited: 2-byte little-endian and offset forms (reference vectors)") {
    val le = new LengthDelimited(2, bigEndian = false, 0, 1 << 20)
    assert(s(le.push(Array[Byte](3, 0) ++ b("foo"))) == Seq("foo"))
    val off = new LengthDelimited(2, bigEndian = true, 2, 1 << 20)
    assert(s(off.push(b("xx") ++ Array[Byte](0, 3) ++ b("foo"))) == Seq("foo"))
  }

  test("length delimited: frames split across pushes; truncated trailer is an error") {
    val f = new LengthDelimited(4, bigEndian = true, 0, 1 << 20)
    assert(f.push(Array[Byte](0, 0)).isEmpty)
    assert(f.push(Array[Byte](0, 5) ++ b("he")).isEmpty)
    assert(s(f.push(b("llo"))) == Seq("hello"))
    f.push(Array[Byte](0, 0, 0, 9) ++ b("ab"))
    assert(f.eof().isEmpty)
    assert(f.errors == 1)
  }

  test("length delimited: hostile lengths error, never desync or crash") {
    // 4-byte length 0x90000000 (2.4 GB, > maxFrame): must skip the
    // declared span Long-safely — a negative Int wrap would leave the
    // skip inert and re-parse payload bytes as headers
    val f = new LengthDelimited(4, bigEndian = true, 0, 1 << 20)
    assert(f.push(Array[Byte](0x90.toByte, 0, 0, 0) ++
      Array.fill[Byte](64)('x'.toByte)).isEmpty)
    assert(f.errors == 1)
    // still mid-skip at eof: one more error, then a fresh stream works
    f.eof()
    assert(s(f.push(Array[Byte](0, 0, 0, 2) ++ b("ok"))) == Seq("ok"))

    // 8-byte length with the sign bit set: negative as Long — must be
    // an error, not a fabricated frame + crash on tail compaction
    val f8 = new LengthDelimited(8, bigEndian = true, 0, 1 << 20)
    assert(f8.push(Array[Byte](0x80.toByte, 0, 0, 0, 0, 0, 1, 0) ++
      b("garbage")).isEmpty)
    assert(f8.errors == 1)
    assert(f8.eof().isEmpty)

    // varint with the 64-bit sign bit set: error, not a huge "wait"
    val fv = new VarintLengthDelimited(1 << 20)
    val negVarint = Array[Byte](0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte, 0x80.toByte,
      0x80.toByte, 0x01)
    assert(fv.push(negVarint ++ b("x")).isEmpty)
    assert(fv.errors == 1)
  }

  // ------------------------------------------------------------ varint
  test("varint length delimited: single- and multi-byte prefixes (reference vectors)") {
    val f = new VarintLengthDelimited(1 << 20)
    assert(s(f.push(Array[Byte](3) ++ b("foo"))) == Seq("foo"))
    // 300 in varint: 0xAC 0x02
    val payload = Array.fill[Byte](300)('x'.toByte)
    val f2 = new VarintLengthDelimited(1 << 20)
    assert(f2.push(Array[Byte](0xAC.toByte, 0x02.toByte) ++ payload.take(100)).isEmpty)
    val out = f2.push(payload.drop(100))
    assert(out.length == 1 && out.head.length == 300)
    // incomplete varint waits
    val f3 = new VarintLengthDelimited(1 << 20)
    assert(f3.push(Array[Byte](0x80.toByte)).isEmpty)
    assert(f3.eof().isEmpty)
    assert(f3.errors == 1)
  }

  // ------------------------------------------------- char delimited
  test("character delimited: custom delimiter with oversized-frame discard") {
    val f = new CharacterDelimited(';'.toByte, Some(5))
    assert(s(f.push(b("ab;toolongfr;cd;ef"))) == Seq("ab", "cd"))
    assert(s(f.eof()) == Seq("ef"))
    assert(f.errors == 1)
  }

  test("newline delimited: strips CR, flushes unterminated tail at eof") {
    val f = new NewlineDelimited(None)
    assert(s(f.push(b("a\r\nb\nc"))) == Seq("a", "b"))
    assert(s(f.eof()) == Seq("c"))
  }

  // ------------------------------------------------------ chunked gelf
  private def gelfChunk(msgId: Long, seq: Int, total: Int, payload: Array[Byte]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(12 + payload.length)
    bb.put(0x1e.toByte).put(0x0f.toByte).putLong(msgId)
      .put(seq.toByte).put(total.toByte).put(payload)
    bb.array()
  }

  test("chunked gelf: out-of-order chunks reassemble; unchunked passes through") {
    val f = new ChunkedGelf(None, None)
    assert(f.pushDatagram(gelfChunk(42L, 1, 2, b(" world"))).isEmpty)
    assert(s(f.pushDatagram(gelfChunk(42L, 0, 2, b("hello")))) == Seq("hello world"))
    assert(s(f.pushDatagram(b("""{"version":"1.1"}"""))) == Seq("""{"version":"1.1"}"""))
    assert(f.errors == 0)
  }

  test("chunked gelf: duplicate chunks ignored, incomplete messages error at eof, gzip auto-inflates") {
    val f = new ChunkedGelf(None, None)
    assert(f.pushDatagram(gelfChunk(7L, 0, 3, b("a"))).isEmpty)
    assert(f.pushDatagram(gelfChunk(7L, 0, 3, b("a"))).isEmpty) // dup
    assert(f.pushDatagram(gelfChunk(9L, 0, 2, b("x"))).isEmpty) // second pending
    assert(f.eof().isEmpty)
    assert(f.errors == 2) // two incomplete messages dropped

    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write(b("compressed payload")); g.close()
      bos.toByteArray
    }
    val f2 = new ChunkedGelf(None, None)
    assert(s(f2.pushDatagram(gz)) == Seq("compressed payload"))
  }

  test("chunked gelf over length-prefixed replay recovers datagram boundaries") {
    val f = ChunkedGelf.overLengthPrefixed(None, None)
    def rec(d: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(4 + d.length)
      bb.putInt(d.length).put(d); bb.array()
    }
    val stream = rec(gelfChunk(1L, 0, 2, b("part1 "))) ++
      rec(b("plain message")) ++ rec(gelfChunk(1L, 1, 2, b("part2")))
    assert(s(f.frameAll(stream)) == Seq("plain message", "part1 part2"))
  }

  // ---------------------------------------------------------- builder
  test("builder: config table dispatch and option validation") {
    import graft.config.Toml
    def tab(toml: String) = Toml.parse(toml).tab("framing")
    val oc = Framing.builder("octet_counting",
      tab("[framing]\n[framing.octet_counting]\nmax_length = 16"), "t")()
    oc.push(b("32 abcdefghijklmnopqrstuvwxyzabcdef"))
    assert(oc.errors == 1)
    val cd = Framing.builder("character_delimited",
      tab("[framing]\n[framing.character_delimited]\ndelimiter = \";\""), "t")()
    assert(s(cd.frameAll(b("a;b"))) == Seq("a", "b"))
    val e = intercept[IllegalArgumentException](Framing.builder(
      "character_delimited", tab("[framing]"), "t"))
    assert(e.getMessage.contains("delimiter"))
    val e2 = intercept[Exception](Framing.builder("no_such", None, "t"))
    assert(e2.getMessage.contains("no_such"))
  }
}
