package graft.ingest

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal pure-JVM SQLite 3 container codec — just enough of the
  * public file format (sqlite.org/fileformat2) to write and read the
  * single-table databases a GeoPackage feature layer lives in: the
  * 100-byte database header, table b-trees (interior 0x05 / leaf 0x0D
  * pages), cell pointer arrays, varints, and record serial types
  * (NULL / big-endian ints / float64 / TEXT / BLOB). Same spirit as
  * [[Lzw]]/[[Laz]]/[[Shp]]: spec-from-scratch, byte-complete, loud
  * rejection of anything outside scope.
  *
  * Scope bounds (each `require`d with a clear message): 4096-byte
  * pages, UTF-8 text encoding, no payload overflow (a cell must fit
  * its page — GeoPackage polygon features are small; a real reader
  * would chase overflow chains), no freelist, one application table.
  * The writer emits a root leaf when one page suffices, else one level
  * of interior page over sequential leaves (~340 leaves ≈ 1.3 MB of
  * records — far beyond any per-tile fixture).
  */
object Sqlite {

  val PageSize = 4096
  private val LeafHdr = 8
  private val InteriorHdr = 12

  // ---- varints ----------------------------------------------------------

  private[graft] def varintLen(v: Long): Int = {
    var n = 1
    var x = v >>> 7
    while (x != 0 && n < 9) { n += 1; x >>>= 7 }
    n
  }

  private[graft] def putVarint(b: ByteBuffer, v: Long): Unit = {
    val n = varintLen(v)
    if (n == 9) {
      var i = 8
      while (i >= 1) { b.put((((v >>> (8 + 7 * (i - 1))) & 0x7f) | 0x80).toByte); i -= 1 }
      b.put((v & 0xff).toByte)
    } else {
      var i = n - 1
      while (i >= 1) { b.put((((v >>> (7 * i)) & 0x7f) | 0x80).toByte); i -= 1 }
      b.put((v & 0x7f).toByte)
    }
  }

  /** (value, bytes consumed) at `off`. */
  private[graft] def getVarint(bytes: Array[Byte], off: Int): (Long, Int) = {
    var v = 0L
    var i = 0
    while (i < 8) {
      require(off + i >= 0 && off + i < bytes.length, "truncated varint")
      val x = bytes(off + i) & 0xff
      v = (v << 7) | (x & 0x7f)
      if ((x & 0x80) == 0) return (v, i + 1)
      i += 1
    }
    require(off + 8 >= 0 && off + 8 < bytes.length, "truncated varint")
    ((v << 8) | (bytes(off + 8) & 0xff), 9)
  }

  // ---- record (row) format ----------------------------------------------

  /** A column value: Null, Long, Double, String, or Array[Byte]. */
  type Value = Any

  private def serial(v: Value): (Long, Int) = v match {
    case null => (0L, 0)
    case l: Long =>
      val n = intBytes(l)
      (n match { case 6 => 5L; case 8 => 6L; case x => x.toLong }, n)
    case _: Double => (7L, 8)
    case s: String => val b = s.getBytes(UTF_8); (13L + 2 * b.length, b.length)
    case a: Array[Byte] => (12L + 2 * a.length, a.length)
    case other => throw new IllegalArgumentException(
      s"unsupported SQLite value type ${other.getClass}")
  }

  private def intBytes(l: Long): Int =
    if (l >= Byte.MinValue && l <= Byte.MaxValue) 1
    else if (l >= Short.MinValue && l <= Short.MaxValue) 2
    else if (l >= -8388608L && l <= 8388607L) 3
    else if (l >= Int.MinValue && l <= Int.MaxValue) 4
    else if (l >= -140737488355328L && l <= 140737488355327L) 6
    else 8

  private[graft] def encodeRecord(values: Seq[Value]): Array[Byte] = {
    val serials = values.map(serial)
    val typesLen = serials.map(s => varintLen(s._1)).sum
    // header length varint counts itself; one extra byte is enough here
    val hdrLen = if (varintLen(typesLen + 1L) == 1) typesLen + 1
                 else typesLen + varintLen(typesLen + 2L)
    val total = hdrLen + serials.map(_._2).sum
    val b = ByteBuffer.allocate(total).order(ByteOrder.BIG_ENDIAN)
    putVarint(b, hdrLen.toLong)
    serials.foreach(s => putVarint(b, s._1))
    values.foreach {
      case null =>
      case l: Long =>
        var i = intBytes(l) - 1
        while (i >= 0) { b.put(((l >>> (8 * i)) & 0xff).toByte); i -= 1 }
      case d: Double => b.putDouble(d)
      case s: String => b.put(s.getBytes(UTF_8))
      case a: Array[Byte] => b.put(a)
    }
    b.array()
  }

  private[graft] def decodeRecord(bytes: Array[Byte], off: Int): Seq[Value] = {
    val (hdrLen, h0) = getVarint(bytes, off)
    var to = off + h0
    val types = Seq.newBuilder[Long]
    while (to < off + hdrLen) {
      val (t, n) = getVarint(bytes, to)
      types += t
      to += n
    }
    require(to == off + hdrLen, "record header length mismatch")
    var vo = off + hdrLen.toInt
    types.result().map { t =>
      def sint(n: Int): Long = {
        var v = (bytes(vo) << 56 >> 56).toLong // sign-extend first byte
        var i = 1
        while (i < n) { v = (v << 8) | (bytes(vo + i) & 0xff); i += 1 }
        vo += n
        v
      }
      t match {
        case 0 => null
        case 1 => sint(1)
        case 2 => sint(2)
        case 3 => sint(3)
        case 4 => sint(4)
        case 5 => sint(6)
        case 6 => sint(8)
        case 7 =>
          val d = ByteBuffer.wrap(bytes, vo, 8).order(ByteOrder.BIG_ENDIAN).getDouble
          vo += 8; d
        case 8 => 0L
        case 9 => 1L
        case t if t >= 13 && t % 2 == 1 =>
          val n = ((t - 13) / 2).toInt
          require(n >= 0 && vo.toLong + n <= bytes.length,
            s"text value of $n bytes runs past file end")
          val s = new String(bytes, vo, n, UTF_8); vo += n; s
        case t if t >= 12 && t % 2 == 0 =>
          val n = ((t - 12) / 2).toInt
          require(n >= 0 && vo.toLong + n <= bytes.length,
            s"blob value of $n bytes runs past file end")
          val a = java.util.Arrays.copyOfRange(bytes, vo, vo + n); vo += n; a
        case t => throw new IllegalArgumentException(s"unsupported serial type $t")
      }
    }
  }

  // ---- writer ------------------------------------------------------------

  /** One complete single-table database: rows are (rowid, values);
    * `sql` is the schema text recorded in sqlite_master. */
  def encode(tableName: String, sql: String,
             rows: Seq[(Long, Seq[Value])]): Array[Byte] = {
    // build leaf cells for the application table
    val cells = rows.sortBy(_._1).map { case (rowid, vals) =>
      val rec = encodeRecord(vals)
      val b = ByteBuffer.allocate(varintLen(rec.length.toLong) +
        varintLen(rowid) + rec.length)
      putVarint(b, rec.length.toLong)
      putVarint(b, rowid)
      b.put(rec)
      (rowid, b.array())
    }
    cells.foreach(c => require(c._2.length + 2 <= PageSize - LeafHdr,
      s"cell of ${c._2.length} bytes needs overflow pages (unsupported)"))
    // pack cells into leaves
    val leaves = Seq.newBuilder[Seq[(Long, Array[Byte])]]
    var cur = Vector.empty[(Long, Array[Byte])]
    var used = 0
    cells.foreach { c =>
      if (LeafHdr + (cur.length + 1) * 2 + used + c._2.length > PageSize && cur.nonEmpty) {
        leaves += cur; cur = Vector.empty; used = 0
      }
      cur :+= c; used += c._2.length
    }
    if (cur.nonEmpty || cells.isEmpty) leaves += cur
    val leafSeq = leaves.result()
    // interior capacity check with ACTUAL cell sizes: each divider cell is
    // a 2-byte pointer slot + 4-byte child page + max-rowid varint (which
    // is 2+ bytes once rowids reach 128, not the 1 byte a flat per-child
    // estimate assumes); the rightmost child sits in the header, cell-free
    val interiorUsed = InteriorHdr +
      leafSeq.dropRight(1).map(l => 2 + 4 + varintLen(l.last._1)).sum
    require(interiorUsed <= PageSize,
      s"${leafSeq.length} leaves need $interiorUsed interior bytes > " +
        s"$PageSize — exceeds one interior level (unsupported)")
    // page plan: 1 = header+sqlite_master; 2 = table root; 3.. = extra leaves
    val multi = leafSeq.length > 1
    val nPages = if (multi) 2 + leafSeq.length else 3 - 1 // root leaf → 2 pages
    val out = ByteBuffer.allocate(PageSize * nPages).order(ByteOrder.BIG_ENDIAN)

    def writeLeaf(pageIdx: Int, cs: Seq[(Long, Array[Byte])], hdrOff: Int): Unit = {
      val base = (pageIdx - 1) * PageSize
      val p = base + hdrOff
      out.put(p, 0x0D.toByte)
      out.putShort(p + 1, 0) // first freeblock
      out.putShort(p + 3, cs.length.toShort)
      var content = PageSize
      cs.zipWithIndex.foreach { case ((_, cell), i) =>
        content -= cell.length
        out.putShort(p + 8 + 2 * i, content.toShort)
        var j = 0
        while (j < cell.length) { out.put(base + content + j, cell(j)); j += 1 }
      }
      out.putShort(p + 5, content.toShort)
      out.put(p + 7, 0.toByte) // fragmented free bytes
    }

    def writeInterior(pageIdx: Int, children: Seq[(Int, Long)]): Unit = {
      // children: (child page number, max rowid in child); last is rightmost
      val base = (pageIdx - 1) * PageSize
      out.put(base, 0x05.toByte)
      out.putShort(base + 1, 0)
      out.putShort(base + 3, (children.length - 1).toShort)
      out.putInt(base + 8, children.last._1)
      var content = PageSize
      children.init.zipWithIndex.foreach { case ((child, maxRowid), i) =>
        val cell = ByteBuffer.allocate(4 + varintLen(maxRowid))
          .order(ByteOrder.BIG_ENDIAN)
        cell.putInt(child)
        putVarint(cell, maxRowid)
        val ca = cell.array()
        content -= ca.length
        out.putShort(base + 12 + 2 * i, content.toShort)
        var j = 0
        while (j < ca.length) { out.put(base + content + j, ca(j)); j += 1 }
      }
      out.putShort(base + 5, content.toShort)
      out.put(base + 7, 0.toByte)
    }

    // page 1: 100-byte header + sqlite_master leaf with one schema row
    out.put("SQLite format 3\u0000".getBytes(UTF_8))
    out.putShort(16, PageSize.toShort)
    out.put(18, 1.toByte).put(19, 1.toByte) // write/read format versions
    out.put(20, 0.toByte)                   // reserved space per page
    out.put(21, 64.toByte).put(22, 32.toByte).put(23, 32.toByte)
    out.putInt(24, 1)  // file change counter
    out.putInt(28, nPages)
    out.putInt(40, 1)  // schema cookie
    out.putInt(44, 1)  // schema format 1
    out.putInt(48, 0)  // default page cache
    out.putInt(56, 1)  // text encoding: UTF-8
    out.putInt(96, 3049000) // sqlite version number (informational)
    val masterRec = encodeRecord(Seq(
      "table", tableName, tableName, 2L.asInstanceOf[Value], sql))
    val mb = ByteBuffer.allocate(varintLen(masterRec.length.toLong) + 1 +
      masterRec.length)
    putVarint(mb, masterRec.length.toLong)
    putVarint(mb, 1L)
    mb.put(masterRec)
    val base1 = 0
    out.put(base1 + 100, 0x0D.toByte)
    out.putShort(base1 + 101, 0)
    out.putShort(base1 + 103, 1)
    val mArr = mb.array()
    val mOff = PageSize - mArr.length
    out.putShort(base1 + 105, mOff.toShort)
    out.put(base1 + 107, 0.toByte)
    out.putShort(base1 + 108, mOff.toShort)
    var j = 0
    while (j < mArr.length) { out.put(mOff + j, mArr(j)); j += 1 }

    if (multi) {
      val childPages = leafSeq.indices.map(3 + _)
      writeInterior(2, childPages.zip(leafSeq.map(_.last._1)))
      leafSeq.zip(childPages).foreach { case (cs, pg) => writeLeaf(pg, cs, 0) }
    } else {
      writeLeaf(2, leafSeq.head, 0)
    }
    out.array()
  }

  // ---- reader ------------------------------------------------------------

  /** Read every row of `tableName`: (rowid, values). Walks
    * sqlite_master for the root page, then the table b-tree in rowid
    * order (any depth). */
  def decode(bytes: Array[Byte], tableName: String): Seq[(Long, Seq[Value])] = {
    require(bytes.length >= PageSize &&
      new String(bytes, 0, 16, UTF_8) == "SQLite format 3\u0000",
      "not a SQLite database")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val pageSize = b.getShort(16) & 0xFFFF
    require(pageSize == PageSize, s"only $PageSize-byte pages supported, got $pageSize")
    require(b.getInt(56) == 1, "only UTF-8 text encoding supported")
    val master = walkTable(bytes, 1)
    val root = master.collectFirst {
      case (_, Seq("table", n: String, _, rootpage: Long, _)) if n == tableName =>
        rootpage.toInt
    }.getOrElse(throw new IllegalArgumentException(
      s"table $tableName not found in sqlite_master"))
    walkTable(bytes, root)
  }

  private def walkTable(bytes: Array[Byte],
                        page: Int, depth: Int = 0): Seq[(Long, Seq[Value])] = {
    // hostile-input discipline: a page pointer (from sqlite_master or an
    // interior cell) must land a WHOLE page inside the file, and a
    // corrupt pointer cycle must die as corrupt input, not StackOverflow
    // (fan-out >= 2 makes depth 64 unreachable for any real b-tree)
    require(page >= 1 && page.toLong * PageSize <= bytes.length,
      s"page $page outside file")
    require(depth < 64, "b-tree deeper than any valid database (pointer cycle?)")
    val b = ByteBuffer.wrap(bytes).order(ByteOrder.BIG_ENDIAN)
    val base = (page - 1) * PageSize
    val hdrOff = base + (if (page == 1) 100 else 0)
    val ptype = bytes(hdrOff) & 0xFF
    val nCells = b.getShort(hdrOff + 3) & 0xFFFF
    ptype match {
      case 0x0D =>
        (0 until nCells).map { i =>
          val cellOff = base + (b.getShort(hdrOff + 8 + 2 * i) & 0xFFFF)
          // a cell pointer must land inside ITS page (a flipped pointer
          // near page end otherwise reads past the last page's bytes)
          require(cellOff >= base && cellOff < base + PageSize,
            s"cell pointer $cellOff outside page $page")
          val (payloadLen, n1) = getVarint(bytes, cellOff)
          val (rowid, n2) = getVarint(bytes, cellOff + n1)
          // no-overflow bound: the whole payload must sit in this page
          require(cellOff + n1 + n2 + payloadLen <= base + PageSize,
            s"cell overflows page $page (overflow chains unsupported)")
          (rowid, decodeRecord(bytes, cellOff + n1 + n2))
        }
      case 0x05 =>
        val children = (0 until nCells).map { i =>
          val cellOff = base + (b.getShort(hdrOff + 12 + 2 * i) & 0xFFFF)
          require(cellOff >= base && cellOff + 4 <= base + PageSize,
            s"cell pointer $cellOff outside page $page")
          b.getInt(cellOff)
        } :+ b.getInt(hdrOff + 8)
        children.flatMap(walkTable(bytes, _, depth + 1))
      case t => throw new IllegalArgumentException(
        f"unsupported page type 0x$t%02x on page $page (index b-trees out of scope)")
    }
  }
}
