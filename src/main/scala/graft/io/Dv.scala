package graft.io

import java.io.{DataInputStream, DataOutputStream}

import org.apache.hadoop.fs.{FileSystem, Path}

/** Deletion-vector sidecar codec — the merge-on-read half of row-level
  * DELETE on the versioned table (the copy-on-write half is
  * [[Versioned.deleteWhere]]).
  *
  * A deletion vector is the set of row ORDINALS (0-based position within
  * one parquet data file, the same ordinal Spark's `_metadata.row_index`
  * reports) that are logically deleted from that file. Storing the dead
  * ordinals beside the file instead of rewriting it is what makes a
  * point-delete on a 100 TB table a metadata-sized commit: deleting 1 row
  * from a 1 GB file writes a ~20-byte sidecar, not a 1 GB rewrite — the
  * same trade Delta's deletion vectors and Iceberg's position deletes
  * make. The rewrite cost is deferred to compaction/materialization,
  * where it amortizes over many deletes.
  *
  * Encoding (`GDV1`): int magic, long cardinality, then the sorted
  * ordinals delta-encoded as unsigned varints (first value absolute).
  * Clustered deletes (the common case: a predicate kills a contiguous
  * run) cost ~1 byte/row; the worst case is ~9. The cardinality sits in
  * the fixed-size header so [[count]] can price a vector — e.g. to decide
  * whether the read-side anti-join is broadcastable — from a 12-byte
  * read, never a full parse.
  *
  * Vectors are IMMUTABLE once referenced by a published manifest (like
  * every other sidecar here): a second delete on the same file writes a
  * NEW vector holding the union and the new manifest points to it; the
  * old one becomes garbage for [[Versioned.vacuum]].
  */
object Dv {

  val Suffix = ".dv"
  private val Magic = 0x47445631 // "GDV1"

  /** Serialize sorted, distinct, non-negative ordinals. */
  def encode(sorted: Array[Long]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream(16 + sorted.length * 2)
    val out = new DataOutputStream(bos)
    out.writeInt(Magic)
    out.writeLong(sorted.length.toLong)
    var prev = 0L
    var i = 0
    while (i < sorted.length) {
      val v = sorted(i)
      // STRICTLY increasing: a duplicated ordinal would inflate the
      // header cardinality, and the whole-file-dead check trusts it —
      // length == fileRows with a duplicate present would drop a file
      // that still holds a live row
      require(if (i == 0) v >= 0 else v > prev,
        "ordinals must be sorted, distinct and non-negative")
      writeVarLong(out, if (i == 0) v else v - prev)
      prev = v
      i += 1
    }
    out.flush()
    bos.toByteArray
  }

  /** Parse and VALIDATE a vector. Decode re-checks everything [[encode]]
    * promised rather than trusting it: ordinals must come out
    * non-negative and strictly increasing (a zero delta would be a
    * duplicate, inflating the header cardinality the whole-file-dead
    * check relies on; a negative first value or an overflowed
    * accumulator is corruption), and the buffer must be fully consumed
    * (a truncated-then-padded or trailing-garbage vector must not
    * silently decode into a shorter/different ordinal set that the
    * read-side anti-join would then apply). */
  def decode(bytes: Array[Byte]): Array[Long] = {
    val in = new DataInputStream(new java.io.ByteArrayInputStream(bytes))
    require(in.readInt() == Magic, "not a GDV1 deletion vector")
    val n = in.readLong()
    require(n >= 0 && n <= Int.MaxValue, s"bad deletion-vector cardinality $n")
    val out = new Array[Long](n.toInt)
    var acc = 0L
    var i = 0
    while (i < n) {
      val delta = readVarLong(in)
      require(if (i == 0) delta >= 0 else delta > 0,
        s"corrupt deletion vector: non-increasing ordinal at index $i")
      val next = acc + delta
      require(next >= acc || i == 0,
        s"corrupt deletion vector: ordinal overflow at index $i")
      acc = next
      out(i) = acc
      i += 1
    }
    require(in.read() == -1,
      s"corrupt deletion vector: ${in.available() + 1} trailing bytes after $n ordinals")
    out
  }

  /** Write a vector atomically (temp + rename, the sidecar convention). */
  def write(fs: FileSystem, path: Path, sorted: Array[Long]): Unit = {
    val tmp = new Path(path.getParent,
      s".${path.getName}.${java.util.UUID.randomUUID.toString.take(8)}.tmp")
    val out = fs.create(tmp, true)
    try out.write(encode(sorted)) finally out.close()
    // a task retry may legitimately rewrite a not-yet-published vector
    // (publish happens strictly after every vector lands), and local-FS
    // rename refuses an existing target — clear it first
    fs.delete(path, false)
    if (!fs.rename(tmp, path)) {
      fs.delete(tmp, false)
      throw new java.io.IOException(s"could not publish deletion vector $path")
    }
  }

  def read(fs: FileSystem, path: Path): Array[Long] = {
    val in = fs.open(path)
    try {
      val len = fs.getFileStatus(path).getLen
      require(len <= Int.MaxValue, s"deletion vector too large: $path")
      val buf = new Array[Byte](len.toInt)
      in.readFully(buf)
      decode(buf)
    } finally in.close()
  }

  /** Cardinality from the fixed 12-byte header — prices a vector (e.g.
    * the broadcast decision for the read-side anti-join) without parsing
    * the ordinals. */
  def count(fs: FileSystem, path: Path): Long = {
    val in = fs.open(path)
    try {
      require(in.readInt() == Magic, s"not a GDV1 deletion vector: $path")
      in.readLong()
    } finally in.close()
  }

  /** Sorted-distinct union of two sorted ordinal arrays (merging a new
    * delete into a file's existing vector). */
  def union(a: Array[Long], b: Array[Long]): Array[Long] = {
    val out = new Array[Long](a.length + b.length)
    var i = 0; var j = 0; var k = 0
    while (i < a.length && j < b.length) {
      val av = a(i); val bv = b(j)
      val v = if (av <= bv) { i += 1; if (av == bv) j += 1; av } else { j += 1; bv }
      if (k == 0 || out(k - 1) != v) { out(k) = v; k += 1 }
    }
    while (i < a.length) { if (k == 0 || out(k - 1) != a(i)) { out(k) = a(i); k += 1 }; i += 1 }
    while (j < b.length) { if (k == 0 || out(k - 1) != b(j)) { out(k) = b(j); k += 1 }; j += 1 }
    java.util.Arrays.copyOf(out, k)
  }

  private def writeVarLong(out: DataOutputStream, value: Long): Unit = {
    var v = value
    while ((v & ~0x7FL) != 0) {
      out.writeByte(((v & 0x7F) | 0x80).toInt)
      v >>>= 7
    }
    out.writeByte(v.toInt)
  }

  private def readVarLong(in: DataInputStream): Long = {
    var shift = 0
    var acc = 0L
    var b = 0
    do {
      b = in.readUnsignedByte()
      acc |= (b & 0x7FL) << shift
      shift += 7
    } while ((b & 0x80) != 0)
    acc
  }
}
