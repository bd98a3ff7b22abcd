package graft

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream}

import org.apache.spark.sql.SparkSession

/** Frozen-model persistence (round 20, VERDICT r19 item 1): the shared
  * binary codec behind every fit→freeze model's `save`/`load` —
  * [[TextOps.LangIdProfile]], [[TextOps.NbTextModel]],
  * [[TextOps.BigramLm]]/[[TextOps.TrigramLm]]/[[TextOps.NgramLm]],
  * [[TextOps.DsirModel]], [[TextOps.CalibrationModel]],
  * [[TextOps.BpeModel]], and [[Similarity.KmeansModel]]. Same pattern as
  * [[Pq.PqModel.save]] (the round-17 original): the model is KB-sized
  * driver-held metadata, written through the Hadoop filesystem API so
  * one code path covers local disk and cluster stores alike — exactly
  * how MLlib persists model metadata.
  *
  * Why not Java serialization: these models freeze published gates, and
  * a gate must reload BIT-IDENTICALLY years later from a different JVM /
  * Scala minor version. A hand-pinned field codec (explicit ints, longs,
  * IEEE-754 bits via DataOutputStream, UTF-8 length-prefixed strings —
  * never `writeUTF`, whose 64 KB modified-UTF-8 limit a BPE vocab word
  * or URL-ish token could in principle trip) has no hidden
  * serialVersionUID coupling. Every file opens with a magic + a KIND
  * tag + a version, so loading the wrong model type fails loudly with
  * both names instead of mis-parsing.
  *
  * `load` also registers the graft kernel functions on the given
  * session ([[functions.VectorFunctions.register]]): the frozen score
  * columns resolve session-local temp functions (`lm_score`,
  * `gram_sum`, `nb_score`, …), so a model loaded into a FRESH serving
  * session — the cross-session story these loaders exist for ("gate
  * today's arrivals against last month's model") — must bring its
  * kernels along or fail analysis with "undefined function" (the
  * round-19 ADVICE trap). ModelServingSpec pins load-then-score on a
  * brand-new session state.
  */
object ModelIO {

  private val Magic: Int = 0x47524654 // "GRFT"
  private val Version: Int = 1

  private[graft] def save(spark: SparkSession, path: String, kind: String)(
      write: DataOutputStream => Unit): Unit = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = new DataOutputStream(new BufferedOutputStream(fs.create(p, true)))
    try {
      out.writeInt(Magic)
      writeString(out, kind)
      out.writeInt(Version)
      write(out)
    } finally out.close()
  }

  private[graft] def load[T](spark: SparkSession, path: String, kind: String)(
      read: DataInputStream => T): T = {
    functions.VectorFunctions.register(spark)
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val in = new DataInputStream(new BufferedInputStream(fs.open(p)))
    try {
      val magic = in.readInt()
      require(magic == Magic,
        s"$path is not a graft model file (magic ${magic.toHexString})")
      val gotKind = readString(in)
      require(gotKind == kind,
        s"$path holds a '$gotKind' model, not the requested '$kind'")
      val v = in.readInt()
      require(v == Version, s"$path has codec version $v, this build reads $Version")
      val model = read(in)
      // Loud-failure contract, tail end: a file that parsed but has
      // bytes left is NOT the model that was saved (a concatenation,
      // a partial overwrite, or a codec drift between save and load) —
      // mis-parsing silently is the exact failure mode this codec
      // exists to prevent.
      require(in.read() == -1,
        s"$path has trailing bytes after the '$kind' model — corrupt " +
          "or written by a different codec")
      model
    } finally in.close()
  }

  /** Every collection is length-prefixed; a corrupt/bit-flipped prefix
    * must fail loudly, not truncate — `IndexedSeq.fill(-n)` silently
    * returns empty, which would load a gate model with EMPTY tables
    * that then passes everything. */
  private def checkedCount(in: DataInputStream): Int = {
    val n = in.readInt()
    require(n >= 0, s"corrupt model file: negative collection count $n")
    n
  }

  // ---- field primitives (all length-prefixed, deterministic order) -------

  private[graft] def writeString(out: DataOutputStream, s: String): Unit = {
    val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    out.writeInt(b.length); out.write(b)
  }

  private[graft] def readString(in: DataInputStream): String = {
    val n = in.readInt()
    require(n >= 0, s"corrupt model file: negative string length $n")
    val b = new Array[Byte](n)
    in.readFully(b)
    new String(b, java.nio.charset.StandardCharsets.UTF_8)
  }

  private[graft] def writeStrings(out: DataOutputStream, xs: Seq[String]): Unit = {
    out.writeInt(xs.length); xs.foreach(writeString(out, _))
  }

  private[graft] def readStrings(in: DataInputStream): IndexedSeq[String] =
    IndexedSeq.fill(checkedCount(in))(readString(in))

  private[graft] def writeLongs(out: DataOutputStream, xs: Seq[Long]): Unit = {
    out.writeInt(xs.length); xs.foreach(out.writeLong)
  }

  private[graft] def readLongs(in: DataInputStream): IndexedSeq[Long] =
    IndexedSeq.fill(checkedCount(in))(in.readLong())

  private[graft] def writeLongs2(out: DataOutputStream, xs: Seq[Seq[Long]]): Unit = {
    out.writeInt(xs.length); xs.foreach(writeLongs(out, _))
  }

  private[graft] def readLongs2(in: DataInputStream): IndexedSeq[IndexedSeq[Long]] =
    IndexedSeq.fill(checkedCount(in))(readLongs(in))

  private[graft] def writeInts(out: DataOutputStream, xs: Seq[Int]): Unit = {
    out.writeInt(xs.length); xs.foreach(out.writeInt)
  }

  private[graft] def readInts(in: DataInputStream): IndexedSeq[Int] =
    IndexedSeq.fill(checkedCount(in))(in.readInt())

  private[graft] def writeInts2(out: DataOutputStream, xs: Seq[Seq[Int]]): Unit = {
    out.writeInt(xs.length); xs.foreach(writeInts(out, _))
  }

  private[graft] def readInts2(in: DataInputStream): IndexedSeq[IndexedSeq[Int]] =
    IndexedSeq.fill(checkedCount(in))(readInts(in))

  /** Map entries are written in key order — a reload of a reload is
    * byte-identical on disk, not just value-equal. Doubles go through
    * DataOutputStream's IEEE-754 bits (exact round-trip). */
  private[graft] def writeStringDoubleMap(out: DataOutputStream,
      m: Map[String, Double]): Unit = {
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      writeString(out, k); out.writeDouble(v)
    }
  }

  private[graft] def readStringDoubleMap(in: DataInputStream): Map[String, Double] =
    Seq.fill(checkedCount(in))(readString(in) -> in.readDouble()).toMap

  private[graft] def writeStringLongsMap(out: DataOutputStream,
      m: Map[String, Seq[Long]]): Unit = {
    out.writeInt(m.size)
    m.toSeq.sortBy(_._1).foreach { case (k, v) =>
      writeString(out, k); writeLongs(out, v)
    }
  }

  private[graft] def readStringLongsMap(in: DataInputStream): Map[String, Seq[Long]] =
    Seq.fill(checkedCount(in))(readString(in) -> readLongs(in)).toMap
}
