package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Compiled kernels for text shingling (static methods so generated code
  * can call them directly). */
object TextKernels {

  /** Distinct word k-shingles of `text` in first-occurrence order.
    * Split preserves empty tokens (`split(" ", -1)`), matching
    * `split()`/`string_split` semantics in Spark SQL and DuckDB. */
  def wordShingles(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val n = words.length - k + 1
    val seen = new java.util.LinkedHashSet[String](n * 2)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      seen.add(sb.toString)
      i += 1
    }
    val arr = new Array[Any](seen.size)
    val it = seen.iterator
    var m = 0
    while (it.hasNext) { arr(m) = UTF8String.fromString(it.next()); m += 1 }
    new GenericArrayData(arr)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** [[hash60]] of every distinct word k-shingle, in [[wordShingles]]'
    * first-occurrence order — the fused shingle+hash kernel: one call
    * per document, values identical to mapping [[hash60]] over
    * [[wordShingles]] (which the composable `transform(wordShingles,
    * hash60)` did one interpreted lambda per shingle). */
  def shingleHash60s(text: UTF8String, k: Int): ArrayData = {
    val sh = wordShingles(text, k)
    val n = sh.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) { out(i) = hash60(sh.getUTF8String(i)); i += 1 }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }

  /** hash60 of one UTF-8 string: the first 15 hex nibbles of its md5 as
    * a non-negative long — bit-identical to the composable form
    * `conv(substring(md5(s), 1, 15), 16, 10)` ([[graft.pipeline.Dedup
    * .hash60]]) and DuckDB's `CAST('0x' || substr(md5(s),1,15) AS
    * BIGINT)`. */
  def hash60(s: UTF8String): Long = {
    val md = md5Local.get()
    md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 15) {
      val nibble = if (i % 2 == 0) (d(i / 2) >> 4) & 0xF else d(i / 2) & 0xF
      v = (v << 4) | nibble
      i += 1
    }
    v
  }

  /** Hashed bag-of-words histogram: split on ' ', drop empty tokens,
    * hash60 each token mod `buckets`, count per bucket — the whole
    * feature map as ONE kernel call per document. The composable form
    * (per-bucket `filter` over a `transform`ed hash array) evaluates
    * O(buckets · tokens) interpreted lambdas per row and dominated the
    * classifier's scoring cost ~3 ms/doc at 32 buckets. */
  def bowCounts(text: UTF8String, buckets: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val counts = new Array[Int](buckets)
    var i = 0
    while (i < words.length) {
      if (words(i).nonEmpty) {
        val h = hash60(UTF8String.fromString(words(i)))
        counts((h % buckets).toInt) += 1
      }
      i += 1
    }
    new GenericArrayData(counts.map(c => c: java.lang.Integer).toArray[Any])
  }

  /** 60-bit SimHash of `text` as ONE kernel call: split on ' ' (empties
    * kept — `split(" ", -1)`, matching `string_split`), hash60 each
    * word, majority-vote per bit (ones·2 >= words). Bit-identical to
    * the exploded groupBy form (words × 60 skinny rows + two
    * aggregations) this replaces — same per-word hashes, same vote —
    * but the whole fingerprint is a pure projection of the document
    * scan: zero shuffle at any corpus size, and no 60× map-side row
    * explosion feeding partial aggregation. */
  def simhash60(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    val ones = new Array[Int](60)
    var i = 0
    while (i < words.length) {
      val h = hash60(UTF8String.fromString(words(i)))
      var b = 0
      while (b < 60) { ones(b) += ((h >>> b) & 1L).toInt; b += 1 }
      i += 1
    }
    var v = 0L
    var b = 0
    while (b < 60) {
      if (ones(b).toLong * 2 >= words.length) v |= 1L << b
      b += 1
    }
    v
  }

  /** Bloom contamination counters of one document as ONE kernel call:
    * `[n_shingles, n_overlap]` where n_overlap counts the distinct
    * k-shingles whose `numHashes` salted probe positions
    * (hash60(h ':' i) mod mBits — [[graft.pipeline.TextOps.bloomBits]]'
    * arithmetic exactly) are ALL set in the packed `bits` table
    * (LSB-first within each byte, position p at byte p>>3 bit p&7 —
    * [[graft.pipeline.TextOps.packBloom]]'s layout). A pure projection:
    * the join form's per-(doc, shingle, probe) row explosion, broadcast
    * probe join and two doc-keyed aggregations collapse into a
    * zero-shuffle map over the corpus scan.
    *
    * Counted per DISTINCT HASH, replaying the join form's group
    * arithmetic exactly — the (id, h) group there accumulates one
    * joined row per (duplicate shingle × set probe), so a hash shared
    * by m distinct shingles with s set probes passes its
    * `n_set == numHashes` gate iff m·s == numHashes (m = 1 is the
    * ordinary case; a hash60 collision inside one document makes the
    * join form count the GROUP, or at the right m·s even a
    * partially-set one). Astronomically rare at ~n²/2⁶¹, but the three
    * Bloom forms are pinned bit-identical under one oracle, so the
    * kernel reproduces the rule rather than approximating it. */
  def bloomOverlap(text: UTF8String, k: Int, bits: Array[Byte],
      mBits: Int, numHashes: Int): ArrayData = {
    val sh = wordShingles(text, k)
    val n = sh.numElements()
    val mult = new java.util.LinkedHashMap[java.lang.Long, Integer](n * 2)
    var idx = 0
    while (idx < n) {
      val h = hash60(sh.getUTF8String(idx))
      val prev = mult.get(h)
      mult.put(h, if (prev == null) 1 else prev + 1)
      idx += 1
    }
    var overlap = 0
    val it = mult.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val h: Long = e.getKey
      var setProbes = 0
      var i = 0
      while (i < numHashes) {
        val p = (hash60(UTF8String.fromString(
          java.lang.Long.toString(h) + ":" + i)) % mBits).toInt
        if ((bits(p >> 3) & (1 << (p & 7))) != 0) setProbes += 1
        i += 1
      }
      if (e.getValue * setProbes == numHashes) overlap += 1
    }
    new GenericArrayData(Array[Any](n, overlap))
  }

  /** ALL word k-shingles in positional order (duplicates kept) — the
    * sequence form required by positional algorithms (winnowing). */
  def wordShinglesAll(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    if (words.length < k) return new GenericArrayData(Array.empty[Any])
    val n = words.length - k + 1
    val arr = new Array[Any](n)
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i < n) {
      sb.setLength(0)
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(words(i + j))
        j += 1
      }
      arr(i) = UTF8String.fromString(sb.toString)
      i += 1
    }
    new GenericArrayData(arr)
  }
}

/** Native expressions for the dedup/text pipeline.
  *
  * The composable form (`transform(sequence(...), i -> array_join(slice(
  * words, i, k), ' '))`) evaluates an interpreted lambda — with an array
  * copy — per shingle per document; at corpus scale the shingling pass
  * dominates MinHash/Jaccard dedup cost. [[TextExpressions.WordShingles]]
  * is one compiled kernel call per document instead, and dedups in-array
  * so no `distinct` shuffle is needed afterwards (each document is a
  * single input row, so per-document dedup == global (id, shingle)
  * dedup).
  */
object TextExpressions {

  case class WordShingles(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles"

    override protected def nullSafeEval(input: Any): Any =
      TextKernels.wordShingles(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.wordShingles($c, $k);")

    override protected def withNewChildInternal(newChild: Expression): WordShingles =
      copy(child = newChild)
  }

  case class WordShinglesAll(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(StringType, containsNull = false)
    override def prettyName: String = "word_shingles_all"

    override protected def nullSafeEval(input: Any): Any =
      TextKernels.wordShinglesAll(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.wordShinglesAll($c, $k);")

    override protected def withNewChildInternal(newChild: Expression): WordShinglesAll =
      copy(child = newChild)
  }

  case class BowCounts(child: Expression, buckets: Int) extends UnaryExpression {
    require(buckets >= 1, "bucket count must be >= 1")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bow_counts"

    override protected def nullSafeEval(input: Any): Any =
      TextKernels.bowCounts(input.asInstanceOf[UTF8String], buckets)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.bowCounts($c, $buckets);")

    override protected def withNewChildInternal(newChild: Expression): BowCounts =
      copy(child = newChild)
  }

  case class ShingleHash60s(child: Expression, k: Int) extends UnaryExpression {
    require(k >= 1, "shingle size must be >= 1")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "shingle_hash60s"

    override protected def nullSafeEval(input: Any): Any =
      TextKernels.shingleHash60s(input.asInstanceOf[UTF8String], k)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.shingleHash60s($c, $k);")

    override protected def withNewChildInternal(newChild: Expression): ShingleHash60s =
      copy(child = newChild)
  }

  /** The full MinHash signature of one hash array as ONE kernel call:
    * element i = min over the array of (aᵢ·(h mod prime) + bᵢ) mod
    * prime — the same affine arithmetic as the composable
    * `array_min(transform(...))` chain (interpreted, one lambda per
    * (shingle, perm)) and as the exploded groupBy's `min(pmod(...))`
    * aggregates (codegen'd, but an exchange of |docs × shingles| rows).
    * This kernel is both: codegen'd AND a pure per-row projection —
    * signature construction never shuffles at any corpus size. Callers
    * guard non-empty input (as every signature path already does: an
    * empty shingle set produces no signature row). */
  case class MinhashSig(child: Expression, as: Seq[Long], bs: Seq[Long],
      prime: Long) extends UnaryExpression {
    require(as.nonEmpty && as.size == bs.size,
      "need one (a, b) parameter pair per permutation")
    require(prime > 0, "prime must be positive")
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def prettyName: String = "minhash_sig"
    @transient private lazy val aArr: Array[Long] = as.toArray
    @transient private lazy val bArr: Array[Long] = bs.toArray

    /** The signature loop — public so generated code can call it. */
    def sig(hs: ArrayData): ArrayData = {
      val n = hs.numElements()
      val m = new Array[Long](aArr.length)
      java.util.Arrays.fill(m, Long.MaxValue)
      var i = 0
      while (i < n) {
        var hb = hs.getLong(i) % prime
        if (hb < 0) hb += prime // pmod, exactly
        var j = 0
        while (j < aArr.length) {
          var r = (hb * aArr(j) + bArr(j)) % prime
          if (r < 0) r += prime
          if (r < m(j)) m(j) = r
          j += 1
        }
        i += 1
      }
      org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
        .fromPrimitiveArray(m)
    }

    override protected def nullSafeEval(input: Any): Any =
      sig(input.asInstanceOf[ArrayData])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("minhashSig", this,
        classOf[MinhashSig].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.sig($c);")
    }

    override protected def withNewChildInternal(newChild: Expression): MinhashSig =
      copy(child = newChild)
  }

  case class Simhash60(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "simhash60"

    override protected def nullSafeEval(input: Any): Any =
      TextKernels.simhash60(input.asInstanceOf[UTF8String])

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c =>
        s"${ev.value} = graft.functions.TextKernels.simhash60($c);")

    override protected def withNewChildInternal(newChild: Expression): Simhash60 =
      copy(child = newChild)
  }

  case class BloomOverlap(child: Expression, k: Int, bits: Array[Byte],
      mBits: Int, numHashes: Int) extends UnaryExpression {
    require(k >= 1 && mBits > 0 && numHashes > 0,
      "shingle size, mBits and numHashes must be positive")
    require(bits.length == (mBits + 7) >> 3,
      s"packed bloom table must hold exactly mBits=$mBits bits")
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bloom_overlap"

    override protected def nullSafeEval(input: Any): Any =
      TextKernels.bloomOverlap(input.asInstanceOf[UTF8String], k, bits,
        mBits, numHashes)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val bitsRef = ctx.addReferenceObj("bloomBits", bits, "byte[]")
      nullSafeCodeGen(ctx, ev, c =>
        s"""${ev.value} = graft.functions.TextKernels.bloomOverlap(
              $c, $k, $bitsRef, $mBits, $numHashes);""")
    }

    override protected def withNewChildInternal(newChild: Expression): BloomOverlap =
      copy(child = newChild)
  }

  /** 60-bit SimHash fingerprint of a string column (one compiled kernel
    * call per document — a pure projection, no per-bit row explosion). */
  def simhash60(text: Column): Column =
    Bridge.column(Simhash60(Bridge.expression(text)))

  /** `[n_shingles, n_overlap]` of a document against a packed Bloom
    * table (one compiled kernel call — the whole contamination probe as
    * a zero-shuffle projection). */
  def bloomOverlap(text: Column, k: Int, bits: Array[Byte], mBits: Int,
      numHashes: Int): Column =
    Bridge.column(BloomOverlap(Bridge.expression(text), k, bits, mBits,
      numHashes))

  /** Hashed bag-of-words bucket counts of a string column (one compiled
    * kernel call per document). */
  def bowCounts(text: Column, buckets: Int): Column =
    Bridge.column(BowCounts(Bridge.expression(text), buckets))

  /** Distinct word k-shingles (first-occurrence order) of a string column. */
  def wordShingles(text: Column, k: Int): Column =
    Bridge.column(WordShingles(Bridge.expression(text), k))

  /** All word k-shingles in positional order (duplicates kept). */
  def wordShinglesAll(text: Column, k: Int): Column =
    Bridge.column(WordShinglesAll(Bridge.expression(text), k))

  /** hash60 of each distinct word k-shingle, first-occurrence order. */
  def shingleHash60s(text: Column, k: Int): Column =
    Bridge.column(ShingleHash60s(Bridge.expression(text), k))

  /** The numPerm-element MinHash signature of a hash60 array. */
  def minhashSig(hashes: Column, params: Seq[(Long, Long)],
      prime: Long): Column =
    Bridge.column(MinhashSig(Bridge.expression(hashes),
      params.map(_._1), params.map(_._2), prime))
}
