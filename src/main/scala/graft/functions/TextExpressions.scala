package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the text-signature hot loops.
  *
  * The portable formulations ([[graft.operators.Dedup.simhashHof]],
  * [[graft.operators.Dedup.minhashSignatureHof]],
  * [[graft.operators.TextAnalysis.hitCountHof]]) fold with interpreted
  * higher-order functions: simhash costs tokens×64 interpreted lambda
  * evaluations plus a fresh 64-element counter array per token, minhash
  * the same per shingle. These expressions run the identical math as one
  * codegen'd primitive loop per row.
  *
  * Bit-compatibility: token/shingle hashing reuses Spark's own
  * [[XXH64]] with the default seed 42 and the exact chaining the HOF
  * forms produce through `xxhash64(...)`, so signatures — and therefore
  * every downstream LSH bucket and candidate pair — are unchanged.
  */
object TextExpressions {
  /** xxhash64 default seed (XxHash64 expression's). */
  final val Seed = 42L

  /** xxhash64(s): null element hashes to the bare seed, matching
    * `transform(arr, s => xxhash64(s))` on a null entry.
    */
  @inline def hashElem(arr: ArrayData, i: Int): Long =
    if (arr.isNullAt(i)) Seed else XXH64.hashUTF8String(arr.getUTF8String(i), Seed)

  // -- engine-portable md5 primitives ---------------------------------------

  /** The Mersenne prime 2³¹−1 — modulus of the portable minhash family. */
  final val PortableP = 2147483647L

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(s) as a non-negative long — the one hash
    * primitive Spark and DuckDB both compute
    * (`('0x' || substr(md5(s), 1, 15))::BIGINT` /
    * `conv(substring(md5(s), 1, 15), 16, 10)`).
    */
  def md5Prefix60(s: UTF8String): Long = {
    val md = md5Local.get(); md.reset()
    val d = md.digest(s.getBytes)
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** [[md5Prefix60]] over a byte range — the zero-slice-allocation form
    * the CDC boundary scan uses per window position.
    */
  @inline def md5Prefix60Range(bytes: Array[Byte], off: Int, len: Int): Long = {
    val md = md5Local.get(); md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    (v << 4) | ((d(7) & 0xf0L) >>> 4)
  }

  /** Content-defined-chunking cut positions of a text in one pass:
    * every 1-based start position i in [2, numChars−7] whose 8-char
    * window has `md5Prefix60 % mod == 0`. Element-for-element equal to
    * the exploded formulation
    * `filter(i in sequence(2, len-7), graft_md5_hash60(substr(text, i, 8)) % mod = 0)`
    * — same codepoint slicing (char→byte offsets walked once), same md5
    * primitive — but the len× candidate rows never exist: the explode
    * downstream emits only the ~len/mod boundary hits.
    */
  def cdcBoundaryPositions(s: UTF8String, mod: Long): ArrayData = {
    val n = s.numChars()
    if (n < 9)
      return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val bytes = s.getBytes
    // char→byte offset table (offs(c) = byte offset of 0-based char c)
    val offs = new Array[Int](n + 1)
    var c = 0
    var b = 0
    while (b < bytes.length) {
      offs(c) = b
      b += UTF8String.numBytesForFirstByte(bytes(b))
      c += 1
    }
    offs(n) = bytes.length
    val builder = new scala.collection.mutable.ArrayBuilder.ofLong
    var st = 2 // 1-based window start, window chars [st-1, st+7)
    while (st <= n - 7) {
      val from = offs(st - 1)
      val to = offs(st + 7)
      if (md5Prefix60Range(bytes, from, to - from) % mod == 0L)
        builder += st.toLong
      st += 1
    }
    UnsafeArrayData.fromPrimitiveArray(builder.result())
  }

  /** 60-bit md5 SimHash — the native twin of `Dedup.simhashPortableHof`.
    * Null elements vote −1 on every lane (what the HOF's three-valued
    * `when` does on a null hash).
    */
  def simhashMd5(arr: ArrayData): Long = {
    val n = arr.numElements()
    val cnt = new Array[Int](60)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) {
        var j = 0; while (j < 60) { cnt(j) -= 1; j += 1 }
      } else {
        val h = md5Prefix60(arr.getUTF8String(i))
        var j = 0
        while (j < 60) {
          cnt(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (cnt(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** Portable minhash lanes — the native twin of
    * `Dedup.minhashSignaturePortableHof`: hm = md5Prefix60 mod p, lane j
    * tracks min of ((2j+1)·hm + 12347·j + 1) mod p. Null elements are
    * skipped (the HOF's `least(acc, null)` keeps the accumulator).
    */
  def minhashMd5(arr: ArrayData, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(PortableP)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val hm = md5Prefix60(arr.getUTF8String(i)) % PortableP
        var j = 0
        while (j < numHashes) {
          val v = ((j * 2 + 1) * hm + j * 12347L + 1) % PortableP
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  // -- PII byte-level matchers ([[PiiScan]]) --------------------------------
  // All pattern chars are ASCII, so the scans run on raw UTF-8 bytes;
  // see the PiiScan scaladoc for the Java-regex-equivalence argument.

  private[functions] val EmailTag = "<EMAIL>".getBytes("UTF-8")
  private[functions] val PhoneTag = "<PHONE>".getBytes("UTF-8")
  private[functions] val UrlTag = "<URL>".getBytes("UTF-8")

  @inline private def isAlphaB(b: Byte): Boolean =
    (b >= 'A' && b <= 'Z') || (b >= 'a' && b <= 'z')
  @inline private def isDigitB(b: Byte): Boolean = b >= '0' && b <= '9'
  // [A-Za-z0-9._%+-]
  @inline private def isLocalB(b: Byte): Boolean =
    isAlphaB(b) || isDigitB(b) || b == '.' || b == '_' || b == '%' ||
      b == '+' || b == '-'
  // [A-Za-z0-9.-]
  @inline private def isDomainB(b: Byte): Boolean =
    isAlphaB(b) || isDigitB(b) || b == '.' || b == '-'
  // Java \s (default, non-UNICODE): [ \t\n\x0B\f\r]
  @inline private def isSpaceB(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == 0x0b || b == '\f' || b == '\r'

  private[functions] def spanCount(spans: Array[Int]): Int = spans.length / 2

  /** Non-overlapping leftmost matches of the email pattern, as flattened
    * (start, end) byte offsets. See [[PiiScan]] for the backtracking
    * argument; this is the Java engine's search order made explicit.
    */
  private[functions] def findEmails(s: Array[Byte]): Array[Int] = {
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var prevEnd = 0
    var at = 1 // '@' needs ≥1 local char before it
    while (at < n) {
      if (s(at) != '@') at += 1
      else {
        var matchedEnd = -1
        if (at - 1 >= prevEnd && isLocalB(s(at - 1))) {
          // greedy local part: no backtracking possible ('@' ∉ class)
          var l0 = at - 1
          while (l0 > prevEnd && isLocalB(s(l0 - 1))) l0 -= 1
          val b0 = at + 1
          if (b0 < n && isDomainB(s(b0))) {
            var b1 = b0 + 1
            while (b1 < n && isDomainB(s(b1))) b1 += 1
            // domain backtracking: split the maximal run at the
            // RIGHTMOST '.' that leaves ≥2 letters (greedy maximal run)
            var k = b1 - 1
            while (k >= b0 + 1 && matchedEnd < 0) {
              if (s(k) == '.') {
                var m = k + 1
                while (m < b1 && isAlphaB(s(m))) m += 1
                if (m - (k + 1) >= 2) { out += l0; out += m; matchedEnd = m }
              }
              k -= 1
            }
          }
        }
        if (matchedEnd >= 0) { prevEnd = matchedEnd; at = matchedEnd + 1 }
        else at += 1
      }
    }
    out.toArray
  }

  /** Non-overlapping leftmost matches of `\d{3}[-.]\d{3}[-.]\d{4}`. */
  private[functions] def findPhones(s: Array[Byte]): Array[Int] = {
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    @inline def sep(b: Byte): Boolean = b == '-' || b == '.'
    var i = 0
    while (i + 12 <= n) {
      if (isDigitB(s(i)) && isDigitB(s(i + 1)) && isDigitB(s(i + 2)) &&
        sep(s(i + 3)) &&
        isDigitB(s(i + 4)) && isDigitB(s(i + 5)) && isDigitB(s(i + 6)) &&
        sep(s(i + 7)) &&
        isDigitB(s(i + 8)) && isDigitB(s(i + 9)) && isDigitB(s(i + 10)) &&
        isDigitB(s(i + 11))) {
        out += i; out += i + 12
        i += 12
      } else i += 1
    }
    out.toArray
  }

  /** Non-overlapping leftmost matches of `https?://[^\s]+`. */
  private[functions] def findUrls(s: Array[Byte]): Array[Int] = {
    val n = s.length
    val out = new scala.collection.mutable.ArrayBuffer[Int]()
    var i = 0
    while (i + 8 <= n) { // "http://" + ≥1 tail byte is the minimum
      if (s(i) == 'h' && s(i + 1) == 't' && s(i + 2) == 't' &&
        s(i + 3) == 'p') {
        // optional 's' tried greedily first — Java's order. No explicit
        // give-back branch is needed: when the 's' is taken, the
        // without-'s' alternative would require ':' at the position the
        // 's' occupies, which can never hold — the single shifted check
        // below therefore covers the full backtracking order.
        var j = i + 4
        if (j < n && s(j) == 's') j += 1
        var end = -1
        if (j + 2 < n && s(j) == ':' && s(j + 1) == '/' && s(j + 2) == '/') {
          val tail0 = j + 3
          var m = tail0
          while (m < n && !isSpaceB(s(m))) m += 1
          if (m > tail0) end = m
        }
        if (end > 0) { out += i; out += end; i = end } else i += 1
      } else i += 1
    }
    out.toArray
  }

  /** Replace every (start, end) span with `tag`, in one output build. */
  private[functions] def replaceSpans(s: Array[Byte], spans: Array[Int],
      tag: Array[Byte]): Array[Byte] = {
    if (spans.isEmpty) return s
    var kept = 0
    var i = 0
    while (i < spans.length) { kept += spans(i + 1) - spans(i); i += 2 }
    val out = new Array[Byte](s.length - kept + (spans.length / 2) * tag.length)
    var src = 0
    var dst = 0
    i = 0
    while (i < spans.length) {
      val st = spans(i); val en = spans(i + 1)
      System.arraycopy(s, src, out, dst, st - src); dst += st - src
      System.arraycopy(tag, 0, out, dst, tag.length); dst += tag.length
      src = en
      i += 2
    }
    System.arraycopy(s, src, out, dst, s.length - src)
    out
  }
}

private[functions] trait StringArrayInput { self: Expression =>
  protected def arrayChild: Expression
  def checkStringArray(): TypeCheckResult = arrayChild.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires an array<string> input, got ${other.sql}")
  }
}

/** 64-bit SimHash of a token array in one pass. SQL name: `graft_simhash`.
  *
  * Per token t: h = xxhash64(t); lane j accumulates +1 when bit j of h is
  * set, else −1; the signature sets bit j iff lane j's sum is positive.
  * Empty input → 0L; null input → null.
  */
case class SimHash64(child: Expression) extends UnaryExpression with StringArrayInput {
  import TextExpressions._

  override protected def arrayChild: Expression = child
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = checkStringArray()
  override def prettyName: String = "graft_simhash"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val cnt = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = hashElem(arr, i)
      var j = 0
      while (j < 64) {
        cnt(j) += (if (((h >> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) {
      if (cnt(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val h = ctx.freshName("h")
      val cnt = ctx.freshName("cnt"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |int[] $cnt = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    $cnt[$j] += ((($h >> $j) & 1L) == 1L) ? 1 : -1;
         |  }
         |}
         |long $sig = 0L;
         |for (int $j = 0; $j < 64; $j++) {
         |  if ($cnt[$j] > 0) $sig |= 1L << $j;
         |}
         |${ev.value} = $sig;
       """.stripMargin
    })
}

/** MinHash signature of a shingle array in one pass. SQL name:
  * `graft_minhash(shingles, numHashes)`.
  *
  * Per shingle s: h = xxhash64(s); lane j tracks min over s of
  * xxhash64(h, j) — chained as hashInt(j, hashLong(h, seed)), exactly
  * what the two-argument `xxhash64(h, j)` builtin computes on
  * (long, int) inputs. Empty input → all-Long.MaxValue lanes; null
  * input → null.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression with StringArrayInput {
  import TextExpressions._

  override protected def arrayChild: Expression = child
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (numHashes <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numHashes > 0, got $numHashes")
    else checkStringArray()
  override def prettyName: String = "graft_minhash"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val sig = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val hl = XXH64.hashLong(hashElem(arr, i), Seed)
      var j = 0
      while (j < numHashes) {
        val v = XXH64.hashInt(j, hl)
        if (v < sig(j)) sig(j) = v
        j += 1
      }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(sig)
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val n = ctx.freshName("n"); val hl = ctx.freshName("hl")
      val v = ctx.freshName("v"); val sig = ctx.freshName("sig")
      s"""
         |int $n = $a.numElements();
         |long[] $sig = new long[$numHashes];
         |java.util.Arrays.fill($sig, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $hl = $xxh.hashLong($a.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($i), 42L), 42L);
         |  for (int $j = 0; $j < $numHashes; $j++) {
         |    long $v = $xxh.hashInt($j, $hl);
         |    if ($v < $sig[$j]) $sig[$j] = $v;
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray($sig);
       """.stripMargin
    })
}

/** 60-bit ENGINE-PORTABLE SimHash (md5 token hashes) in one pass. SQL
  * name: `graft_simhash_md5`. The native fast path of
  * [[graft.operators.Dedup.simhashPortable]] — bit-identical to its
  * higher-order twin, and reproducible by the DuckDB oracle because the
  * only hash involved is md5. Empty input → 0L; null input → null.
  */
case class SimHashMd5(child: Expression) extends UnaryExpression with StringArrayInput {
  import TextExpressions._

  override protected def arrayChild: Expression = child
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = checkStringArray()
  override def prettyName: String = "graft_simhash_md5"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    simhashMd5(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      // the md5 loop lives in a static helper: the generated code stays a
      // single call inside the whole-stage pipeline (same shape as the
      // XXH64 static calls above; scalac emits static forwarders for
      // object methods)
      s"${ev.value} = graft.functions.TextExpressions.simhashMd5($a);"
    })
}

/** First 60 bits of md5(s) as a non-negative long — the SCALAR twin of
  * the portable-hash family's per-shingle primitive, for queries that
  * hash ONE token per row (feature hashing) where the interpreted
  * `conv(substring(md5(w), 1, 15), 16, 10)` chain allocates a hex string,
  * a substring copy, and a base-16 parse per token. SQL name:
  * `graft_md5_hash60`. Bit-identical to DuckDB's
  * `('0x' || substr(md5(s), 1, 15))::BIGINT` (TextExpressionsSpec pins it
  * against the conv-chain on real tokens).
  */
case class Md5Hash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.catalogString}")
  }
  override def prettyName: String = "graft_md5_hash60"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    TextExpressions.md5Prefix60(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextExpressions.md5Prefix60($a);")
}

/** CDC cut positions of a text (see
  * [[TextExpressions.cdcBoundaryPositions]]). SQL name:
  * `graft_cdc_boundaries(text, mod)`. Differential-pinned against the
  * exploded `graft_md5_hash60(substr(...)) % mod` chain it replaces.
  */
case class CdcBoundaries(child: Expression, mod: Long) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (mod <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires mod > 0, got $mod")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.sql}")
    }
  override def prettyName: String = "graft_cdc_boundaries"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    TextExpressions.cdcBoundaryPositions(input.asInstanceOf[UTF8String], mod)

  // same stance as CharGramHashes: the work is md5 over byte windows
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val cls = classOf[CdcBoundaries].getName
      val ref = ctx.addReferenceObj("cdcBoundariesExpr", this, cls)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($str);"
    })
}

/** ENGINE-PORTABLE minhash lanes (md5 + affine family mod 2³¹−1) in one
  * pass. SQL name: `graft_minhash_md5(shingles, numHashes)`. Native fast
  * path of [[graft.operators.Dedup.minhashSignaturePortable]] —
  * bit-identical to its higher-order twin. Empty input → all-p lanes;
  * null input → null.
  */
case class MinHashSigMd5(child: Expression, numHashes: Int)
    extends UnaryExpression with StringArrayInput {
  import TextExpressions._

  override protected def arrayChild: Expression = child
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (numHashes <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires numHashes > 0, got $numHashes")
    else checkStringArray()
  override def prettyName: String = "graft_minhash_md5"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any =
    minhashMd5(input.asInstanceOf[ArrayData], numHashes)

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      s"${ev.value} = graft.functions.TextExpressions.minhashMd5($a, $numHashes);"
    })
}

/** Distinct k-word shingles of a token array, space-joined. SQL name:
  * `graft_shingles(tokens, k)`.
  *
  * Matches [[graft.operators.Dedup.shinglesHof]] exactly: fewer than k
  * tokens → one whole-text shingle; otherwise every full k-gram, distinct
  * with first-occurrence order; null tokens are skipped inside a window
  * (concat_ws semantics). CodegenFallback: the work is UTF8String concat
  * and set insertion — object construction either way — so generated code
  * would only save the boxed eval call; the surrounding plan still
  * whole-stage-codegens.
  */
case class WordKGrams(child: Expression, k: Int)
    extends UnaryExpression with StringArrayInput
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override protected def arrayChild: Expression = child
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(s"$prettyName requires k > 0, got $k")
    else checkStringArray()
  override def prettyName: String = "graft_shingles"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  private val space = UTF8String.fromString(" ")

  private def window(arr: ArrayData, from: Int, len: Int): UTF8String = {
    val parts = new Array[UTF8String](len)
    var i = 0
    while (i < len) {
      parts(i) = if (arr.isNullAt(from + i)) null else arr.getUTF8String(from + i)
      i += 1
    }
    UTF8String.concatWs(space, parts: _*)
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) {
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        Array[Any](window(arr, 0, n)))
    } else {
      val set = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= n - k) {
        set.add(window(arr, i, k))
        i += 1
      }
      new org.apache.spark.sql.catalyst.util.GenericArrayData(
        set.toArray.asInstanceOf[Array[AnyRef]])
    }
  }
}

/** Argmax language by stopword hits, in one pass over the token array.
  * SQL name: `graft_lang_best(tokens, langs, wordSets)`; langs
  * (array<string>) and wordSets (array<array<string>>, same length) must
  * be foldable.
  *
  * Semantics match the greatest-over-structs formulation in
  * [[graft.operators.TextAnalysis.langId]]'s HOF twin: most hits wins,
  * ties break to the earlier language, zero hits everywhere → 'und',
  * null tokens array → null. One expression instead of a per-language
  * scoring tree keeps the generated code (and its Janino compile time)
  * flat. CodegenFallback: the row cost is the token loop itself, so
  * generated glue would only remove one boxed call per row.
  */
case class BestLangByHits(first: Expression, second: Expression, third: Expression)
    extends org.apache.spark.sql.catalyst.expressions.TernaryExpression
    with StringArrayInput
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override protected def arrayChild: Expression = first
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_lang_best"
  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): Expression =
    copy(first = f, second = s, third = t)

  override def checkInputDataTypes(): TypeCheckResult = {
    val tokensOk = checkStringArray()
    if (tokensOk != TypeCheckResult.TypeCheckSuccess) return tokensOk
    if (!second.foldable || !third.foldable)
      return TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires foldable language and word-set lists")
    (second.dataType, third.dataType) match {
      case (ArrayType(StringType, _), ArrayType(ArrayType(StringType, _), _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, w) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires (array<string>, array<array<string>>), got ${l.sql}, ${w.sql}")
    }
  }

  @transient private lazy val langs: Array[UTF8String] = {
    val arr = second.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements())(i => arr.getUTF8String(i))
  }

  @transient private lazy val wordSets: Array[java.util.HashSet[UTF8String]] = {
    val arr = third.eval(null).asInstanceOf[ArrayData]
    Array.tabulate(arr.numElements()) { i =>
      val s = new java.util.HashSet[UTF8String]()
      val ws = arr.getArray(i)
      var j = 0
      while (j < ws.numElements()) { s.add(ws.getUTF8String(j)); j += 1 }
      s
    }
  }

  private val und = UTF8String.fromString("und")

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val tokens = first.eval(input)
    if (tokens == null) return null
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](langs.length)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        var d = 0
        while (d < wordSets.length) {
          if (wordSets(d).contains(t)) counts(d) += 1
          d += 1
        }
      }
      i += 1
    }
    var best = 0
    var d = 1
    while (d < counts.length) {
      if (counts(d) > counts(best)) best = d // strict > keeps earlier lang on ties
      d += 1
    }
    if (counts.isEmpty || counts(best) == 0) und else langs(best)
  }
}

/** Count of the most frequent element of a string array (the mode's
  * multiplicity). SQL name: `graft_mode_count`.
  *
  * One hash-count pass, O(n) — the HOF twin
  * ([[graft.operators.Cleanse.maxRunFractionHof]]) sorts the array and
  * folds an interpreted run-length lambda over it, O(n log n) with a
  * struct allocation per element. Semantics match the twin exactly:
  * empty → 0; null elements never merge into a run (SQL null ≠ null), so
  * they contribute at most 1; null input → null.
  */
case class ModeCount(child: Expression) extends UnaryExpression with StringArrayInput
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override protected def arrayChild: Expression = child
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = checkStringArray()
  override def prettyName: String = "graft_mode_count"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Int]()
    var best = 0
    var hasNull = false
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) hasNull = true
      else {
        val c = counts.merge(arr.getUTF8String(i), 1, (a, b) => a + b)
        if (c > best) best = c
      }
      i += 1
    }
    if (best == 0 && hasNull) 1 else best
  }
}

/** Mode count of the ADJACENT-PAIR stream of a token array in one pass —
  * the fused form of `graft_mode_count(bigrams(tokens))`. SQL name:
  * `graft_bigram_mode_count(tokens)`. Pair i is keyed exactly as the HOF
  * chain keys it (`concat_ws(' ', t[i], t[i+1])` — null tokens join as
  * absent), so the count is identical element-for-element; arrays
  * shorter than 2 return 0 (the caller's `size < 2` guard maps that to
  * fraction 0). Replaces one interpreted zip_with lambda + struct
  * allocation per token plus a second full-array mode pass.
  */
case class BigramModeCount(child: Expression)
    extends UnaryExpression with StringArrayInput
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override protected def arrayChild: Expression = child
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult = checkStringArray()
  override def prettyName: String = "graft_bigram_mode_count"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < 2) return 0
    val toks = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      toks(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
      j += 1
    }
    val counts = new java.util.HashMap[UTF8String, Int]()
    var best = 0
    var i = 0
    while (i < n - 1) {
      val bg = UTF8String.concatWs(space, toks(i), toks(i + 1))
      val c = counts.merge(bg, 1, (a, b) => a + b)
      if (c > best) best = c
      i += 1
    }
    best
  }
}

/** Count of array elements contained in a constant word set. SQL name:
  * `graft_stopword_hits(tokens, words)`; `words` must be foldable.
  *
  * Matches `size(filter(tokens, t => array_contains(words, t)))`: null
  * tokens don't count; null tokens array → null.
  */
case class StopwordHits(left: Expression, right: Expression)
    extends BinaryExpression with StringArrayInput {

  override protected def arrayChild: Expression = left
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_stopword_hits"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  override def checkInputDataTypes(): TypeCheckResult = {
    val leftOk = checkStringArray()
    if (leftOk != TypeCheckResult.TypeCheckSuccess) leftOk
    else if (!right.foldable) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a foldable word list")
    else right.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires an array<string> word list, got ${other.sql}")
    }
  }

  /** The constant word set, materialized once per expression instance.
    * UTF8String is Externalizable, so the set ships in closures intact.
    */
  @transient private lazy val wordSet: java.util.HashSet[UTF8String] = {
    val s = new java.util.HashSet[UTF8String]()
    val arr = right.eval(null).asInstanceOf[ArrayData]
    if (arr != null) {
      var i = 0
      while (i < arr.numElements()) {
        if (!arr.isNullAt(i)) s.add(arr.getUTF8String(i))
        i += 1
      }
    }
    s
  }

  // right is foldable and pre-baked into wordSet; a null words list means
  // an empty set (zero hits), mirroring array_contains(null, t) -> filter
  // dropping every element
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val tokens = left.eval(input)
    if (tokens == null) return null
    val arr = tokens.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var c = 0
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && wordSet.contains(arr.getUTF8String(i))) c += 1
      i += 1
    }
    c
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    val setRef = ctx.addReferenceObj("wordSet", wordSet, classOf[java.util.HashSet[_]].getName)
    val leftGen = left.genCode(ctx)
    val i = ctx.freshName("i"); val n = ctx.freshName("n")
    val a = leftGen.value
    ev.copy(code =
      code"""
         |${leftGen.code}
         |boolean ${ev.isNull} = ${leftGen.isNull};
         |int ${ev.value} = 0;
         |if (!${ev.isNull}) {
         |  int $n = $a.numElements();
         |  for (int $i = 0; $i < $n; $i++) {
         |    if (!$a.isNullAt($i) && $setRef.contains($a.getUTF8String($i))) ${ev.value}++;
         |  }
         |}
       """.stripMargin)
  }
}

/** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken 2003,
  * "Winnowing: Local Algorithms for Document Fingerprinting") over a token
  * array, in one codegen'd pass. SQL name: `graft_winnow(tokens, k, w)`.
  *
  * k-gram hashes are chained token xxhash64s (seed 42, the same
  * [[TextExpressions.hashElem]] primitive as the other signatures); each
  * window of `w` consecutive k-gram hashes contributes its RIGHTMOST
  * minimum, recorded once per distinct position (robust winnowing). The
  * guarantee: any shared token run of length ≥ k + w − 1 between two
  * documents yields at least one shared fingerprint — which makes the
  * fingerprints joinable evidence of partial overlap, not just whole-doc
  * identity like [[graft.operators.TextAnalysis.rollingHash]].
  *
  * Fewer than k tokens hash as one whole-document gram; empty input →
  * empty array; null → null. Output size is ~m/w on random text (m =
  * token count − k + 1), the paper's density bound 2/(w+1).
  */
case class WinnowSig(child: Expression, k: Int, w: Int)
    extends UnaryExpression with StringArrayInput {
  import TextExpressions._

  override protected def arrayChild: Expression = child
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0 || w <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k > 0 and w > 0, got k=$k w=$w")
    else checkStringArray()
  override def prettyName: String = "graft_winnow"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val th = new Array[Long](n)
    var i = 0
    while (i < n) { th(i) = hashElem(arr, i); i += 1 }
    val m = if (n >= k) n - k + 1 else 1
    val kk = if (n >= k) k else n
    val g = new Array[Long](m)
    var r = 0
    while (r < m) {
      var h = Seed
      var j = r
      while (j < r + kk) { h = XXH64.hashLong(th(j), h); j += 1 }
      g(r) = h
      r += 1
    }
    val ww = if (m >= w) w else m
    val wins = m - ww + 1
    val sel = new Array[Long](m)
    var cnt = 0
    var minPos = -1
    r = 0
    while (r < wins) {
      val last = r + ww - 1
      if (minPos < r) {
        // window slid past the old minimum: rescan right-to-left so ties
        // keep the rightmost position (robust winnowing's tie rule)
        minPos = last
        var p = last - 1
        while (p >= r) { if (g(p) < g(minPos)) minPos = p; p -= 1 }
        sel(cnt) = g(minPos); cnt += 1
      } else if (g(last) <= g(minPos)) {
        minPos = last
        sel(cnt) = g(last); cnt += 1
      }
      r += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(sel, cnt))
  }

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val xxh = classOf[XXH64].getName
      val n = ctx.freshName("n"); val th = ctx.freshName("th")
      val m = ctx.freshName("m"); val kk = ctx.freshName("kk")
      val g = ctx.freshName("g"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val r = ctx.freshName("r"); val p = ctx.freshName("p")
      val ww = ctx.freshName("ww"); val wins = ctx.freshName("wins")
      val sel = ctx.freshName("sel"); val cnt = ctx.freshName("cnt")
      val minPos = ctx.freshName("minPos"); val last = ctx.freshName("last")
      s"""
         |int $n = $a.numElements();
         |long[] $th = new long[$n];
         |for (int $i = 0; $i < $n; $i++) {
         |  $th[$i] = $a.isNullAt($i) ? 42L
         |    : $xxh.hashUTF8String($a.getUTF8String($i), 42L);
         |}
         |int $m = $n >= $k ? $n - $k + 1 : 1;
         |int $kk = $n >= $k ? $k : $n;
         |long[] $g = new long[$m];
         |int $cnt = 0;
         |long[] $sel;
         |if ($n == 0) {
         |  $sel = new long[0];
         |} else {
         |  for (int $r = 0; $r < $m; $r++) {
         |    long $h = 42L;
         |    for (int $j = $r; $j < $r + $kk; $j++) $h = $xxh.hashLong($th[$j], $h);
         |    $g[$r] = $h;
         |  }
         |  int $ww = $m >= $w ? $w : $m;
         |  int $wins = $m - $ww + 1;
         |  $sel = new long[$m];
         |  int $minPos = -1;
         |  for (int $r = 0; $r < $wins; $r++) {
         |    int $last = $r + $ww - 1;
         |    if ($minPos < $r) {
         |      $minPos = $last;
         |      for (int $p = $last - 1; $p >= $r; $p--) {
         |        if ($g[$p] < $g[$minPos]) $minPos = $p;
         |      }
         |      $sel[$cnt++] = $g[$minPos];
         |    } else if ($g[$last] <= $g[$minPos]) {
         |      $minPos = $last;
         |      $sel[$cnt++] = $g[$last];
         |    }
         |  }
         |}
         |${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
         |  .fromPrimitiveArray(java.util.Arrays.copyOf($sel, $cnt));
       """.stripMargin
    })
}

/** Distinct character trigrams of a string in one pass. SQL name:
  * `graft_trigrams(text)`. Matches the higher-order formulation in
  * [[graft.operators.Retrieval.trigramsHof]] exactly (positions
  * 1..len-2; strings shorter than 3 chars yield themselves), but as a
  * single codegen'd loop — the HOF form pays an interpreted lambda
  * dispatch per character position, which is the trigram index build's
  * hot loop at corpus scale.
  *
  * Substrings operate on Unicode code points (UTF8String.substring
  * semantics, same as the SQL `substr`), so multi-byte text trigrams
  * identically in both forms.
  */
/** xxhash64 of every k-char window of a string, positionally — one
  * UTF8String pass that never materializes the window strings for the
  * downstream plan. SQL name: `graft_char_gram_hashes(text, k)`;
  * element i equals `xxhash64(substring(text, i+1, k))` exactly (same
  * codepoint slicing, same seed-42 hash — pinned by a differential
  * test), and strings shorter than k yield an empty array. This is the
  * anchor-gram generator of the exact-substring dedup screen: the
  * 20-char gram exists only inside this eval, so the explode emits
  * 8-byte longs instead of 20+-byte strings.
  */
case class CharGramHashes(child: Expression, k: Int) extends UnaryExpression {
  import TextExpressions.Seed
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k > 0, got $k")
    else child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string input, got ${other.sql}")
    }
  override def prettyName: String = "graft_char_gram_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val out = new Array[Long](n - k + 1)
    var i = 0
    while (i <= n - k) {
      out(i) = XXH64.hashUTF8String(s.substring(i, i + k), Seed)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // the work is UTF8String slicing + hashing (object construction either
  // way); the surrounding plan still whole-stage-codegens around the
  // boxed eval call — same stance as CharTrigrams below
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val cls = classOf[CharGramHashes].getName
      val ref = ctx.addReferenceObj("charGramHashesExpr", this, cls)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($str);"
    })
}

/** xxhash64 of every k-token window of a token array, positionally —
  * the word-gram companion of [[CharGramHashes]]. SQL name:
  * `graft_word_gram_hashes(tokens, k)`; element i equals
  * `xxhash64(concat_ws(' ', tokens[i..i+k-1]))` exactly (differential-
  * pinned), arrays shorter than k yield an empty array, null elements
  * join as empty like concat_ws. One pass replaces the k−1 interpreted
  * zip_with array allocations per row of the HOF window chain, and the
  * window string exists only inside the eval.
  */
case class WordGramHashes(child: Expression, k: Int)
    extends UnaryExpression with StringArrayInput {
  import TextExpressions.Seed
  override protected def arrayChild: Expression = child
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    if (k <= 0) TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires k > 0, got $k")
    else checkStringArray()
  override def prettyName: String = "graft_word_gram_hashes"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  private val space = UTF8String.fromString(" ")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n < k) return UnsafeArrayData.fromPrimitiveArray(Array.emptyLongArray)
    val toks = new Array[UTF8String](n)
    var j = 0
    while (j < n) {
      toks(j) = if (arr.isNullAt(j)) null else arr.getUTF8String(j)
      j += 1
    }
    val out = new Array[Long](n - k + 1)
    val parts = new Array[UTF8String](k)
    var i = 0
    while (i <= n - k) {
      System.arraycopy(toks, i, parts, 0, k)
      out(i) = XXH64.hashUTF8String(UTF8String.concatWs(space, parts: _*), Seed)
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // same stance as CharGramHashes: the work is slicing/joining/hashing
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val cls = classOf[WordGramHashes].getName
      val ref = ctx.addReferenceObj("wordGramHashesExpr", this, cls)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($a);"
    })
}

case class CharTrigrams(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }
  override def prettyName: String = "graft_trigrams"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    val n = s.numChars()
    val seen = new java.util.LinkedHashSet[UTF8String]()
    if (n > 0 && n < 3) seen.add(s)
    else {
      var i = 0
      while (i <= n - 3) { seen.add(s.substring(i, i + 3)); i += 1 }
    }
    val arr = new Array[AnyRef](seen.size())
    val it = seen.iterator()
    var j = 0
    while (it.hasNext) { arr(j) = it.next(); j += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(arr)
  }

  // CodegenFallback-style: the work is UTF8String slicing and set
  // insertion (object construction either way); the surrounding plan
  // still whole-stage-codegens around the boxed eval call.
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val cls = classOf[CharTrigrams].getName
      val ref = ctx.addReferenceObj("trigramsExpr", this, cls)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($str);"
    })
}

/** Canonical text normalization in one byte-level pass. SQL name:
  * `graft_normalize(text)`. Exactly equals the portable chain
  * `trim(regexp_replace(regexp_replace(lower(s), "[^a-z0-9\\s]", " "),
  * "\\s+", " "))` ([[graft.operators.Dedup.normalizedPortable]]):
  *
  * after `lower`, regex 1 turns every char outside {a-z, 0-9, \s} into
  * a space and regex 2 collapses every whitespace run to one space, so
  * the composition maps each MAXIMAL run of non-[a-z0-9] characters —
  * whitespace or not — to a single ' ', and `trim` drops the leading/
  * trailing run. (The Java-vs-RE2 `\s` disagreement on \x0B is
  * immaterial: a char either survives regex 1 as whitespace and is
  * collapsed by regex 2, or is replaced by ' ' first — the final string
  * is the same, which is also why the DuckDB oracle twin agrees.)
  * Multi-byte UTF-8 sequences contain no ASCII bytes, so the scan can
  * run on raw bytes: any byte outside [a-z0-9] — including every byte
  * of a non-ASCII code point — is part of a separator run.
  *
  * The regex chain measured ~0.3 MB/s/core on the 1000x probe fixture
  * (262 s of doc_dedup_normalized's 508 s at 5M docs / 2.2 GB text);
  * this pass runs at memory bandwidth.
  */
case class NormalizeText(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }
  override def prettyName: String = "graft_normalize"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val b = input.asInstanceOf[UTF8String].toLowerCase.getBytes
    val out = new Array[Byte](b.length)
    var n = 0
    var pendingSep = false
    var i = 0
    while (i < b.length) {
      val c = b(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        if (pendingSep && n > 0) { out(n) = ' '; n += 1 }
        pendingSep = false
        out(n) = c; n += 1
      } else pendingSep = true
      i += 1
    }
    UTF8String.fromBytes(out, 0, n)
  }

  // same glue as CharTrigrams: the row cost is the byte loop itself
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val cls = classOf[NormalizeText].getName
      val ref = ctx.addReferenceObj("normalizeExpr", this, cls)
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String) $ref.nullSafeEval($str);"
    })
}

/** Term-frequency vector over a FIXED vocabulary in one token pass. SQL
  * name: `graft_vocab_counts(tokens, vocab)` with `vocab` a foldable
  * array literal; returns `array<double>` with element j = the count of
  * vocab(j) in `tokens` — exactly the higher-order chain
  * `transform(vocab, w -> cast(size(filter(tokens, t -> t = w)) as
  * double))`, which re-scans the token array once PER VOCAB WORD with an
  * interpreted lambda (O(V·T) comparisons per row). This pass hashes
  * each token once into a map built once per expression instance
  * (O(T + V) per row). Counts are exact integers in doubles — bit-equal
  * to the chain by construction; duplicate vocab entries each receive
  * the count (position-wise, like the chain); null tokens match nothing
  * (the chain's `null = w` filters false); null input → null.
  */
case class VocabCounts(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        if (right.foldable) TypeCheckResult.TypeCheckSuccess
        else TypeCheckResult.TypeCheckFailure(
          s"$prettyName requires a foldable vocabulary array")
      case other => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires two array<string> inputs, got $other")
    }
  override def prettyName: String = "graft_vocab_counts"
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  // vocab is foldable: hash it once per expression instance. firstIdx(j)
  // carries duplicate positions back to the counted slot so repeated
  // vocab entries stay position-wise identical to the HOF chain.
  @transient private lazy val (vocabIdx, firstIdx) = {
    val arr = right.eval(null).asInstanceOf[ArrayData]
    val n = if (arr == null) 0 else arr.numElements()
    val m = new java.util.HashMap[UTF8String, Integer](n * 2)
    val first = new Array[Int](n)
    var i = 0
    while (i < n) {
      if (arr.isNullAt(i)) first(i) = -1
      else {
        val w = arr.getUTF8String(i).clone()
        val prior = m.putIfAbsent(w, Integer.valueOf(i))
        first(i) = if (prior == null) i else prior.intValue()
      }
      i += 1
    }
    (m, first)
  }

  override def nullSafeEval(tokens: Any, vocab: Any): Any = {
    val ts = tokens.asInstanceOf[ArrayData]
    val counts = new Array[Double](firstIdx.length)
    var i = 0
    val nt = ts.numElements()
    while (i < nt) {
      if (!ts.isNullAt(i)) {
        val idx = vocabIdx.get(ts.getUTF8String(i))
        if (idx != null) counts(idx.intValue()) += 1.0
      }
      i += 1
    }
    val out = new Array[Double](firstIdx.length)
    var j = 0
    while (j < firstIdx.length) {
      out(j) = if (firstIdx(j) < 0) 0.0 else counts(firstIdx(j))
      j += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  // same stance as the other token-loop expressions
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (ts, vs) => {
      val cls = classOf[VocabCounts].getName
      val ref = ctx.addReferenceObj("vocabCountsExpr", this, cls)
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.nullSafeEval($ts, $vs);"
    })
}

/** Fused PII scan in byte-level passes. SQL name: `graft_pii_scan(text)`.
  * Returns `struct(n_emails INT, n_phones INT, n_urls INT,
  * redacted STRING)` — exactly the four values the portable chain
  * computes with FOUR Java-regex traversals plus three more inside the
  * chained replace ([[graft.operators.Cleanse]]): counts are
  * non-overlapping leftmost matches of the email/phone/URL patterns on
  * the ORIGINAL text; `redacted` replaces emails with `<EMAIL>` first,
  * then phones with `<PHONE>` in that result, then URLs with `<URL>` in
  * that result (order is the contract — CleanseSpec pins it).
  *
  * Bit-compatibility with Java regex (leftmost-first, greedy):
  *
  * - email `[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}`: `@` is not
  *   in the local-part class, so the greedy local run never backtracks;
  *   the domain backtracks only over where `\.` splits the maximal
  *   [A-Za-z0-9.-] run — the scan tries every split point k from the
  *   rightmost down (Java's give-back-one-at-a-time order) and takes the
  *   greedy maximal letter run after it (≥2). A failed `@` resumes the
  *   scan one position later, which lands on the next `@` — chars
  *   between are domain-class and cannot start a new match earlier.
  * - phone `\d{3}[-.]\d{3}[-.]\d{4}`: fixed 12-char window slid left to
  *   right, skipping past each match (non-overlap).
  * - URL `https?://[^\s]+`: literal prefix (optional `s` tried greedily
  *   first, exactly Java's order) then the maximal non-whitespace run,
  *   which must be non-empty. `\s` is the ASCII set
  *   [ \t\n\x0B\f\r] — Java's default, non-UNICODE semantics.
  *
  * Every pattern char is ASCII and UTF-8 guarantees ASCII bytes occur
  * only as ASCII code points, so the byte-level scan is char-exact on
  * multibyte input (non-ASCII bytes are ≥ 0x80: never whitespace, never
  * in any class, and URL tails swallow them exactly like Java's
  * `[^\s]+`). Differential-pinned against the regex chain in
  * TextExpressionsSpec on adversarial + random inputs (the
  * `graft_normalize` playbook).
  *
  * Why native: the 1000× probe measured chained Java regex at
  * ~0.3 MB/s/core on corpus text — the dominant per-byte constant of any
  * normalize-shaped operator at 100 TB. These passes run at memory
  * bandwidth with zero regex-engine state.
  */
case class PiiScan(child: Expression) extends UnaryExpression {
  import TextExpressions._
  override def dataType: DataType = StructType(Seq(
    StructField("n_emails", IntegerType, nullable = false),
    StructField("n_phones", IntegerType, nullable = false),
    StructField("n_urls", IntegerType, nullable = false),
    StructField("redacted", StringType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires a string input, got ${other.sql}")
  }
  override def prettyName: String = "graft_pii_scan"
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)

  override def nullSafeEval(input: Any): Any = {
    val orig = input.asInstanceOf[UTF8String].getBytes
    // counts run on the ORIGINAL text (the query contract: three
    // independent regexp_extract_all over `text`); the email pass doubles
    // as redaction pass 1 because that one also runs on the original
    val emailSpans = findEmails(orig)
    val nPhones = spanCount(findPhones(orig))
    val nUrls = spanCount(findUrls(orig))
    // redaction chain: email → phone → URL, each pass over the PREVIOUS
    // pass's output (the placeholders themselves are matchable text for
    // the later passes, exactly as in the chained regexp_replace)
    val r1 = replaceSpans(orig, emailSpans, EmailTag)
    val r2 = replaceSpans(r1, findPhones(r1), PhoneTag)
    val r3 = replaceSpans(r2, findUrls(r2), UrlTag)
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](spanCount(emailSpans), nPhones, nUrls,
        UTF8String.fromBytes(r3)))
  }

  // same stance as NormalizeText: the row cost is the byte passes
  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, str => {
      val cls = classOf[PiiScan].getName
      val ref = ctx.addReferenceObj("piiScanExpr", this, cls)
      s"${ev.value} = (org.apache.spark.sql.catalyst.InternalRow) $ref.nullSafeEval($str);"
    })
}
