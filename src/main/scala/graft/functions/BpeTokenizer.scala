package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Real byte-level BPE tokenization (the d51 surface; re-bases the
  * d10 regex approximation behind a flag — see
  * [[graft.operators.TextAnalysis.bpeTokenCount]]).
  *
  * The vocabulary is the 256 single bytes plus one token per entry of
  * [[BpeTokenizer.merges]], a LITERAL merge table (so the Spark
  * kernel and the DuckDB oracle derive from the same source and
  * cannot drift). Encoding applies the merges IN RANK ORDER, each as
  * one left-to-right non-overlapping pass — equivalent to the
  * classic lowest-rank-adjacent-pair priority loop, because a token
  * created by merge r can only participate in merges of rank > r
  * (BpeSpec pins the equivalence against an independent priority-loop
  * reference on random inputs).
  *
  * The canonical serialized form (shared with the oracle) wraps each
  * token's lowercase byte-hex in its OWN pipe pair: "" → "",
  * "the" → "|746865|", "ab" (unmerged) → "|61||62|". Each token
  * carrying both its delimiters is what makes the oracle's
  * `replace('|a||b|','|ab|')` per merge an EXACT merge pass: adjacent
  * occurrences share no characters, so left-to-right non-overlapping
  * replace merges a whole run just like the kernel (a single shared
  * delimiter would make replace skip every second occurrence of a
  * run — the " a a a" bug). Everything downstream (count = pipes/2,
  * md5) is arithmetic both engines share.
  *
  * Scale shape: a pure scan projection — one codegen'd kernel call
  * per row, no shuffle, no state; O(|merges| · |bytes|) per document.
  */
object BpeTokenizer {
  private def ub(e: Expression): Column = Bridge.column(e)
  private def x(c: Column): Expression = Bridge.expression(c)

  /** The literal merge table, rank order. Each side must be a single
    * byte or the result of an EARLIER merge, and every merge result
    * must be new (both validated at class init: a typo fails fast,
    * not silently). ASCII-only by construction; non-ASCII input bytes
    * simply stay single-byte tokens. Dead entries are permitted — a
    * compound whose parts are always consumed by earlier merges (e.g.
    * "ati" below: "at" wins first) just never fires; rank order alone
    * defines the outcome, deterministically on both engines. */
  val merges: Vector[(String, String)] = Vector(
    // high-frequency English letter pairs
    ("t", "h"), ("h", "e"), ("i", "n"), ("e", "r"), ("a", "n"),
    ("o", "n"), ("r", "e"), ("e", "n"), ("a", "t"), ("o", "r"),
    ("e", "s"), ("s", "t"), ("a", "r"), ("a", "l"), ("o", "u"),
    ("i", "t"), ("i", "s"), ("l", "e"), ("o", "f"), ("t", "o"),
    ("e", "d"), ("c", "h"), ("w", "h"), ("s", "e"), ("n", "o"),
    ("m", "e"), ("d", "e"), ("c", "o"), ("r", "a"), ("r", "o"),
    ("l", "i"), ("r", "i"), ("m", "a"), ("l", "o"), ("h", "a"),
    ("u", "r"), ("n", "d"), ("c", "e"), ("l", "a"), ("u", "s"),
    ("s", "i"), ("n", "t"), ("t", "a"), ("e", "l"), ("n", "e"),
    ("w", "e"), ("u", "n"), ("m", "o"), ("d", "i"), ("p", "e"),
    ("v", "e"), ("p", "o"), ("b", "e"), ("g", "e"), ("g", "o"),
    ("b", "o"), ("w", "i"), ("f", "i"), ("p", "a"), ("s", "o"),
    ("k", "e"), ("f", "o"), ("w", "a"), ("v", "i"), ("h", "o"),
    ("y", "e"), ("t", "e"), ("c", "a"), ("d", "a"), ("c", "u"),
    ("s", "u"), ("b", "u"), ("m", "u"), ("f", "u"), ("p", "u"),
    ("h", "u"), ("t", "u"), ("l", "u"), ("r", "u"), ("n", "u"),
    ("t", "i"), ("i", "o"),
    // vowel-consonant tails
    ("o", "m"), ("i", "c"), ("e", "a"), ("a", "s"), ("e", "t"),
    ("o", "w"), ("a", "y"), ("i", "l"), ("o", "l"), ("a", "d"),
    ("u", "l"), ("i", "d"), ("a", "g"), ("a", "m"), ("a", "c"),
    ("a", "p"), ("i", "g"), ("u", "m"), ("i", "m"), ("o", "p"),
    ("o", "t"), ("o", "d"), ("e", "m"), ("u", "t"), ("e", "c"),
    ("i", "r"), ("o", "s"), ("o", "c"), ("e", "x"),
    // doubled letters
    ("e", "e"), ("o", "o"), ("l", "l"), ("s", "s"), ("t", "t"),
    ("p", "p"), ("n", "n"), ("m", "m"), ("f", "f"), ("r", "r"),
    ("d", "d"), ("c", "c"), ("g", "g"), ("b", "b"), ("z", "z"),
    // space-prefixed starts (GPT-style word-boundary tokens)
    (" ", "t"), (" ", "a"), (" ", "i"), (" ", "o"), (" ", "w"),
    (" ", "s"), (" ", "c"), (" ", "b"), (" ", "f"), (" ", "p"),
    (" ", "m"), (" ", "d"), (" ", "h"), (" ", "l"), (" ", "n"),
    (" ", "e"), (" ", "r"), (" ", "g"), (" ", "u"), (" ", "v"),
    (" ", "y"), (" ", "k"), (" ", "j"), (" ", "q"), (" ", "x"),
    (" ", "z"),
    // trigrams / word cores built from the pairs above
    ("th", "e"), ("in", "g"), ("an", "d"), ("io", "n"),
    ("a", "ti"), ("ati", "on"), ("t", "er"), ("i", "th"),
    ("w", "ith"), ("e", "nt"),
    // space-prefixed whole words
    (" t", "h"), (" t", "he"), (" a", "nd"), (" o", "f"),
    (" t", "o"), (" i", "n"), (" i", "s"), (" i", "t"),
    (" f", "or"), (" w", "ith"), (" th", "at"))

  private val pairs: Vector[(String, String)] = merges

  // ---- id-space structures ----------------------------------------
  // token ids: 0..255 = single bytes; 256+r = result of merge rank r
  private val (mergeA, mergeB, tokenBytesArr): (Array[Int], Array[Int], Array[Array[Byte]]) = {
    val byName = scala.collection.mutable.HashMap.empty[String, Int]
    val toks = scala.collection.mutable.ArrayBuffer.empty[Array[Byte]]
    for (b <- 0 until 256) {
      toks += Array(b.toByte)
      if (b < 128) byName(b.toChar.toString) = b
    }
    val as = new Array[Int](pairs.length)
    val bs = new Array[Int](pairs.length)
    pairs.zipWithIndex.foreach { case ((a, b), r) =>
      val ia = byName.getOrElse(a, sys.error(
        s"BPE merge table invalid at rank $r: '$a' is not a prior token"))
      val ib = byName.getOrElse(b, sys.error(
        s"BPE merge table invalid at rank $r: '$b' is not a prior token"))
      as(r) = ia; bs(r) = ib
      val merged = a + b
      require(!byName.contains(merged),
        s"BPE merge table duplicate result '$merged' at rank $r")
      byName(merged) = 256 + r
      toks += (toks(ia) ++ toks(ib))
    }
    (as, bs, toks.toArray)
  }

  /** Lowercase hex serialization of every token id's bytes. */
  private val tokenHexArr: Array[String] =
    tokenBytesArr.map(_.map(b => f"${b & 0xff}%02x").mkString)

  /** (tokA_hex, tokB_hex) per merge, rank order — the oracle builds
    * its replace() chain from exactly this. */
  def mergesHex: Seq[(String, String)] =
    (0 until pairs.length).map(r => (tokenHexArr(mergeA(r)), tokenHexArr(mergeB(r))))

  def vocabSize: Int = tokenBytesArr.length

  /** (id, hex) for every token in the fixed vocab — the oracle's
    * hex→id lookup table (a VALUES list of ~vocabSize rows). */
  def vocabHex: Seq[(Int, String)] =
    tokenHexArr.indices.map(i => (i, tokenHexArr(i)))

  // ---- kernels (static: called from both eval and codegen) --------

  /** Core: UTF-8 bytes → token ids, merges applied in rank order,
    * each one left-to-right non-overlapping in place. */
  def tokenIds(bytes: Array[Byte]): Array[Int] = {
    val n = bytes.length
    if (n == 0) return Array.emptyIntArray
    val ids = new Array[Int](n)
    var i = 0
    while (i < n) { ids(i) = bytes(i) & 0xff; i += 1 }
    var len = n
    var r = 0
    val m = mergeA.length
    while (r < m) {
      val a = mergeA(r); val b = mergeB(r); val nid = 256 + r
      var w = 0; i = 0
      while (i < len) {
        if (i + 1 < len && ids(i) == a && ids(i + 1) == b) {
          ids(w) = nid; i += 2
        } else { ids(w) = ids(i); i += 1 }
        w += 1
      }
      len = w
      r += 1
    }
    java.util.Arrays.copyOf(ids, len)
  }

  /** Canonical pipe-hex serialization: "" for empty, else each token
    * as "|hex|" concatenated ("|61||62|…"). The md5/count arithmetic
    * downstream is shared with the DuckDB oracle. */
  def tokenStringKernel(s: UTF8String): UTF8String = {
    val ids = tokenIds(s.getBytes)
    val sb = new java.lang.StringBuilder(ids.length * 6)
    var i = 0
    while (i < ids.length) {
      sb.append('|').append(tokenHexArr(ids(i))).append('|'); i += 1
    }
    UTF8String.fromString(sb.toString)
  }

  def tokenCountKernel(s: UTF8String): Int = tokenIds(s.getBytes).length

  /** Token ids as an int array column value (for chunking/packing
    * consumers that want the sequence, not just the count). */
  def tokenIdsKernel(s: UTF8String): ArrayData = {
    val ids = tokenIds(s.getBytes)
    new GenericArrayData(ids.map(Int.box))
  }

  /** Reference decode: token ids → UTF-8 bytes (lossless roundtrip —
    * BpeSpec pins decode(encode(text)) == text). */
  def decode(ids: Array[Int]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    ids.foreach(id => out.write(tokenBytesArr(id)))
    out.toByteArray
  }

  // ---- Column surface ---------------------------------------------

  /** Canonical "|hex|…|" token-sequence string of a text column. */
  def bpeTokenString(text: Column): Column = ub(BpeTokenString(x(text)))

  /** Real BPE token count of a text column. */
  def bpeTokenCount(text: Column): Column = ub(BpeTokenCount(x(text)))

  /** Token ids (array<int>) of a text column. */
  def bpeTokenIds(text: Column): Column = ub(BpeTokenIds(x(text)))
}

/** "|hex|…|" canonical BPE token-sequence string (see
  * [[BpeTokenizer]]). */
case class BpeTokenString(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"BpeTokenString requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    BpeTokenizer.tokenStringKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeTokenizer.tokenStringKernel($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** Real BPE token count (see [[BpeTokenizer]]). */
case class BpeTokenCount(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"BpeTokenCount requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = IntegerType
  override def nullSafeEval(input: Any): Any =
    BpeTokenizer.tokenCountKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeTokenizer.tokenCountKernel($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

/** BPE token ids as array<int> (see [[BpeTokenizer]]). */
case class BpeTokenIds(child: Expression) extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"BpeTokenIds requires string, got ${dt.simpleString}")
  }
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullSafeEval(input: Any): Any =
    BpeTokenizer.tokenIdsKernel(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.BpeTokenizer.tokenIdsKernel($c)")
  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}
