package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for content fingerprinting.
  *
  * The declarative formulations (one `aggregate()` fold per bit/seed) are
  * semantically right but evaluate higher-order lambdas interpreted, and
  * re-evaluate the shingle pipeline per bit — 64× the work for SimHash,
  * 16× for MinHash. These expressions take the token-hash array ONCE and
  * produce the fingerprint in a single tight loop, with whole-stage
  * codegen. At 100 TB this is the difference between a scan-bound job and
  * an interpreter-bound one.
  */
object HashExprs {

  /** splitmix64 finalizer — strong 64-bit avalanche, used to derive the
    * per-seed hash families from one base hash per token. */
  @inline final def mix64(z0: Long): Long = {
    var z = z0
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  final val GOLDEN = 0x9E3779B97F4A7C15L

  /** FNV-1a 64-bit (public spec: offset basis 0xcbf29ce484222325, prime
    * 0x100000001b3; per byte: h = (h XOR b) * prime, wrapping). */
  final val FnvBasis = 0xcbf29ce484222325L
  final val FnvPrime = 0x100000001b3L

  @inline final def fnv1a64(bytes: Array[Byte]): Long = {
    var h = FnvBasis
    var i = 0
    while (i < bytes.length) {
      h = (h ^ (bytes(i) & 0xFF)) * FnvPrime
      i += 1
    }
    h
  }

  /** Scala reference implementations (shared by eval and tests). */
  def minhashRef(hashes: Array[Long], k: Int): Array[Long] = {
    val out = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var i = 0
      while (i < k) {
        val v = mix64(h + GOLDEN * (i + 1))
        if (v < out(i)) out(i) = v
        i += 1
      }
      j += 1
    }
    out
  }

  def simhashRef(hashes: Array[Long]): Long = {
    val counts = new Array[Int](64)
    var j = 0
    while (j < hashes.length) {
      val h = hashes(j)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      j += 1
    }
    var fp = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) fp |= (1L << b)
      b += 1
    }
    fp
  }

  def min_hash(hashes: Column, k: Int): Column =
    GraftBridge.column(MinHashSignature(GraftBridge.expression(hashes), k))

  def sim_hash(hashes: Column): Column =
    GraftBridge.column(SimHash64(GraftBridge.expression(hashes)))

  def rolling_fnv_fingerprint(tokens: Column): Column =
    GraftBridge.column(RollingFnvFingerprint(GraftBridge.expression(tokens)))

  def mix64_col(c: Column): Column =
    GraftBridge.column(Mix64(GraftBridge.expression(c)))

  def mix64_add_col(c: Column, offset: Long): Column =
    GraftBridge.column(Mix64Add(GraftBridge.expression(c), offset))
}

/** MinHash signature: array<long> token hashes → array<long> of k per-seed
  * minima. Seed family derived via splitmix64(h + GOLDEN*(i+1)). */
case class MinHashSignature(child: Expression, k: Int)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData].toLongArray()
    new GenericArrayData(HashExprs.minhashRef(arr, k))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val out = ctx.freshName("out")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      val cls = classOf[HashExprs.type].getName + ".MODULE$"
      s"""
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $i = 0; $i < $k; $i++) {
         |    long $v = $cls.mix64($h + ${HashExprs.GOLDEN}L * ($i + 1));
         |    if ($v < $out[$i]) $out[$i] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "minhash_signature"
}

/** SimHash: array<long> token hashes → 64-bit fingerprint (majority vote
  * per bit). */
case class SimHash64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(LongType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashExprs.simhashRef(input.asInstanceOf[ArrayData].toLongArray())

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val counts = ctx.freshName("counts")
      val j = ctx.freshName("j")
      val b = ctx.freshName("b")
      val h = ctx.freshName("h")
      val fp = ctx.freshName("fp")
      s"""
         |int[] $counts = new int[64];
         |for (int $j = 0; $j < $c.numElements(); $j++) {
         |  long $h = $c.getLong($j);
         |  for (int $b = 0; $b < 64; $b++) {
         |    if ((($h >>> $b) & 1L) == 1L) $counts[$b]++; else $counts[$b]--;
         |  }
         |}
         |long $fp = 0L;
         |for (int $b = 0; $b < 64; $b++) {
         |  if ($counts[$b] > 0) $fp |= (1L << $b);
         |}
         |${ev.value} = $fp;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "simhash64"
}

/** Order-sensitive rolling document fingerprint over the token array:
  * `acc = rotl5(acc) XOR fnv1a64(utf8(token))`, acc0 = 0.
  *
  * Every operation is a published, engine-independent spec (FNV-1a 64 and
  * a bit rotation) — unlike xxhash64, any engine can recompute it, so the
  * fingerprint column is portable across systems (and oracle-checkable).
  * Wraparound multiply is well-defined on JVM longs; rotation + XOR never
  * overflow under ANSI semantics. */
case class RollingFnvFingerprint(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    while (i < arr.numElements()) {
      val t = arr.getUTF8String(i)
      acc = (acc << 5 | acc >>> 59) ^
        (if (t == null) 0L else HashExprs.fnv1a64(t.getBytes))
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val acc = ctx.freshName("acc")
      val i = ctx.freshName("i")
      val t = ctx.freshName("t")
      val cls = classOf[HashExprs.type].getName + ".MODULE$"
      s"""
         |long $acc = 0L;
         |for (int $i = 0; $i < $c.numElements(); $i++) {
         |  org.apache.spark.unsafe.types.UTF8String $t = $c.getUTF8String($i);
         |  $acc = ($acc << 5 | $acc >>> 59) ^
         |    ($t == null ? 0L : $cls.fnv1a64($t.getBytes()));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "rolling_fnv_fingerprint"
}

/** splitmix64 finalizer as a standalone expression — full 64-bit
  * avalanche over a weakly-mixed input (e.g. FNV-1a's low bits, which are
  * too linear for HyperLogLog's leading-zero statistic). Same published
  * constants as HashExprs.mix64; engine-portable (the DuckDB oracle
  * replays it in HUGEINT mod-2^64 arithmetic). */
case class Mix64(child: Expression)
    extends UnaryExpression with ImplicitCastInputTypes {

  // the analyzer casts narrower integrals up (so SQL `mix64(0)` works) and
  // rejects non-numeric input with a readable analysis error instead of a
  // runtime ClassCastException
  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashExprs.mix64(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = classOf[HashExprs.type].getName + ".MODULE$"
      s"${ev.value} = $cls.mix64($c);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "mix64"
}

/** `mix64(input + offset)` with WRAPPING two's-complement addition — the
  * splitmix64 stream step (offset = i·GOLDEN) used by Bloom probe
  * derivation. A Catalyst `Add` would throw ARITHMETIC_OVERFLOW under ANSI
  * mode for keys beyond ~±5e17 (most full-range hashed ids), while the
  * JVM aggregator side wraps; this expression keeps build and probe in the
  * same wrapping arithmetic for the whole 64-bit key range. */
case class Mix64Add(child: Expression, offset: Long)
    extends UnaryExpression with ImplicitCastInputTypes {

  override def inputTypes = Seq(LongType)
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    HashExprs.mix64(input.asInstanceOf[Long] + offset)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cls = classOf[HashExprs.type].getName + ".MODULE$"
      s"${ev.value} = $cls.mix64($c + ${offset}L);"
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override def prettyName: String = "mix64_add"
}
