package graft.core

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Static eval kernels for the dedup-signature expressions below, in a
  * lone object so Scala emits STATIC FORWARDERS the generated Java can
  * call directly (`graft.core.SimHashKernels.minhashBase(x)` — the
  * TextKernels pattern). The three expressions were the last
  * `CodegenFallback`s on the dedup hot path (VERDICT r19 #5): fallback
  * eval boxes every row through an InternalRow handoff and breaks the
  * WholeStageCodegen span around the signature projection; with
  * `doGenCode` the same loop bodies run as one invokestatic inside the
  * fused stage. */
object SimHashKernels {
  /** Per-thread MD5 instance (reset before each row). */
  private val digests = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def simhash64(arr: ArrayData): Long = {
    val counts = new Array[Int](64)
    var t = 0
    val n = arr.numElements()
    while (t < n) {
      val s = arr.getUTF8String(t)
      if (s != null) {
        val h = SimHash64.fnv1a64(s.getBytes)
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) counts(i) += 1 else counts(i) -= 1
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) { if (counts(i) > 0) out |= (1L << i); i += 1 }
    out
  }

  def minhashSig(arr: ArrayData, numHashes: Int): ArrayData = {
    import MinHashSig.{a, b, P}
    val n = arr.numElements()
    val out = new Array[Any](numHashes)
    var j = 0
    while (j < numHashes) {
      val aj = a(j); val bj = b(j)
      var best = Long.MaxValue
      var i = 0
      while (i < n) {
        if (!arr.isNullAt(i)) {
          val h = (arr.getLong(i) * aj + bj) % P
          if (h < best) best = h
        }
        i += 1
      }
      out(j) = if (best == Long.MaxValue) null else best
      j += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  def minhashBase(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val out = new Array[Long](n)
    // one digest per task thread, not per ROW: getInstance runs a
    // provider lookup + allocation each call, measurable across the
    // 300k-doc corpora this kernel fronts (r19; result-identical —
    // reset() restores the initial state)
    val md = digests.get()
    var i = 0
    while (i < n) {
      md.reset()
      val dig = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex digits = bytes 0..6 + the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (dig(b) & 0xffL); b += 1 }
      h = (h << 4) | ((dig(7) >> 4) & 0xfL)
      out(i) = h % MinHashSig.M
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

/** 64-bit SimHash over a token array (Charikar's hashing for near-dup
  * detection): each token hashes to 64 bits (FNV-1a, self-contained so
  * results are stable across engines/JVMs); bit i of the output is the
  * sign of sum over tokens of (bit i ? +1 : -1). Near-dup docs differ
  * in few bits → bucket by 16-bit chunks for LSH (any-chunk-equal =
  * candidate).
  */
case class SimHash64(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(v: Any): Any =
    SimHashKernels.simhash64(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.SimHashKernels.simhash64($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

/** MinHash signature from pre-hashed shingle values: one pass of
  * `numHashes` linear permutations (h·A_j + B_j mod P) over the base
  * hashes. The base hash (md5-hex → int, mod M = 2^32-5) is computed once
  * per shingle by builtin expressions; this expression replaces
  * `numHashes` md5 evaluations per shingle with integer math, and its
  * constants are reproduced verbatim in the DuckDB oracle SQL. */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"
  override def nullSafeEval(v: Any): Any =
    SimHashKernels.minhashSig(v.asInstanceOf[ArrayData], numHashes)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.core.SimHashKernels.minhashSig($c, $numHashes)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object MinHashSig {
  /** Constants mirrored in the oracle SQL — keep in sync with
    * Queries.minhash oracle.
    *
    * M (the shingle base-hash modulus) is the SIGNATURE hash space,
    * and it must be large enough that unrelated documents rarely
    * share base-hash values: a shared value v is the band minimum of
    * BOTH docs with probability ~1/|union| per permutation, so
    * base-hash saturation turns directly into an n²-growing
    * false-candidate tail. Measured (r18, sf1 tier, 3M docs of 10
    * shingles at the old M = 1048573 ≈ 2^20): candidate pairs grew
    * 30x at 10x data (4.40M vs a linear 1.46M — 66% false) while
    * verified pairs stayed exactly linear; at M = 2^32-5 the
    * cross-doc share probability drops 4096x and the measured
    * candidates return to the true-pair line. 2^32-5 is the largest
    * prime keeping h·a_j below 2^62 for a_j < P (~2^30) — overflow-
    * free in int64 for BOTH engines (the same bound that makes Spark
    * ML's MinHashLSH use a ~2^31 prime). At corpora big enough to
    * saturate 2^32 (n·|shingles| ≳ 2^32 · wanted-false-rate), raise
    * rows-per-band with n — `Dedup.autoMinhashParams` encodes that
    * policy (r19). Fifth-decade check (r19, ProfileMinhash `counts`
    * at 3.0e7 docs — a decade past this fix's measurement):
    * candidates 10.03x then 10.27x per decade — the 2.7% excess at
    * 3e8 doc-shingles is the predicted leading edge of this space
    * loading, with the knee still a decade out (~4e8 docs). */
  val P = 1000000007L
  val M = 4294967291L // base-hash modulus, 2^32-5 (fits h*a in int64)
  def a(j: Int): Long = (2654435761L * (j + 1)) % P
  def b(j: Int): Long = (97531L * (j + 13)) % P
}

/** Per-shingle base hash: md5 hex-prefix (first 15 hex digits = 60
  * bits) mod [[MinHashSig.M]], over a string array in ONE kernel call
  * per row. Semantically identical to the builtin chain
  * `transform(s, x -> conv(substring(md5(x),1,15),16,10) % M)` — which
  * DuckDB reproduces as `('0x'||substr(md5(x),1,15))::BIGINT % M` —
  * but ~40× faster: higher-order-function lambdas are interpreted
  * (boxed eval per element), while this loops over the array inside
  * one expression eval with a reused MessageDigest. */
case class MinHashBase(child: Expression) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_base"
  override def nullSafeEval(v: Any): Any =
    SimHashKernels.minhashBase(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.core.SimHashKernels.minhashBase($c)")
  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}

object SimHash64 {
  def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }
}
