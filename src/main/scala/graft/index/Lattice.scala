package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{LatticeCodec, ZnLatticeDecode, ZnLatticeEncode, ZnLatticeSubCodes}

/** IndexLattice analog (faiss/IndexLattice.h:22): train the
  * per-subvector norm ranges with ONE distributed aggregation, then
  * encode/decode as codegen-adjacent Catalyst expressions carrying the
  * (tiny) trained state — no codebook exists at all, the Zn sphere
  * enumeration IS the codebook, so nothing but 2·nsq floats ever
  * reaches the driver.
  */
object Lattice {

  /** IndexLattice::train (IndexLattice.cpp:37): min/max L2 norm per
    * subvector over the training set. One pass, 2·nsq scalars out. */
  def train(df: DataFrame, vecCol: String, nsq: Int, scaleNbit: Int, r2: Int): LatticeCodec = {
    val d = df.select(size(col(vecCol))).head().getInt(0)
    require(d % nsq == 0, s"d=$d not divisible by nsq=$nsq")
    val dsq = d / nsq
    val aggs = (0 until nsq).flatMap { j =>
      val nrm = sqrt(aggregate(
        slice(col(vecCol), j * dsq + 1, dsq).cast("array<double>"),
        lit(0.0), (a, x) => a + x * x))
      Seq(min(nrm).as(s"mn$j"), max(nrm).as(s"mx$j"))
    }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val mins = Array.tabulate(nsq)(j => row.getDouble(2 * j).toFloat)
    val maxs = Array.tabulate(nsq)(j => row.getDouble(2 * j + 1).toFloat)
    new LatticeCodec(d, nsq, scaleNbit, r2, mins, maxs)
  }

  def encodeCol(codec: LatticeCodec, vec: Column): Column =
    shim.col(ZnLatticeEncode(shim.expr(vec), codec))
  def decodeCol(codec: LatticeCodec, code: Column): Column =
    shim.col(ZnLatticeDecode(shim.expr(code), codec))
  def subCodesCol(codec: LatticeCodec, vec: Column): Column =
    shim.col(ZnLatticeSubCodes(shim.expr(vec), codec))

  /** Train + encode into a persistable [[LatticeIndex]]. */
  def build(df: DataFrame, idCol: String, vecCol: String,
      nsq: Int, scaleNbit: Int, r2: Int): LatticeIndex = {
    val codec = train(df, vecCol, nsq, scaleNbit, r2)
    new LatticeIndex(codec,
      df.select(org.apache.spark.sql.functions.col(idCol).as("id"),
        encodeCol(codec, org.apache.spark.sql.functions.col(vecCol)).as("code")))
  }

  /** The enumerated sphere codebook as a DataFrame — the dataflow
    * analog of ZnSphereCodecRec's decode_cache (lattice_Zn.h:163):
    * (lattice code, integer point). Bounded by nv (choose dsq/r2 so
    * nv stays executor-sized; broadcast-join it against codes). */
  def codebookDf(spark: org.apache.spark.sql.SparkSession, codec: LatticeCodec): DataFrame = {
    import spark.implicits._
    val zn = codec.zn
    (0L until zn.nv).map(code => (code, zn.decode(code).toSeq))
      .toDF("lat_code", "c")
  }
}

/** Persistable IndexLattice state (write_index of IndexLattice,
  * faiss/impl/index_write.cpp: d/nsq/scale_nbit/r2 + the trained
  * per-subvector norm ranges + codes): the codec parameters are O(nsq)
  * scalars, the sphere enumeration is re-derived from (dsq, r2) on
  * load — the reference stores no codebook either, the Zn sphere IS
  * the codebook (IndexLattice.h:22). A vector CODEC in the reference
  * (search throws), so the searchable surface here is
  * [[reconstruct]]. */
class LatticeIndex(val codec: graft.core.LatticeCodec,
    /** (id, code binary) */
    val codes: DataFrame) {
  /** Lossy decode of every stored code: (id, vec array<float>). */
  def reconstruct: DataFrame =
    codes.select(org.apache.spark.sql.functions.col("id"),
      Lattice.decodeCol(codec, org.apache.spark.sql.functions.col("code")).as("vec"))
}
