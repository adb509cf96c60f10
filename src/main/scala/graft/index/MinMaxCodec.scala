package graft.index

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.shim
import graft.core.{Fp16Decode, Fp16Encode}

/** IndexRowwiseMinMax / IndexRowwiseMinMaxFP16
  * (faiss/IndexRowwiseMinMax.h:34; factory prefix `MinMax,` /
  * `MinMaxFP16,`, index_factory.cpp:811): scale every ROW to [0,1]
  * before the inner codec and keep (scaler, minv) in front of the
  * code — decode rescales `x = scaler * inner_decode + minv`. The
  * coefficients are stored fp32 (8 extra bytes/vector) or fp16
  * (4 extra bytes). A vector CODEC in the reference — search throws
  * (IndexRowwiseMinMax.cpp:361) — so, like the other codec indexes
  * (ZnLattice, Index2Layer), it is searchable here only through the
  * reconstruction-distance scan over the decoded vectors.
  *
  * Everything is column arithmetic: per-row min/max, the fp32/fp16
  * coefficient rounding, the scaled fp16/SQ8 inner round-trip and the
  * rescale all run inside one projection — no joins, no shuffles, no
  * trained state except the inner SQ8's O(d) range.
  */
object MinMaxCodec {

  /** Round a scalar double column through IEEE half (the fp16
    * coefficient storage of MinMaxFP16). */
  private def fp16Round(c: Column): Column =
    element_at(shim.col(Fp16Decode(Fp16Encode(
      shim.expr(array(c.cast("float")))))), 1).cast("double")

  /** Per-row (minv, scaler) coefficient columns after their storage
    * rounding. A constant row (scaler 0) falls back to scaler 1 so
    * the division is defined; it decodes exactly either way. */
  private def coeffs(vec: Column, fp16Coeffs: Boolean): (Column, Column) = {
    val mnRaw = array_min(vec).cast("double")
    val scRaw = array_max(vec).cast("double") - mnRaw
    val mn = if (fp16Coeffs) fp16Round(mnRaw) else mnRaw // fp32 minv = the float input value, exact
    val sc0 = if (fp16Coeffs) fp16Round(scRaw) else scRaw.cast("float").cast("double")
    (mn, when(sc0 === 0d, lit(1d)).otherwise(sc0))
  }

  /** (id, _mn, _sc, _scaled) — the per-row coefficients and the
    * scaled rows the inner codec trains on and encodes. Exposed so
    * callers that need the TRAINED inner state (the oracle sidecar
    * dump) derive it from the identical input the round-trip used. */
  def scaledDf(df: DataFrame, idCol: String, vecCol: String,
      fp16Coeffs: Boolean): DataFrame = {
    val (mn, sc) = coeffs(col(vecCol), fp16Coeffs)
    // project the coefficients FIRST: referencing the min/max
    // expressions inside the per-element transform() lambda would
    // re-scan the whole array per element — O(d²) per row (no
    // common-subexpression elimination across lambda bodies; r9
    // review)
    val withCoeffs = df.select(col(idCol).as("id"), col(vecCol).as("_v"),
      mn.as("_mn"), sc.as("_sc"))
    withCoeffs.select(col("id"), col("_mn"), col("_sc"),
      transform(col("_v"),
        x => ((x.cast("double") - col("_mn")) / col("_sc")).cast("float"))
        .as("_scaled"))
  }

  private val PqTok = "PQ(\\d+)(?:x(\\d+))?".r

  /** decode(encode(vec)) as array<double>, with an `SQfp16`,
    * `SQ8`/`SQ4`/`SQ6` or `PQ<m>[x<k>]` inner codec (the reference
    * wraps ANY index, IndexRowwiseMinMax.h:34; these are the codec
    * inners our build() constructs). Trained inners (SQ ranges, PQ
    * codebooks) train on the SCALED rows, exactly as the wrapper
    * trains its sub-index on the scaled dataset
    * (IndexRowwiseMinMax.h train()). */
  def roundtripDf(df: DataFrame, idCol: String, vecCol: String,
      inner: String, fp16Coeffs: Boolean,
      niter: Int = 4, seed: Long = 1234L,
      pqModel: PqModel = null): DataFrame = {
    val base = scaledDf(df, idCol, vecCol, fp16Coeffs)
    val dec: Column = inner match {
      case "SQfp16" =>
        shim.col(Fp16Decode(Fp16Encode(shim.expr(col("_scaled")))))
          .cast("array<double>")
      case "SQ8" | "SQ4" | "SQ6" =>
        val (mins, vdiff) = SqIndex.trainRange(base, "_scaled")
        shim.col(SqVariant.decode(inner,
          SqVariant.encode(inner, shim.expr(col("_scaled")),
            mins, vdiff), mins, vdiff))
      case PqTok(m, ks) =>
        // `pqModel` skips the (expensive) inner training when the
        // caller already holds the scaled-space model — it MUST come
        // from the identical scaledDf input/params or decode diverges
        val model = if (pqModel != null) pqModel
          else Pq.train(base, "_scaled", m.toInt,
            Option(ks).map(_.toInt).getOrElse(16), niter = niter, seed = seed)
        model.decodeCol(shim.col(graft.core.PQEncode(
          shim.expr(col("_scaled")), model.codebooks))).cast("array<double>")
      case other =>
        throw new IllegalArgumentException(s"MinMax inner '$other' unsupported")
    }
    base.select(col("id"),
      transform(dec, h => h * col("_sc") + col("_mn")).as("vec"))
  }

  /** Train + encode into a persistable [[MinMaxIndex]] — the same
    * scaledDf input and inner training as [[roundtripDf]], with the
    * encoded codes MATERIALIZED instead of fused into the decode:
    * reconstruct() of the result equals roundtripDf row for row. */
  def buildIndex(df: DataFrame, idCol: String, vecCol: String,
      inner: String, fp16Coeffs: Boolean,
      niter: Int = 4, seed: Long = 1234L,
      pqModel: PqModel = null): MinMaxIndex = {
    val base = scaledDf(df, idCol, vecCol, fp16Coeffs)
    def withCode(code: Column, sqMins: Array[Double], sqDiff: Array[Double],
        model: PqModel) =
      new MinMaxIndex(inner, fp16Coeffs, sqMins, sqDiff, model,
        base.select(col("id"), col("_mn"), col("_sc"), code.as("code")))
    inner match {
      case "SQfp16" =>
        withCode(shim.col(Fp16Encode(shim.expr(col("_scaled")))),
          Array.empty, Array.empty, null)
      case "SQ8" | "SQ4" | "SQ6" =>
        val (mins, vdiff) = SqIndex.trainRange(base, "_scaled")
        withCode(shim.col(SqVariant.encode(inner, shim.expr(col("_scaled")),
          mins, vdiff)), mins, vdiff, null)
      case PqTok(m, ks) =>
        val model = if (pqModel != null) pqModel
          else Pq.train(base, "_scaled", m.toInt,
            Option(ks).map(_.toInt).getOrElse(16), niter = niter, seed = seed)
        withCode(shim.col(graft.core.PQEncode(shim.expr(col("_scaled")),
          model.codebooks)), Array.empty, Array.empty, model)
      case other =>
        throw new IllegalArgumentException(s"MinMax inner '$other' unsupported")
    }
  }
}

/** Persistable IndexRowwiseMinMax[FP16] state (write_index,
  * faiss/impl/index_write.cpp: the wrapper flag + the inner index):
  * per-row coefficients + inner codes + the inner codec's trained
  * state. A vector CODEC in the reference (search throws,
  * IndexRowwiseMinMax.cpp:361) — the searchable surface is
  * [[reconstruct]], which must reproduce
  * [[MinMaxCodec.roundtripDf]] exactly. */
class MinMaxIndex(val inner: String, val fp16Coeffs: Boolean,
    val sqMins: Array[Double], val sqDiff: Array[Double],
    val pqModel: PqModel,
    /** (id, _mn double, _sc double, code) */
    val codes: DataFrame) {
  /** decode(code) rescaled per row: (id, vec array<double>) — the
    * exact decode chain of roundtripDf (fp16 cast placement
    * included). */
  def reconstruct: DataFrame = {
    val dec: Column = inner match {
      case "SQfp16" =>
        shim.col(Fp16Decode(shim.expr(col("code")))).cast("array<double>")
      case "SQ8" | "SQ4" | "SQ6" =>
        shim.col(SqVariant.decode(inner, shim.expr(col("code")),
          sqMins, sqDiff))
      case _ =>
        pqModel.decodeCol(col("code")).cast("array<double>")
    }
    codes.select(col("id"),
      transform(dec, h => h * col("_sc") + col("_mn")).as("vec"))
  }
}
