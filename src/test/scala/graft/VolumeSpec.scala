package graft

import org.apache.spark.sql.functions._
import graft.operators.Volume

/** T1 hand-computed tests for the volume operator set (flexcalc R4-R26
  * analogs on the chunked-slab data model).
  */
class VolumeSpec extends SparkSpec {

  /** 4×4×4 volume, value = z*100 + y*10 + x (uniquely identifies voxels). */
  private def vol4 = Volume.fromArray(spark, "v",
    Array.tabulate(4, 4, 4)((z, y, x) => (z * 100 + y * 10 + x).toFloat))

  test("fromArray round-trips shape and values") {
    val df = vol4
    assert(df.count() === 16) // 4z × 4y lines
    val line = df.filter(col("z") === 2 && col("y") === 3).head().getSeq[Float](3)
    assert(line === Seq(230f, 231f, 232f, 233f))
  }

  test("crop selects the sub-volume and re-bases indices (R26)") {
    val c = Volume.crop(vol4, 1, 3, 1, 3, 1, 3)
    assert(c.count() === 4) // 2z × 2y
    val line = c.filter(col("z") === 0 && col("y") === 0).head().getSeq[Float](3)
    assert(line === Seq(111f, 112f)) // original (z=1,y=1,x=1..2)
  }

  test("binPool(2) averages 2×2×2 neighborhoods (R26)") {
    val b = Volume.binPool(vol4, 2)
    assert(b.count() === 4) // 2z × 2y lines of length 2
    val line = b.filter(col("z") === 0 && col("y") === 0).head().getSeq[Float](3)
    // mean of z∈{0,1}, y∈{0,1}, x∈{0,1}: 100*0.5 + 10*0.5 + 0.5 = 55.5
    assert(line.head === 55.5f)
    assert(line(1) === 57.5f) // x∈{2,3} → +2
  }

  test("binPool on lines narrower than k pools to empty, not garbage") {
    val thin = Volume.fromArray(spark, "t", Array.tabulate(2, 2, 3)((_, _, x) => x.toFloat))
    val pooled = Volume.binPool(thin, 4)
    assert(pooled.collect().forall(_.getSeq[Float](3).isEmpty))
  }

  test("hardThreshold zeroes below-threshold voxels only (R14)") {
    val t = Volume.hardThreshold(vol4, 200.0)
    val kept = t.select(explode(col("xs")).as("v")).filter(col("v") > 0).count()
    // surviving voxels: value >= 200 → z in {2,3} → 32 voxels
    assert(kept === 32)
  }

  test("histogram conserves voxel count (R16)") {
    val h = Volume.histogram(vol4, 0, 400, 4).collect()
    assert(h.map(_.getLong(1)).sum === 64)
    // bins of width 100 ↔ z-planes of 16 voxels each
    assert(h.map(_.getLong(1)).toSeq === Seq(16L, 16L, 16L, 16L))
  }

  test("centreOfMass of a single bright voxel is that voxel (R18)") {
    val one = Volume.fromArray(spark, "p",
      Array.tabulate(3, 3, 3)((z, y, x) => if (z == 2 && y == 1 && x == 0) 7f else 0f))
    val (cx, cy, cz) = Volume.centreOfMass(one)
    assert((cx, cy, cz) === ((0.0, 1.0, 2.0)))
  }

  test("boundingBox finds the above-threshold extent (R19)") {
    val bb = Volume.boundingBox(vol4, 310.0) // z=3, y>=1 region
    assert(bb.contains(((0, 3), (1, 3), (3, 3))))
    assert(Volume.boundingBox(vol4, 1e9).isEmpty)
  }

  test("translate shifts centre of mass by (dx, dy, dz) (R11)") {
    val one = Volume.fromArray(spark, "p",
      Array.tabulate(4, 4, 4)((z, y, x) => if (z == 1 && y == 1 && x == 1) 5f else 0f))
    val t = Volume.translate(one, 1, 1, 2)
    val (cx, cy, cz) = Volume.centreOfMass(t)
    assert((cx, cy, cz) === ((3.0, 2.0, 2.0)))
    // negative x-shift drops data off the edge, keeps shape
    val back = Volume.translate(one, 0, 0, -1)
    assert(back.head().getSeq[Float](3).length === 4)
  }

  test("stitch feather-blends the overlap (R10)") {
    val a = Volume.fromArray(spark, "s", Array.tabulate(1, 1, 2)((_, _, _) => 1f))
    val b = Volume.fromArray(spark, "s", Array.tabulate(1, 1, 2)((_, _, _) => 3f))
    val st = Volume.stitch(a, b)
    assert(st.count() === 1)
    assert(st.head().getSeq[Float](3) === Seq(2f, 2f)) // mean of 1 and 3
  }

  test("equalizeIntensity matches means (R9); cast2type hits full range (R15)") {
    val a = Volume.fromArray(spark, "a", Array.tabulate(1, 1, 4)((_, _, _) => 10f))
    val b = Volume.fromArray(spark, "b", Array.tabulate(1, 1, 4)((_, _, x) => (x + 1).toFloat))
    val eq = Volume.equalizeIntensity(a, b)
    val meanB = eq.select(explode(col("xs")).as("v")).agg(avg("v")).head().getDouble(0)
    assert(math.abs(meanB - 10.0) < 1e-6)
    val c = Volume.cast2type(vol4, 255)
    val r = c.select(explode(col("xs")).as("v")).agg(min("v"), max("v")).head()
    assert(r.getInt(0) === 0 && r.getInt(1) === 255)
  }

  test("flatDarkCorrect computes -log((p-dark)/(flat-dark)) (R4)") {
    val proj = Volume.fromArray(spark, "p",
      Array.tabulate(1, 2, 3)((_, _, _) => 0.5f))
    val flat = Volume.fromArray(spark, "f",
      Array.tabulate(1, 2, 3)((_, _, _) => 1.0f)).filter(col("z") === 0)
    val dark = Volume.fromArray(spark, "d",
      Array.tabulate(1, 2, 3)((_, _, _) => 0.0f)).filter(col("z") === 0)
    val out = Volume.flatDarkCorrect(proj, flat, dark)
    val v = out.head().getSeq[Float](3).head
    assert(math.abs(v - math.log(2.0)) < 1e-6) // -log(0.5) = ln 2
  }

  test("subtractAir removes per-projection air level (R5)") {
    // projection z has constant value z+10; air window = whole line
    val p = Volume.fromArray(spark, "p",
      Array.tabulate(2, 2, 4)((z, _, _) => (z + 10).toFloat))
    val out = Volume.subtractAir(p, 0, 4)
    val vs = out.select(explode(col("xs")).as("v")).agg(min("v"), max("v")).head()
    assert(vs.getFloat(0) === 0f && vs.getFloat(1) === 0f)
  }

  test("residualRings subtracts the per-pixel angular median (R6)") {
    // constant-over-z stripe at x=1 → fully removed; varying signal survives
    val p = Volume.fromArray(spark, "p",
      Array.tabulate(3, 1, 3)((z, _, x) => if (x == 1) 5f else z.toFloat))
    val out = Volume.residualRings(p)
    val stripe = out.select(explode(col("xs")).as("v")).collect().map(_.getFloat(0))
    // x=1 column becomes 0 everywhere; x=0/2 become z - median(z) = z-1
    assert(out.filter(col("z") === 1).head().getSeq[Float](3) === Seq(0f, 0f, 0f))
    assert(out.filter(col("z") === 0).head().getSeq[Float](3) === Seq(-1f, 0f, -1f))
    assert(stripe.length === 9)
  }

  test("expandGap inserts an interpolated ramp (R8)") {
    val p = Volume.fromArray(spark, "p", Array(Array(Array(1f, 4f))))
    val out = Volume.expandGap(p, 1, 2) // insert 2 cols between 1 and 4
    assert(out.head().getSeq[Float](3) === Seq(1f, 2f, 3f, 4f))
  }

  test("applyTransferCurve interpolates piecewise-linearly (R13)") {
    val p = Volume.fromArray(spark, "p", Array(Array(Array(-1f, 0f, 5f, 10f, 20f))))
    val out = Volume.applyTransferCurve(p, Seq((0.0, 0.0), (10.0, 100.0)))
    assert(out.head().getSeq[Float](3) === Seq(0f, 0f, 50f, 100f, 100f))
  }

  test("intensityRange and otsuThreshold split a bimodal volume (R17/R20)") {
    val bimodal = Volume.fromArray(spark, "b",
      Array.tabulate(2, 2, 8)((z, _, x) => if (x < 4) 1f else 9f))
    val (p05, p95) = Volume.intensityRange(bimodal, 0.05)
    assert(p05 === 1.0 && p95 === 9.0)
    val thr = Volume.otsuThreshold(bimodal, 0, 10, 10)
    assert(thr > 1.0 && thr <= 9.0)
    val kept = Volume.hardThreshold(bimodal, thr)
      .select(explode(col("xs")).as("v")).filter(col("v") > 0).count()
    assert(kept === 16) // exactly the bright half survives
  }

  test("registerTranslation recovers a known shift (R12) and normL2 (R21)") {
    val base = Volume.fromArray(spark, "r",
      Array.tabulate(5, 5, 5)((z, y, x) => if (z == 1 && y == 1 && x == 1) 4f else 0f))
    val moved = Volume.translate(base, 2, 1, 1)
    assert(Volume.registerTranslation(moved, base) === ((2, 1, 1)))
    assert(math.abs(Volume.normL2(base) - 4.0) < 1e-9)
  }
}
