package graft

import graft.load.{MergeConfig, Scd2Merge}
import graft.meta.Meta
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style invariant checks over randomized (seeded) load
  * sequences — the SURVEY §5 recommendation: version monotonicity,
  * current = arg-max(version), idempotent re-load, branch-count
  * consistency. Each scenario applies a chain of random full loads
  * (mutations + drops + additions) and asserts the contract after every
  * merge. */
class Scd2PropertySpec extends SparkSpec {
  import spark.implicits._

  private def cfg(pid: String, pt: String = "2024-05-01 00:00:00") =
    MergeConfig(
      idFields = Seq("cid"), idType = "e", entityType = "e", source = "prop",
      processType = "full", processId = pid, userId = "t",
      processTime = pt, isDelta = false)

  private def randomBatch(rnd: Random, idSpace: Int): DataFrame = {
    val rows = (1 to idSpace).filter(_ => rnd.nextDouble() > 0.3)
      .map(i => (i, s"v${rnd.nextInt(3)}"))
    if (rows.isEmpty) Seq((1, "v0")).toDF("cid", "tier")
    else rows.toDF("cid", "tier")
  }

  private def checkInvariants(r: Scd2Merge.MergeResult,
      prevHistCount: Long): Unit = {
    val hist = r.history.cache()
    // one current row per entity, and it is the arg-max version
    val snap = Scd2Merge.snapshot(hist)
    snap.groupBy(col(Meta.EntityId)).count()
      .filter(col("count") > 1).count() shouldBe 0
    val maxV = hist.groupBy(col(Meta.EntityId))
      .agg(max(col(Meta.Version)).as("mv"))
    snap.join(maxV, Meta.EntityId)
      .filter(col(Meta.Version) =!= col("mv")).count() shouldBe 0
    // versions are contiguous 1..max per entity (no gaps, no dups)
    val perEntity = hist.groupBy(col(Meta.EntityId))
      .agg(count(lit(1)).as("n"), max(col(Meta.Version)).as("mv"),
        countDistinct(col(Meta.Version)).as("nv"))
    perEntity.filter(col("n") =!= col("mv") ||
      col("nv") =!= col("n")).count() shouldBe 0
    // history growth equals the emitted branch counts (append mode)
    val delta = r.inserted.count() + r.changed.count() + r.removed.count()
    hist.count() - prevHistCount shouldBe delta
    hist.unpersist()
    ()
  }

  it should "hold merge invariants across random load chains" in {
    for (seed <- Seq(1, 7, 42)) {
      val rnd = new Random(seed)
      var hist: Option[DataFrame] = None
      var histCount = 0L
      // per-step snapshots for the time-travel invariant below
      var stepSnaps: List[(String, DataFrame)] = Nil
      for (step <- 1 to 3) {
        val pt = s"2024-05-0$step 00:00:00"
        val r = Scd2Merge.merge(randomBatch(rnd, 12), hist,
          cfg(s"p$seed-$step", pt))
        checkInvariants(r, histCount)
        hist = Some(r.history.localCheckpoint(true))
        histCount = hist.get.count()
        stepSnaps ::= pt -> Scd2Merge.snapshot(hist.get).localCheckpoint(true)
      }
      // time travel: as-of each load's processTime reproduces that load's
      // snapshot EXACTLY (append-only history never mutates old rows)
      for ((pt, snapK) <- stepSnaps) {
        val asOf = Scd2Merge.snapshotAsOf(hist.get, pt)
        asOf.count() shouldBe snapK.count()
        asOf.exceptAll(snapK).count() shouldBe 0
        snapK.exceptAll(asOf).count() shouldBe 0
      }
      // idempotence: replaying the exact final state as a full load is a no-op
      val replay = Scd2Merge.snapshot(hist.get)
        .filter(col(Meta.RecType) =!= Meta.Rec.Delete)
        .select(col("cid"), col("tier"))
      val r = Scd2Merge.merge(replay, hist, cfg(s"p$seed-replay"))
      r.inserted.count() shouldBe 0
      r.changed.count() shouldBe 0
      r.removed.count() shouldBe 0
    }
  }
}
