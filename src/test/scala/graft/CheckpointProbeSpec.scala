package graft

import org.apache.spark.storage.StorageLevel

/** Empirical pin of localCheckpoint storage semantics (drives the
  * cache-hygiene policy's category-3 classification — see PLANS.md):
  * a localCheckpoint'ed Dataset's blocks live at the RDD level, NOT in
  * the SQL CacheManager, so `Dataset.unpersist()` cannot free them —
  * they are reclaimed by the ContextCleaner once the frame becomes
  * unreferenced and the driver GCs. If a Spark upgrade changes either
  * fact, this spec fails and the policy needs re-deciding. */
class CheckpointProbeSpec extends SparkSpec {
  import spark.implicits._

  test("localCheckpoint blocks are RDD-level: invisible to CacheManager") {
    val df = Seq((1L, "a"), (2L, "b")).toDF("id", "v").localCheckpoint()
    // not a CacheManager entry -> Dataset-level storageLevel reads NONE
    assert(df.storageLevel == StorageLevel.NONE,
      "localCheckpoint must not register with the SQL CacheManager")
    // the checkpoint RDD itself IS persisted (that's where the blocks live)
    val persisted = spark.sparkContext.getPersistentRDDs.values
      .exists(_.getStorageLevel != StorageLevel.NONE)
    assert(persisted, "the checkpoint RDD must be persisted at RDD level")
    // Dataset.unpersist is a no-op on it (nothing in CacheManager) and
    // the frame stays usable — the reason eager release is UNSAFE here:
    // a checkpointed frame has no lineage to recompute from
    df.unpersist(blocking = true)
    assert(df.count() == 2)
  }
}
