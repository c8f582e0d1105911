package graft.meta

/** Standard SCD2 / Data Vault metadata column names stamped onto every
  * acquisition table.
  *
  * Mirrors the reference contract (reference: diamond/load/DataLoader.scala:47-79
  * and src/main/resources/application.conf `data.meta.*`), re-expressed as plain
  * constants instead of HOCON-driven lookups. Names are part of the on-disk
  * format: history/current parquet written by the loaders carry exactly these.
  */
object Meta {
  val EntityId       = "entity_id"
  val StartTime      = "start_time"
  val EndTime        = "end_time"
  val ValidStartTime = "valid_start_time"
  val ValidEndTime   = "valid_end_time"
  val Source         = "source"
  val ProcessType    = "process_type"
  val ProcessId      = "process_id"
  val ProcessDate    = "process_date"
  val UserId         = "user_id"
  val HashedValue    = "hashed_value"
  val RecType        = "rectype"
  val Version        = "version"
  val IdType         = "id_type"
  val EntityType     = "entity_type"
  /** Link/mapping source/destination hashed keys (reference:
    * ParquetDataLoader.scala:555-975). */
  val SrcEntityId = "src_entity_id"
  val DstEntityId = "dst_entity_id"
  val Confidence  = "confidence"

  /** rectype domain (reference: application.conf `data.rectype.{insert,update,delete}`). */
  object Rec {
    val Insert = "I"
    val Update = "U"
    val Delete = "D"
  }

  /** Open-ended validity sentinel (reference: application.conf
    * `open-end-date-value = 9999-12-31`). */
  val OpenEndDate = "9999-12-31 00:00:00"

  /** Columns every loader stamps, in stable output order. */
  val StampedCols: Seq[String] = Seq(
    EntityId, StartTime, EndTime, Source, ProcessType, ProcessId,
    ProcessDate, UserId, HashedValue, RecType, Version)
}
