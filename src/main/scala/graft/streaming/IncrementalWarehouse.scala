package graft.streaming

import graft.functions.AlleleId
import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Incremental scheme-warehouse maintenance as a stateful stream
  * (SURVEY §2.11 / §4.1): the reference keeps `mv_scheme_<id>` in sync with
  * per-row triggers on profile members (sql/seqdef.sql:1255-1377) and
  * refreshes isolate scheme caches incrementally by cron
  * (update_scheme_caches.pl `incremental`). The Spark-native form: new
  * allele designations arrive as a stream keyed by isolate;
  * `flatMapGroupsWithState` holds each isolate's locus→allele map and emits
  * an updated profile row whenever the designation set changes.
  *
  * The same min-allele resolution rule as the batch warehouse
  * (Profiles.warehouse) — StreamingSpec proves final streamed state equals
  * the batch build over the same designations.
  */
object IncrementalWarehouse {

  case class Designation(entity: Long, locus: Int, allele: String)
  case class ProfileUpdate(entity: Long, profile: Seq[String], profile_md5: String)

  def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Stateful update: merge incoming designations into the per-entity
    * locus→allele map (min-allele wins, matching the batch warehouse);
    * emit the recomputed profile on any change.
    */
  def updates(designations: Dataset[Designation], nLoci: Int): Dataset[ProfileUpdate] = {
    implicit val updEnc = Encoders.product[ProfileUpdate]
    implicit val stateEnc = Encoders.kryo[Map[Int, String]]
    designations
      .groupByKey(_.entity)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (entity: Long, rows: Iterator[Designation], state: GroupState[Map[Int, String]]) =>
          val cur = state.getOption.getOrElse(Map.empty[Int, String])
          val merged = rows.foldLeft(cur) { (m, d) =>
            if (m.get(d.locus).forall(a => d.allele < a)) m + (d.locus -> d.allele)
            else m
          }
          if (merged != cur) {
            state.update(merged)
            val prof = (1 to nLoci).map(i => merged.getOrElse(i, AlleleId.Missing))
            Iterator(ProfileUpdate(entity, prof, md5Hex(prof.mkString(","))))
          } else Iterator.empty
      }
  }
}
