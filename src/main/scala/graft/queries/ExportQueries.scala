package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Export plugin — the wide "export dataset" assembly
  * (Plugins/Export.pm:816-1003): one row per isolate, columns drawn from
  * provenance fields, per-locus allele designations (ALL designations of a
  * locus, sorted numerically per `_sort_alleles` (:1159-1165), ';'-joined
  * per `_write_allele` (:1214-1223), empty when undesignated), a scheme
  * field, and the linked-reference list.
  *
  * The reference walks isolates one by one issuing per-isolate lookups
  * (get_all_allele_ids, refs); at scale that is one driver round-trip per
  * row. Here the whole matrix is ONE hash aggregation over the designation
  * fact (multi-valued loci fold map-side into sorted lists) joined to the
  * isolate dimension — the fact shuffles once on its natural key, and the
  * scheme cache is the same aggregate, not a second scan.
  */
object ExportQueries extends QueryModule {

  // Loci are l_linenumber % 3 so a locus can carry SEVERAL designations
  // (the reference's multiple-rows-per-(isolate,locus) semantics,
  // sql/isolatedb.sql:952-988); alleles sort numerically, not lexically.
  private val exportDataset = Q(
    "export_dataset",
    (s, dir) => {
      val o = Tables.load(s, dir, "orders")
      val li = Tables.load(s, dir, "lineitem")
      def locusCol(l: Int) = array_join(
        sort_array(collect_list(when(col("l_linenumber") % 3 === l,
          col("l_suppkey")))).cast("array<string>"), ";").as(s"locus_$l")
      val facts = li.groupBy(col("l_orderkey"))
        .agg(locusCol(0), locusCol(1), locusCol(2),
          round(sum(col("l_quantity")), 4).as("scheme_total"),
          array_join(sort_array(collect_set(col("l_partkey")))
            .cast("array<string>"), "; ").as("refs"))
      o.join(facts, o("o_orderkey") === facts("l_orderkey"), "left")
        .select(col("o_orderkey").as("id"),
          col("o_orderpriority").as("label"),
          col("o_orderdate").cast("string").as("orderdate"),
          coalesce(col("locus_0"), lit("")).as("locus_0"),
          coalesce(col("locus_1"), lit("")).as("locus_1"),
          coalesce(col("locus_2"), lit("")).as("locus_2"),
          col("scheme_total"),
          coalesce(col("refs"), lit("")).as("refs"))
        .orderBy(col("id"))
    },
    Some("""SELECT o_orderkey AS id, o_orderpriority AS label,
                   CAST(o_orderdate AS VARCHAR) AS orderdate,
                   coalesce(locus_0, '') AS locus_0,
                   coalesce(locus_1, '') AS locus_1,
                   coalesce(locus_2, '') AS locus_2,
                   scheme_total,
                   coalesce(refs, '') AS refs
            FROM orders LEFT JOIN (
              SELECT l_orderkey,
                     array_to_string(list_sort(list(l_suppkey)
                       FILTER (WHERE l_linenumber % 3 = 0)), ';') AS locus_0,
                     array_to_string(list_sort(list(l_suppkey)
                       FILTER (WHERE l_linenumber % 3 = 1)), ';') AS locus_1,
                     array_to_string(list_sort(list(l_suppkey)
                       FILTER (WHERE l_linenumber % 3 = 2)), ';') AS locus_2,
                     round(sum(l_quantity), 4) AS scheme_total,
                     array_to_string(list_sort(list(DISTINCT l_partkey)), '; ')
                       AS refs
              FROM lineitem GROUP BY l_orderkey) f ON o_orderkey = l_orderkey
            ORDER BY id"""))

  val qs: Seq[Q] = Seq(exportDataset)
}
