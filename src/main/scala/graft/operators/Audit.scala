package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sources.Tables

/** [EXT] table-audit operators: snapshot differencing (q171) and
  * changelog merge-apply (q172) — the two halves of the reconciliation
  * loop every lakehouse ingest runs: "what changed between yesterday's
  * snapshot and today's?" and "apply this CDC changelog to the base
  * table with latest-wins upsert/delete semantics" (the batch analogue
  * of MERGE INTO).
  *
  * Scale shape: q171 fingerprints each row to a fixed-width md5 BEFORE
  * the full-outer join, so the shuffle carries (key, 32-byte hash) —
  * never the payload — and the unchanged mass (at 100 TB, ~all of it)
  * is filtered right after the join without ever materializing wide
  * rows. q172 reduces the changelog with ONE max(struct(...)) aggregate
  * (map-side partial combine: each task emits at most one row per key)
  * instead of a row_number window, which would sort every change record
  * inside the shuffle; the merge itself is a single full-outer join on
  * the key. On a partitioned production base table the same plan gets
  * dynamic partition pruning from the changelog's touched-partition
  * set for free.
  *
  * Determinism discipline: fingerprints hash only exactly-serialized
  * fields (BIGINT cents, strings, `yyyy-MM-dd` dates — both engines
  * print them identically; doubles are never hashed). The synthetic
  * "new" snapshot of q171 and the upsert/delete ops of q172 are derived
  * from key arithmetic (`k % p == 0`), not engine hashes, so the oracle
  * reproduces them bit-identically; latest-wins ties are impossible
  * because (event ts micros, event_id) is unique.
  */
object Audit {

  /** Divisors synthesizing the q171 "new" snapshot from the old one:
    * keys ≡0 mod 97 are deleted, ≡0 mod 89 get a price bump (changed),
    * ≡0 mod 101 are cloned to key+10^9 (added). Pairwise coprime, so
    * a key can be both deleted and cloned — the diff must handle it. */
  private[graft] val DelMod = 97
  private[graft] val ChgMod = 89
  private[graft] val AddMod = 101

  /** Orders snapshot normalized for fingerprinting: key + exactly
    * serializable payload (BIGINT cents, strings, DATE). */
  private def ordersSnapshot(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir).select(
      col("o_orderkey").as("k"),
      col("o_custkey").as("custkey"),
      col("o_orderstatus").as("status"),
      col("o_orderpriority").as("priority"),
      col("o_orderdate").cast("date").as("odate"),
      expr("cast(round(o_totalprice * 100, 0) as bigint)").as("cents"))

  /** Row fingerprint over the payload columns. md5 (not Spark murmur
    * `hash()`) so the DuckDB oracle computes the identical digest. */
  private def fingerprinted(df: DataFrame): DataFrame =
    df.select(col("k"),
      md5(concat_ws("|", col("custkey"), col("status"), col("priority"),
        col("odate").cast("string"), col("cents"))).as("fp"))

  /** q171 — snapshot diff audit: classify every key of two table
    * snapshots as added / removed / changed / unchanged by comparing
    * row fingerprints under a full-outer join, then fold each class to
    * an audit line (count, key checksum, key range) — the
    * reconciliation report a pipeline emits per ingest cycle. The
    * "new" snapshot is synthesized deterministically from the old one
    * (see [[DelMod]]/[[ChgMod]]/[[AddMod]]) so the operator exercises
    * all four classes on driver-fixed data.
    *
    * The join input is (key, fp) only — payload never shuffles — and
    * the per-class rollup is a 4-row aggregate, so output size is
    * independent of table size; `key_checksum` (exact BIGINT Σkey) lets
    * two sides of a replication pair compare reports without exchanging
    * key lists. */
  def q171SnapshotDiff(spark: SparkSession, dir: String): DataFrame = {
    val old = ordersSnapshot(spark, dir)
    val newSnap = old
      .filter(col("k") % DelMod =!= 0)
      .withColumn("cents",
        when(col("k") % ChgMod === 0, col("cents") + 1000L)
          .otherwise(col("cents")))
      .unionByName(
        old.filter(col("k") % AddMod === 0)
          .withColumn("k", col("k") + 1000000000L))
    val o = fingerprinted(old).withColumnRenamed("fp", "fp_old")
    val n = fingerprinted(newSnap).withColumnRenamed("fp", "fp_new")
    o.join(n, Seq("k"), "full_outer")
      .select(col("k"),
        when(col("fp_old").isNull, "added")
          .when(col("fp_new").isNull, "removed")
          .when(col("fp_old") =!= col("fp_new"), "changed")
          .otherwise("unchanged").as("change_type"))
      .groupBy("change_type")
      .agg(count(lit(1)).as("n_keys"),
        sum(col("k")).as("key_checksum"),
        min(col("k")).as("min_key"),
        max(col("k")).as("max_key"))
      .orderBy("change_type")
  }

  /** Provisioned account range for the q172 base snapshot: users
    * [0, BaseUsers) start at [[BaseCents]]; the events changelog only
    * touches users 0..149, so the tail survives untouched and proves
    * the no-changelog branch of the merge. */
  private[graft] val BaseUsers = 200L
  private[graft] val BaseCents = 10000L

  /** q172 — CDC merge-apply (batch MERGE INTO): reduce the events
    * changelog to the latest op per key (latest-wins by event time,
    * event_id tie-break), then apply it to a base snapshot —
    * `error` events are tombstones (DELETE), everything else upserts
    * the event's value. Output is the post-merge state with row
    * provenance (`base` = untouched, `changelog` = upserted).
    *
    * Latest-wins via max(struct(us, event_id, op, cents)) — struct
    * ordering is lexicographic and (us, event_id) is unique, so this
    * is exactly "ORDER BY ts DESC, event_id DESC LIMIT 1 per key" but
    * partial-aggregatable: at 100 TB each map task pre-folds its
    * partition to ≤1 row/key before the shuffle, where the window
    * formulation would sort the full changelog. */
  def q172CdcMerge(spark: SparkSession, dir: String): DataFrame = {
    val base = spark.range(0L, BaseUsers)
      .select(col("id").as("user_id"), lit(BaseCents).as("base_cents"))
    val latest = Tables.events(spark, dir)
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("us"), col("event_id"),
          when(col("event_type") === "error", "D").otherwise("U").as("op"),
          expr("cast(round(value * 100, 0) as bigint)").as("cents"))
          .as("rec"))
      .groupBy("user_id")
      .agg(max(col("rec")).as("last"))
      .select(col("user_id"), col("last.op").as("op"),
        col("last.cents").as("chg_cents"))
    base.join(latest, Seq("user_id"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(col("user_id"),
        when(col("op") === "U", col("chg_cents"))
          .otherwise(col("base_cents")).as("cents"),
        when(col("op") === "U", "changelog").otherwise("base").as("src"))
      .orderBy("user_id")
  }

  /** Divisor simulating a partial orders ingest for q181: dropping
    * keys ≡0 mod 997 from the parent side orphans their lineitems, so
    * the referential checks have real violations to catch (the q139
    * lesson: an audit that can only ever pass proves nothing). */
  private[graft] val OrphanMod = 997

  /** q181 — referential-integrity audit: FK orphan scans across the
    * star schema (lineitem→orders, lineitem→part, orders→customer,
    * customer→nation), one row per constraint with violation and
    * checked counts. Complements q139, which validates VALUES with
    * per-table scans — these are the JOIN-shaped constraints a
    * single-table fold cannot express. The orders parent is
    * deterministically decimated (see [[OrphanMod]]) to simulate the
    * partial-ingest failure the audit exists to catch.
    *
    * Each check is a left-anti join on the FK: child keys project to
    * the key column before the join (shuffle carries keys only), dim
    * parents (customer, nation) broadcast, and the fact-fact orphan
    * scan (lineitem vs orders) shuffles on the natural join key — at
    * 100 TB the documented accelerations are a parent-key bloom filter
    * at the child scan and storage bucketing on orderkey (q134). */
  def q181IntegrityAudit(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val ord = Tables.orders(spark, dir)
      .filter(col("o_orderkey") % OrphanMod =!= 0)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    def check(name: String, child: DataFrame, key: String,
        parent: DataFrame, pkey: String, broadcastParent: Boolean)
        : DataFrame = {
      val p = parent.select(col(pkey))
      val rhs = if (broadcastParent) broadcast(p) else p
      val orphans = child.select(col(key))
        .join(rhs, col(key) === col(pkey), "left_anti")
        .agg(count(lit(1)).as("violations"))
      val total = child.agg(count(lit(1)).as("n_checked"))
      orphans.crossJoin(total).select(lit(name).as("constraint_name"),
        col("violations"), col("n_checked"))
    }
    check("customer_nation_fk", cust, "c_nationkey", nat, "n_nationkey",
        broadcastParent = true)
      .unionByName(check("lineitem_orders_fk", li, "l_orderkey", ord,
        "o_orderkey", broadcastParent = false))
      .unionByName(check("lineitem_part_fk", li, "l_partkey",
        Tables.part(spark, dir), "p_partkey", broadcastParent = true))
      .unionByName(check("orders_customer_fk", ord, "o_custkey", cust,
        "c_custkey", broadcastParent = true))
      .orderBy("constraint_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q171_snapshot_diff" -> (q171SnapshotDiff _),
    "q172_cdc_merge" -> (q172CdcMerge _),
    "q181_integrity_audit" -> (q181IntegrityAudit _))

  val oracles: Map[String, String] = Map(
    "q181_integrity_audit" ->
      s"""WITH ord AS (
        |  SELECT * FROM orders WHERE o_orderkey % $OrphanMod <> 0),
        |checks AS (
        |  SELECT 'customer_nation_fk' AS constraint_name,
        |         (SELECT count(*) FROM customer c
        |          WHERE NOT EXISTS (SELECT 1 FROM nation n
        |                            WHERE n.n_nationkey = c.c_nationkey))
        |           AS violations,
        |         (SELECT count(*) FROM customer) AS n_checked
        |  UNION ALL
        |  SELECT 'lineitem_orders_fk',
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM ord o
        |                            WHERE o.o_orderkey = l.l_orderkey)),
        |         (SELECT count(*) FROM lineitem)
        |  UNION ALL
        |  SELECT 'lineitem_part_fk',
        |         (SELECT count(*) FROM lineitem l
        |          WHERE NOT EXISTS (SELECT 1 FROM part p
        |                            WHERE p.p_partkey = l.l_partkey)),
        |         (SELECT count(*) FROM lineitem)
        |  UNION ALL
        |  SELECT 'orders_customer_fk',
        |         (SELECT count(*) FROM ord o
        |          WHERE NOT EXISTS (SELECT 1 FROM customer c
        |                            WHERE c.c_custkey = o.o_custkey)),
        |         (SELECT count(*) FROM ord))
        |SELECT constraint_name, violations, n_checked FROM checks
        |ORDER BY constraint_name""".stripMargin,
    "q171_snapshot_diff" ->
      s"""WITH old AS (
        |  SELECT o_orderkey AS k, o_custkey AS custkey,
        |         o_orderstatus AS status, o_orderpriority AS priority,
        |         CAST(o_orderdate AS DATE) AS odate,
        |         CAST(round(o_totalprice * 100, 0) AS BIGINT) AS cents
        |  FROM orders),
        |new_snap AS (
        |  SELECT k, custkey, status, priority, odate,
        |         CASE WHEN k % $ChgMod = 0 THEN cents + 1000
        |              ELSE cents END AS cents
        |  FROM old WHERE k % $DelMod <> 0
        |  UNION ALL
        |  SELECT k + 1000000000, custkey, status, priority, odate, cents
        |  FROM old WHERE k % $AddMod = 0),
        |o AS (SELECT k, md5(concat_ws('|', custkey, status, priority,
        |        CAST(odate AS VARCHAR), cents)) AS fp_old FROM old),
        |n AS (SELECT k, md5(concat_ws('|', custkey, status, priority,
        |        CAST(odate AS VARCHAR), cents)) AS fp_new FROM new_snap),
        |classified AS (
        |  SELECT COALESCE(o.k, n.k) AS k,
        |         CASE WHEN o.k IS NULL THEN 'added'
        |              WHEN n.k IS NULL THEN 'removed'
        |              WHEN fp_old <> fp_new THEN 'changed'
        |              ELSE 'unchanged' END AS change_type
        |  FROM o FULL OUTER JOIN n ON o.k = n.k)
        |SELECT change_type, count(*) AS n_keys,
        |       CAST(sum(k) AS BIGINT) AS key_checksum,
        |       min(k) AS min_key, max(k) AS max_key
        |FROM classified GROUP BY change_type ORDER BY change_type""".stripMargin,
    "q172_cdc_merge" ->
      s"""WITH base AS (
        |  SELECT CAST(unnest(range(0, $BaseUsers)) AS BIGINT) AS user_id,
        |         CAST($BaseCents AS BIGINT) AS base_cents),
        |chg AS (
        |  SELECT user_id,
        |         CASE WHEN event_type = 'error' THEN 'D' ELSE 'U' END AS op,
        |         CAST(round(value * 100, 0) AS BIGINT) AS cents,
        |         row_number() OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(CAST(ts AS TIMESTAMP)) DESC,
        |                    event_id DESC) AS rn
        |  FROM events),
        |latest AS (SELECT user_id, op, cents AS chg_cents
        |           FROM chg WHERE rn = 1)
        |SELECT COALESCE(base.user_id, latest.user_id) AS user_id,
        |       CASE WHEN op = 'U' THEN chg_cents ELSE base_cents END AS cents,
        |       CASE WHEN op = 'U' THEN 'changelog' ELSE 'base' END AS src
        |FROM base FULL OUTER JOIN latest ON base.user_id = latest.user_id
        |WHERE op IS NULL OR op <> 'D'
        |ORDER BY user_id""".stripMargin)
}
