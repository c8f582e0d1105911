package graft

import graft.load.{MergeConfig, Scd2Store}
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** On-disk lifecycle of the SCD2 store: history/current/change tables,
  * counts, retention (reference contract: diamond/load/usage.md
  * "Files created"). */
class Scd2StoreSpec extends SparkSpec {
  import spark.implicits._

  private def cfg(pid: String, delta: Boolean = true) = MergeConfig(
    idFields = Seq("cid"), idType = "cust", entityType = "cust",
    source = "unit", processType = "load", processId = pid, userId = "t",
    processTime = "2024-03-01 00:00:00", isDelta = delta)

  it should "persist history/current and survive successive loads" in {
    val dir = Files.createTempDirectory("scd2store").toString
    val store = new Scd2Store(spark, dir)
    val b1 = Seq((1, "a"), (2, "b")).toDF("cid", "v")
    val c1 = store.runLoad("t1", b1, cfg("p1"))
    c1("inserted") shouldBe 2
    store.readCurrent("t1").count() shouldBe 2

    val b2 = Seq((1, "a2"), (3, "c")).toDF("cid", "v")
    val c2 = store.runLoad("t1", b2, cfg("p2").copy(processTime = "2024-03-02 00:00:00"))
    c2("inserted") shouldBe 1
    c2("changed") shouldBe 1
    c2("removed") shouldBe 0
    val cur = store.readCurrent("t1")
    cur.count() shouldBe 3
    cur.filter(col("cid") === 1).select("v").as[String].head() shouldBe "a2"
    // full history retained
    spark.read.parquet(s"$dir/t1/history.parquet").count() shouldBe 4
    // no leftover staging/backup dirs after a successful swap
    new java.io.File(s"$dir/t1").listFiles().map(_.getName)
      .filter(n => n.startsWith(".history_")) shouldBe empty
  }

  it should "compact history, current and change tables without changing read-backs" in {
    val dir = Files.createTempDirectory("scd2compact").toString
    val store = new Scd2Store(spark, dir)
    def load(pid: String, day: Int, rows: Seq[(Int, String)]): Unit =
      store.runLoad("t1", rows.toDF("cid", "v"),
        cfg(pid).copy(processTime = f"2024-03-$day%02d 00:00:00"))
    // five loads, three of them on one process_date so that partition
    // accumulates per-load part files; each history rewrite leaves one
    // file per shuffle partition
    load("p1", 1, Seq(1 -> "a", 2 -> "b"))
    load("p2", 1, Seq(1 -> "a2", 3 -> "c"))
    load("p3", 1, Seq(4 -> "d"))
    load("p4", 2, Seq(1 -> "a3", 5 -> "e"))
    load("p5", 3, Seq(6 -> "f"))
    def files(sub: String): Int = {
      val f = new java.io.File(s"$dir/t1/$sub")
      if (!f.exists()) 0
      else f.listFiles().count(_.getName.startsWith("part-"))
    }
    def slurp(sub: String): Seq[String] =
      spark.read.parquet(s"$dir/t1/$sub")
        .collect().map(_.toString).sorted.toSeq
    val histBefore = slurp("history.parquet")
    val curBefore = slurp("current.parquet")
    val newBefore = slurp("new.parquet")
    files("history.parquet") should be > 2 // the small-file problem is live
    files("new.parquet/process_date=2024-03-01") should be > 1
    store.compactHistory("t1", targetFiles = 2)
    store.compactChangeTables("t1", targetFiles = 1)
    files("history.parquet") should be <= 2
    files("current.parquet") should be <= 2
    files("new.parquet/process_date=2024-03-01") shouldBe 1
    slurp("history.parquet") shouldBe histBefore
    slurp("current.parquet") shouldBe curBefore
    slurp("new.parquet") shouldBe newBefore
    // no leftover staging/backup dirs anywhere after the swaps
    def hidden(f: java.io.File): Seq[String] =
      Option(f.listFiles()).toSeq.flatten.flatMap(c =>
        (if (c.getName.startsWith(".compact_")) Seq(c.getPath) else Nil) ++
          (if (c.isDirectory) hidden(c) else Nil))
    hidden(new java.io.File(s"$dir/t1")) shouldBe empty
    // compaction is invisible to the merge loop: a sixth load still works
    load("p6", 4, Seq(1 -> "a4"))
    store.readCurrent("t1").filter(col("cid") === 1)
      .select("v").as[String].head() shouldBe "a4"
    // crash-between-renames recovery: the live dir is gone, the backup
    // holds the data at its deterministic name — the next compaction
    // call restores it before doing anything else
    val histAfter = slurp("history.parquet")
    new java.io.File(s"$dir/t1/history.parquet").renameTo(
      new java.io.File(s"$dir/t1/.compact_backup_history.parquet")) shouldBe true
    store.compactHistory("t1", targetFiles = 2)
    slurp("history.parquet") shouldBe histAfter
  }

  it should "run merges against catalog tables (C6 variant)" in {
    val store = new graft.load.CatalogStore(spark)
    store.tableExists("cat_t1_history") shouldBe false
    val c1 = store.runLoad("cat_t1", Seq((1, "a"), (2, "b")).toDF("cid", "v"),
      cfg("p1"))
    c1("inserted") shouldBe 2
    store.readCurrent("cat_t1").count() shouldBe 2
    val c2 = store.runLoad("cat_t1", Seq((1, "a2"), (2, "b")).toDF("cid", "v"),
      cfg("p2").copy(processTime = "2024-03-02 00:00:00"))
    c2("changed") shouldBe 1
    spark.table("cat_t1_history").count() shouldBe 3
    store.readCurrent("cat_t1")
      .filter(col("cid") === 1).select("v").as[String].head() shouldBe "a2"
    // as-of between the two loads sees the first state
    store.readSnapshotAsOf("cat_t1", "2024-03-01 12:00:00")
      .filter(col("cid") === 1).select("v").as[String].head() shouldBe "a"
    store.readCurrentOrSnapshot("cat_t1").count() shouldBe 2
  }

  it should "orchestrate loadAll with proc and meta sinks" in {
    val dir = Files.createTempDirectory("scd2all").toString
    val store = new Scd2Store(spark, dir)
    val custs = Seq((1, "gold"), (1, "gold"), (2, "silver")).toDF("cid", "tier")
    val pairs = Seq((1, 10), (2, 20)).toDF("cid", "oid")
    val r = graft.load.Loaders.loadAll(store, Seq(
      graft.load.Loaders.TableLoad("sat_cust", custs, cfg("p1")),
      graft.load.Loaders.TableLoad("hub_cust", custs, cfg("p1"), kind = "hub"),
      graft.load.Loaders.TableLoad("lnk_cust_order", pairs,
        cfg("p1").copy(idFields = Seq("cid", "oid")), kind = "link",
        srcFields = Seq("cid"), srcIdType = "cust",
        dstFields = Seq("oid"), dstIdType = "order")))
    r("hub_cust")("inserted") shouldBe 2
    r("sat_cust")("inserted") shouldBe 2
    r("sat_cust")("read") shouldBe 3
    r("sat_cust")("duplicates") shouldBe 1
    r("lnk_cust_order")("inserted") shouldBe 2
    // proc + meta sinks exist with the audited line
    val proc = new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/sat_cust/proc.csv")), "UTF-8")
    proc should include("p1,load,sat_cust,3,1,2,0,0")
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/hub_cust/meta.json")), "UTF-8") should
      include(""""id_type": "cust"""")
    // hub history carries only keys + metadata
    spark.read.parquet(s"$dir/hub_cust/history.parquet")
      .columns should not contain "tier"
  }

  it should "drive a multi-table loadAll from a HOCON config fixture" in {
    val dir = Files.createTempDirectory("scd2conf").toString
    Seq((1, "gold", "a@x.com"), (2, "silver", "b@x.com"))
      .toDF("cust_id", "tier", "email")
      .write.mode("overwrite").parquet(s"$dir/raw/customers.parquet")
    Seq((1, "a@x.com"), (2, "b@x.com")).toDF("cust_id", "email")
      .write.mode("overwrite").parquet(s"$dir/raw/email_map.parquet")
    // the reference data.conf shape: substitutions, unquoted strings with
    // spaces, dotted path keys, new-names, a constant mapping confidence
    val confText =
      s"""data {
         |  base-uri = "$dir"   // comment after a value
         |  raw {
         |    path = raw
         |    tables {
         |      demographics.path = $${data.base-uri}/$${data.raw.path}/customers.parquet
         |      email-mappings.path = $${data.base-uri}/$${data.raw.path}/email_map.parquet
         |    }
         |  }
         |  acquisition {
         |    hubs {
         |      customer {
         |        entity-type = customer
         |        delta = false
         |        id-fields = [cust_id]
         |        id-type = id1
         |        source = $${data.raw.tables.demographics.path}
         |        new-names { cust_id: customer_id }
         |      }
         |    }
         |    satellites {
         |      customer-demographics {
         |        table-name = customer_demo
         |        delta = false
         |        id-fields = [cust_id]
         |        id-type = id1
         |        source = $${data.raw.tables.demographics.path}
         |        write-change-tables = false
         |      }
         |    }
         |    mappings {
         |      email {
         |        entity-type = customer
         |        delta = false
         |        src-id-fields = [cust_id]
         |        src-id-type = Customer Number
         |        dst-id-fields = [email]
         |        dst-id-type = email
         |        confidence = 1.0
         |        source = $${data.raw.tables.email-mappings.path}
         |      }
         |    }
         |  }
         |}""".stripMargin
    val store = new Scd2Store(spark, s"$dir/store")
    val r = graft.load.LoadConfig.loadAll(store, confText,
      processId = "pc1", processTime = "2024-03-01 00:00:00")
    r.keySet shouldBe Set("customer", "customer_demo", "email")
    r("customer")("inserted") shouldBe 2
    r("customer_demo")("inserted") shouldBe 2
    r("email")("inserted") shouldBe 2
    // the hub renamed cust_id -> customer_id and kept only the key
    val hubCols = spark.read.parquet(s"$dir/store/customer/history.parquet").columns
    hubCols should contain("customer_id")
    hubCols should not contain "tier"
    // the mapping carries the constant confidence and hashed side keys
    val m = spark.read.parquet(s"$dir/store/email/history.parquet")
    m.columns should contain allOf ("confidence", "src_entity_id", "dst_entity_id")
    m.select("confidence").as[Double].collect().toSet shouldBe Set(1.0)
    // config-side metadata flowed into meta.json (incl. the unquoted
    // two-word id-type)
    new String(Files.readAllBytes(
      java.nio.file.Paths.get(s"$dir/store/email/meta.json")), "UTF-8") should
      include("Customer Number|email")
    // write-change-tables = false suppressed the satellite's change
    // tables; the hub (unconfigured -> store default) kept its own
    Files.exists(java.nio.file.Paths.get(
      s"$dir/store/customer_demo/new.parquet")) shouldBe false
    Files.exists(java.nio.file.Paths.get(
      s"$dir/store/customer/new.parquet")) shouldBe true
  }

  it should "load tables of one phase concurrently with sequential-identical results" in {
    val dir = Files.createTempDirectory("scd2par").toString
    val store = new Scd2Store(spark, dir)
    val custs = Seq((1, "gold"), (2, "silver"), (3, "bronze")).toDF("cid", "tier")
    val pairs = Seq((1, 10), (2, 20)).toDF("cid", "oid")
    val r = graft.load.Loaders.loadAllParallel(store, Seq(
      graft.load.Loaders.TableLoad("sat_a", custs, cfg("pa")),
      graft.load.Loaders.TableLoad("sat_b", custs, cfg("pb")),
      graft.load.Loaders.TableLoad("hub_a", custs, cfg("pc"), kind = "hub"),
      graft.load.Loaders.TableLoad("lnk_a", pairs,
        cfg("pd").copy(idFields = Seq("cid", "oid")), kind = "link",
        srcFields = Seq("cid"), srcIdType = "cust",
        dstFields = Seq("oid"), dstIdType = "order")), maxConcurrent = 3)
    r("sat_a")("inserted") shouldBe 3
    r("sat_b")("inserted") shouldBe 3
    r("hub_a")("inserted") shouldBe 3
    r("lnk_a")("inserted") shouldBe 2
    // every table published its full store layout despite concurrency
    for (t <- Seq("sat_a", "sat_b", "hub_a", "lnk_a")) {
      spark.read.parquet(s"$dir/$t/history.parquet").count() should be > 0L
      Files.exists(java.nio.file.Paths.get(s"$dir/$t/proc.csv")) shouldBe true
    }
  }

  it should "read current-or-snapshot and as-of views" in {
    val dir = Files.createTempDirectory("scd2asof").toString
    val store = new Scd2Store(spark, dir)
    store.runLoad("t3", Seq((1, "a"), (2, "b")).toDF("cid", "v"), cfg("p1"))
    store.runLoad("t3", Seq((1, "a2")).toDF("cid", "v"),
      cfg("p2").copy(processTime = "2024-03-10 00:00:00"))
    // current prefers the materialized table
    store.readCurrentOrSnapshot("t3").count() shouldBe 2
    // as-of between the loads sees the first state
    val asOf = store.readSnapshotAsOf("t3", "2024-03-05 00:00:00")
    asOf.count() shouldBe 2
    asOf.filter(col("cid") === 1).select("v").as[String].head() shouldBe "a"
    // history-only fallback (simulate an externally-written table)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sessionState.newHadoopConf())
    fs.delete(new org.apache.hadoop.fs.Path(s"$dir/t3/current.parquet"), true)
    store.readCurrentOrSnapshot("t3").count() shouldBe 2
  }

  it should "expire old change-table partitions by directory" in {
    val dir = Files.createTempDirectory("scd2exp").toString
    val store = new Scd2Store(spark, dir)
    store.runLoad("t2", Seq((1, "a")).toDF("cid", "v"), cfg("p1"))
    store.runLoad("t2", Seq((1, "b")).toDF("cid", "v"),
      cfg("p2").copy(processTime = "2024-03-20 00:00:00"))
    store.expireChangeTables("t2", java.time.LocalDate.parse("2024-03-21"), 7)
    val parts = new java.io.File(s"$dir/t2/changed.parquet").listFiles()
      .map(_.getName).filter(_.startsWith("process_date="))
    parts should contain("process_date=2024-03-20")
    parts should not contain "process_date=2024-03-01"
  }
}
