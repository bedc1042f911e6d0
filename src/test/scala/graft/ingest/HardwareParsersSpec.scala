package graft.ingest

import graft.SparkSpec
import org.apache.spark.sql.functions._

class HardwareParsersSpec extends SparkSpec {

  private val lscpuJson =
    """{"lscpu":[
      |  {"field":"CPU(s):","data":"8"},
      |  {"field":"Thread(s) per core:","data":"2"},
      |  {"field":"Socket(s):","data":"1"},
      |  {"field":"Core(s) per socket:","data":"4"},
      |  {"field":"Model name:","data":"Intel(R) Xeon(R) Platinum 8175M CPU @ 2.50GHz"},
      |  {"field":"Flags:","data":"fpu vme"},
      |  {"field":"Caches:","children":[
      |    {"field":"L1d cache:","data":"131072 (4 instances)"},
      |    {"field":"L2 cache:","data":"4194304 (4 instances)"},
      |    {"field":"L3 cache:","data":"33554432 (1 instance)"}]}
      |]}""".stripMargin.replace("\n", "")

  test("parseLscpu derives CPU fields and cache geometry") {
    val sp = spark; import sp.implicits._
    val raw = Seq(("aws", "m5.2xlarge", lscpuJson)).toDF("vendor_id", "server_id", "content")
    val r = HardwareParsers.parseLscpu(raw).collect().head
    assert(r.getAs[Int]("vcpus") == 8)
    assert(r.getAs[Int]("cpu_cores") == 4)
    assert(r.getAs[Int]("physical_cores") == 4)
    assert(r.getAs[Double]("cpu_speed") == 2.5)
    assert(r.getAs[String]("cpu_manufacturer") == "Intel")
    assert(r.getAs[String]("cpu_family") == "Xeon")
    assert(r.getAs[String]("cpu_model") == "8175M")
    assert(r.getAs[Long]("l1d_kib") == 32 && r.getAs[Long]("l1d_total_kib") == 128)
    assert(r.getAs[Long]("l3_total_kib") == 32768)
  }

  test("standardize model handles AMD, Ampere, and junk inputs") {
    assert(HardwareParsers.stdCpuModel("AMD EPYC 7571") == "7571")
    assert(HardwareParsers.stdCpuModel("Ampere Altra Q80-30") == "Ampere Altra Q80-30")
    assert(HardwareParsers.stdCpuModel("AMD EPYC 9R14 48-Core Processor") == "9R14")
    assert(HardwareParsers.stdCpuModel("Not Specified") == null)
    assert(HardwareParsers.stdCpuModel(null) == null)
  }

  test("lstopo overrides lscpu cache topology and sums RAM modules") {
    val sp = spark; import sp.implicits._
    // hypervisor-misreported lscpu says 8 L3 instances; lstopo knows the
    // truth: one shared 32 MiB L3 over 4 cores
    val lstopoXml =
      """<topology>
        |  <object type="Machine">
        |    <object type="Package">
        |      <object type="L3Cache" cache_size="33554432">
        |        <object type="Core"/><object type="Core"/>
        |        <object type="Core"/><object type="Core"/>
        |      </object>
        |    </object>
        |    <object type="Misc" subtype="MemoryModule">
        |      <info name="Type" value="RAM"/><info name="Size" value="16777216"/>
        |    </object>
        |    <object type="Misc" subtype="MemoryModule">
        |      <info name="Type" value="RAM"/><info name="Size" value="16777216"/>
        |    </object>
        |  </object>
        |</topology>""".stripMargin
    val topoRaw = Seq(("aws", "m5.2xlarge", lstopoXml)).toDF("vendor_id", "server_id", "content")
    val caches = HardwareParsers.parseLstopoCaches(topoRaw).collect()
    assert(caches.length == 1)
    val l3 = caches.head
    assert(l3.getAs[String]("level") == "L3")
    assert(l3.getAs[Long]("total_kib") == 32768)
    assert(l3.getAs[Double]("cores_per_domain") == 4.0)
    val mem = HardwareParsers.parseLstopoMemory(topoRaw).collect().head
    assert(mem.getAs[Long]("memory_amount_mib") == 32768) // 2 × 16 GiB in KiB → MiB

    val lscpuRaw = Seq(("aws", "m5.2xlarge", lscpuJson)).toDF("vendor_id", "server_id", "content")
    val lshwRaw = sp.emptyDataset[(String, String, String)]
      .toDF("vendor_id", "server_id", "content")
    val hw = HardwareParsers.hardware(lscpuRaw, topoRaw, lshwRaw).collect().head
    assert(hw.getAs[Long]("l3_total_kib") == 32768)
    assert(hw.getAs[Long]("l1d_total_kib") == 128) // untouched by lstopo
    assert(hw.getAs[Long]("memory_amount_mib") == 32768)
  }

  test("lstopo/lshw parse paths compile under codegen with fallback disabled") {
    // Guards the r6-verdict defect: a private Option-bearing UDF return type
    // made Janino throw (swallowed by the interpreted fallback), silently
    // running inspector ingest row-at-a-time. CODEGEN_ONLY + fallback=false
    // turn any such CompileException into a test failure.
    val sp = spark; import sp.implicits._
    val prevFallback = sp.conf.get("spark.sql.codegen.fallback")
    val prevFactory = sp.conf.get("spark.sql.codegen.factoryMode")
    sp.conf.set("spark.sql.codegen.fallback", "false")
    sp.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val xml =
        """<topology><object type="Machine">
          |  <object type="L2Cache" cache_size="1048576"><object type="Core"/></object>
          |  <object type="Misc" subtype="MemoryModule">
          |    <info name="Type" value="RAM"/><info name="Size" value="4194304"/>
          |  </object>
          |</object></topology>""".stripMargin
      val topoRaw = Seq(("aws", "c5.large", xml)).toDF("vendor_id", "server_id", "content")
      val caches = HardwareParsers.parseLstopoCaches(topoRaw).collect()
      assert(caches.length == 1 && caches.head.getAs[Long]("total_kib") == 1024)
      val mem = HardwareParsers.parseLstopoMemory(topoRaw).collect()
      assert(mem.length == 1 && mem.head.getAs[Long]("memory_amount_mib") == 4096)
      val lshwRaw = Seq(("aws", "c5.large",
        """{"id":"core","children":[{"id":"memory","size":4294967296}]}"""))
        .toDF("vendor_id", "server_id", "content")
      val hw = HardwareParsers.parseLshwMemory(lshwRaw).collect()
      assert(hw.length == 1 && hw.head.getAs[Long]("memory_amount_mib") == 4096)
    } finally {
      sp.conf.set("spark.sql.codegen.fallback", prevFallback)
      sp.conf.set("spark.sql.codegen.factoryMode", prevFactory)
    }
  }

  test("lshw memory walk: direct size, bank fallback, recursive descent") {
    val sp = spark; import sp.implicits._
    val direct = """{"id":"core","children":[{"id":"memory","size":17179869184}]}"""
    val banks =
      """{"id":"core","children":[{"id":"memory","children":[
        |  {"id":"bank:0","size":8589934592},{"id":"bank:1","size":8589934592}]}]}"""
        .stripMargin.replace("\n", "")
    val raw = Seq(("v", "direct", direct), ("v", "banks", banks))
      .toDF("vendor_id", "server_id", "content")
    val out = HardwareParsers.parseLshwMemory(raw).collect()
      .map(r => r.getString(1) -> r.getAs[Long]("memory_amount_mib")).toMap
    assert(out == Map("direct" -> 16384L, "banks" -> 16384L))
  }

  test("lsblk disks: boot network drive skipped per vendor, virtio for hcloud") {
    val sp = spark; import sp.implicits._
    val awsLsblk =
      """{"blockdevices":[
        |  {"name":"nvme0n1","size":8589934592,"subsystems":"block:nvme:pci"},
        |  {"name":"nvme1n1","size":75000000000,"subsystems":"block:nvme:pci"}]}"""
        .stripMargin.replace("\n", "")
    val hcloudLsblk =
      """{"blockdevices":[
        |  {"name":"sda","size":40000000000,"subsystems":"block:scsi:virtio:pci"}]}"""
        .stripMargin.replace("\n", "")
    val raw = Seq(("aws", "i3.large", awsLsblk), ("hcloud", "cx22", hcloudLsblk))
      .toDF("vendor_id", "server_id", "content")
    val disks = HardwareParsers.parseLsblkDisks(raw).collect()
      .map(r => (r.getString(0), r.getAs[Long]("size_gb"), r.getAs[String]("storage_type")))
      .toSet
    // aws nvme0 is the boot drive → only nvme1 kept; hcloud sda is virtio NETWORK
    assert(disks == Set(("aws", 75L, "nvme_ssd"), ("hcloud", 40L, "network")))
    val summary = HardwareParsers.storageSummary(HardwareParsers.parseLsblkDisks(raw))
      .filter(col("vendor_id") === "aws").collect().head
    assert(summary.getAs[Long]("storage_size") == 75L)
    assert(summary.getAs[String]("storage_type") == "nvme_ssd")
  }
}
