package graft.ingest

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Hardware-spec parsers (reference `inspector.py:137-229, 1260-1400` and
  * `inspector_helpers.py:1-329`): lscpu / lshw / lsblk JSON and lstopo XML
  * dumps → typed server-hardware columns that feed the P4 standardization
  * chain and the membench RAM-scope cache threshold.
  *
  * Input shape matches [[InspectorParsers]]: a DataFrame of raw file
  * contents keyed by (vendor_id, server_id). Everything is per-row
  * map-side work — JSON via `from_json` + array lookups (codegen'd), the
  * two genuinely procedural parses (lstopo XML DOM walk, lshw recursive
  * tree search) in small deterministic UDFs over dimension-sized frames,
  * the same tradeoff the reference's nvidia-smi parser already takes.
  */
object HardwareParsers {

  private val keyCols = Seq(col("vendor_id"), col("server_id"))

  // ---------------------------------------------------------------- lscpu

  private val lscpuEntry = new StructType()
    .add("field", StringType).add("data", StringType)
  private val lscpuSchema = new StructType()
    .add("lscpu", ArrayType(new StructType()
      .add("field", StringType).add("data", StringType)
      .add("children", ArrayType(lscpuEntry))))

  /** First entry with the given `field`, like the reference's `_listsearch`
    * (`inspector.py:152-157`) — no map build, so duplicate fields (multi-
    * socket children) cannot throw; `get` is OOB-null-safe under ANSI. */
  private def lookup(entries: Column, fieldName: String): Column =
    get(filter(entries, e => e.getField("field") === lit(fieldName)), lit(0))
      .getField("data")

  /** Regex capture → numeric, null when no match (ANSI-safe: never casts
    * the empty string). */
  private def num(src: Column, pattern: String, to: String): Column =
    nullif(regexp_extract(src, pattern, 1), lit("")).cast(to)

  private def cacheCols(entries: Column, fieldName: String, prefix: String): Seq[Column] = {
    // "262144 (4 instances)" | "67108864 (1 instance)" | "262144"
    // (inspector_helpers.py:66-82); per-instance = total // instances // 1024
    // (nested positive floor-divisions fold into one)
    val data = lookup(entries, fieldName)
    val total = num(data, "^\\s*(\\d+)", "long")
    val instances = coalesce(num(data, "\\((\\d+)\\s+instance", "int"),
      when(total.isNotNull, lit(1)))
    Seq(
      floor(total / (instances.cast("long") * 1024L)).cast("long").as(s"${prefix}_kib"),
      floor(total / 1024L).cast("long").as(s"${prefix}_total_kib"),
      instances.as(s"${prefix}_instances"))
  }

  /** `_standardize_cpu_model` (`inspector.py:828-904`): ordered one-shot
    * prefix strips, trailing clock/core-count/slash cleanup, known-alias
    * fixes. A straight-line string cleanup over a dimension table — a UDF
    * keeps the 40-prefix sequence out of the physical plan. */
  val stdCpuModel: String => String = { raw =>
    if (raw == null) null
    else {
      var model = raw.trim
      if (Set("Not Specified", "NotSpecified", "(invalid)",
          "GENUINE INTEL(R) 0000", "pc-i440fx-9.2").contains(model)) null
      else {
        val prefixes = Seq(
          "Alibaba", "Hygon", "Intel®", "Intel", "INTEL", "AMD", "(R)",
          "Xeon®", "Xeon", "XEON", "EPYC ", "EPYC™ ", "EPYC-", "AWS ",
          "(R)", "™", "Platinum", "PLATINUM", "Gold", "CPU",
          "Core Processor ", "Processor",
          "(Broadwell, no TSX, IBRS)", "(Ice Lake)", "(Cascadelake)",
          "(Cascade Lake)", "(Skylake)", "(Skylake, IBRS)",
          "(Skylake, IBRS, no TSX)", "(Cooper Lake)", "(Sapphire Rapid)",
          "(Sapphire Rapids)", "(Emerald Rapids)", "(EMR)", "EMR ",
          "Genoa", "Milan", "Rome", "ROME", "Turin-C", "Turin",
          "Platinum", "Gold", "Processor")
        prefixes.foreach { p =>
          if (model.startsWith(p)) model = model.substring(p.length).replaceAll("^\\s+", "")
        }
        model = model.replaceAll("( CPU)? ?@ \\d+\\.\\d+GHz$", "")
        model = model.replaceAll("( \\d+-Core)?( Processor)?$", "")
        model = model.replaceAll("/.*$", "")
        model = model.replaceAll("（.*$", "")
        model match {
          case "Intel Core Processor (Haswell, no TSX)" => "Haswell"
          case "EPYC-Genoa" => "Genoa"
          case "EPYC-Milan" => "Milan"
          case m if m.trim.isEmpty => null
          case m => m
        }
      }
    }
  }
  private val stdCpuModelUdf = udf(stdCpuModel)

  /** lscpu JSON (`{"lscpu": [{field, data, children: [...]}, ...]}`) →
    * one row per server with CPU fields + per-level cache geometry
    * (reference mappings at `inspector.py:1355-1375`). */
  def parseLscpu(raw: DataFrame): DataFrame = {
    val top = from_json(col("content"), lscpuSchema).getField("lscpu")
    val flatKids = flatten(transform(top,
      e => coalesce(e.getField("children"),
        array().cast(ArrayType(lscpuEntry)))))
    val tops = transform(top,
      e => struct(e.getField("field").as("field"), e.getField("data").as("data")))
    val withEntries = raw.withColumn("__e", concat(tops, flatKids))
    val e = col("__e")
    val model = lookup(e, "Model name:")
    val vcpus = num(lookup(e, "CPU(s):"), "^(\\d+)", "int")
    val tpc = num(lookup(e, "Thread(s) per core:"), "^(\\d+)", "int")
    val sockets = num(lookup(e, "Socket(s):"), "^(\\d+)", "int")
    val coresPerSocket = num(lookup(e, "Core(s) per socket:"), "^(\\d+)", "int")
    // physical cores: CPU(s)/threads-per-core, falling back to
    // sockets × cores-per-socket (inspector_helpers.py:265-289)
    val physCores = coalesce(
      when(tpc > 0, floor(vcpus / tpc).cast("int")),
      sockets * coresPerSocket)
    withEntries.select(keyCols ++ Seq(
      vcpus.as("vcpus"),
      (coresPerSocket * sockets).as("cpu_cores"),
      physCores.as("physical_cores"),
      num(model, " @ ([0-9.]*)GHz$", "double").as("cpu_speed"),
      // get_cpu_manufacturer / get_cpu_family (inspector.py:1295-1320)
      when(lower(model).contains("intel"), "Intel")
        .when(lower(model).contains("amd"), "AMD")
        .when(lower(model).contains("ampere"), "Ampere").as("cpu_manufacturer"),
      when(lower(model).contains("xeon"), "Xeon")
        .when(lower(model).contains("epyc"), "EPYC")
        .when(lower(model).contains("altra"), "Altra").as("cpu_family"),
      stdCpuModelUdf(model).as("cpu_model"),
      split(lookup(e, "Flags:"), " ").as("cpu_flags")) ++
      cacheCols(e, "L1d cache:", "l1d") ++
      cacheCols(e, "L1i cache:", "l1i") ++
      cacheCols(e, "L2 cache:", "l2") ++
      cacheCols(e, "L3 cache:", "l3"): _*)
  }

  // --------------------------------------------------------------- lstopo

  /** hwloc XML: per-level cache objects with `cache_size` + descendant Core
    * counts (`inspector_helpers.py:180-215`) and RAM MemoryModule sizes
    * (`:92-121`). */
  private val parseLstopoUdf = udf { (xml: String) =>
    try {
      val doc = javax.xml.parsers.DocumentBuilderFactory.newInstance()
        .newDocumentBuilder()
        .parse(new java.io.ByteArrayInputStream(xml.getBytes("UTF-8")))
      val levelOf = Map("L1Cache" -> "L1d", "L1iCache" -> "L1i",
        "L2Cache" -> "L2", "L3Cache" -> "L3")
      def descendants(e: org.w3c.dom.Element): Iterator[org.w3c.dom.Element] = {
        val kids = e.getChildNodes
        (0 until kids.getLength).iterator.map(kids.item)
          .collect { case el: org.w3c.dom.Element => el }
          .flatMap(el => Iterator(el) ++ descendants(el))
      }
      val root = doc.getDocumentElement
      val all = (Iterator(root) ++ descendants(root)).toSeq
      val caches = all.flatMap { el =>
        levelOf.get(el.getAttribute("type")).flatMap { level =>
          val size = el.getAttribute("cache_size")
          if (size.isEmpty) None
          else scala.util.Try(size.toLong).toOption.map { bytes =>
            val cores = descendants(el).count(_.getAttribute("type") == "Core")
            LstopoCache(level, bytes, math.max(cores, 1))
          }
        }
      }
      val memKib = all.filter(el =>
          el.getAttribute("type") == "Misc" &&
          el.getAttribute("subtype") == "MemoryModule")
        .flatMap { el =>
          val infos = el.getElementsByTagName("info")
          val kv = (0 until infos.getLength).map(infos.item)
            .collect { case i: org.w3c.dom.Element => i.getAttribute("name") -> i.getAttribute("value") }
            .toMap
          if (kv.get("Type").forall(_ == "RAM"))
            kv.get("Size").flatMap(s => scala.util.Try(s.toLong).toOption)
          else None
        }.sum
      LstopoInfo(caches,
        if (memKib > 0) java.lang.Long.valueOf(memKib / 1024) else null)
    } catch { case _: Throwable => LstopoInfo(Seq.empty, null) }
  }

  /** lstopo XML → per-level aggregate rows: total bytes, instance count,
    * cores per domain — the override source for hypervisor-misreported
    * lscpu topology (`inspector_helpers.py:218-258`). */
  def parseLstopoCaches(raw: DataFrame): DataFrame =
    raw.select(keyCols :+ explode(parseLstopoUdf(col("content")).getField("caches")).as("c"): _*)
      .select(keyCols ++ Seq(col("c.level").as("level"),
        col("c.sizeBytes").as("size_bytes"), col("c.cores").as("num_cores")): _*)
      .groupBy(keyCols :+ col("level"): _*)
      .agg(sum(col("size_bytes")).as("total_bytes"),
        count(lit(1)).as("instances"),
        sum(col("num_cores")).as("total_cores"))
      .select(keyCols ++ Seq(col("level"),
        floor(col("total_bytes") / 1024L).cast("long").as("total_kib"),
        floor(col("total_bytes") / (col("instances") * 1024L)).cast("long")
          .as("per_instance_kib"),
        col("instances"),
        (col("total_cores").cast("double") / col("instances")).as("cores_per_domain")): _*)

  /** lstopo-summed RAM MemoryModule MiB per server. */
  def parseLstopoMemory(raw: DataFrame): DataFrame =
    raw.select(keyCols :+ parseLstopoUdf(col("content")).getField("memoryMib")
      .as("memory_amount_mib"): _*)
      .filter(col("memory_amount_mib").isNotNull)

  // ----------------------------------------------------------------- lshw

  /** Recursive first-match search for the memory node
    * (`inspector_helpers.py:124-158`): node id starting with "memory" with
    * a positive size, else the sum of its bank children. */
  private val lshwMemoryUdf = udf { (json: String) =>
    import scala.jdk.CollectionConverters._
    def walk(v: Any): Option[Long] = v match {
      case l: java.util.List[_] => l.asScala.iterator.flatMap(walk(_).iterator).nextOption()
      case m: java.util.Map[_, _] =>
        val node = m.asInstanceOf[java.util.Map[String, Any]].asScala
        val id = node.get("id").collect { case s: String => s }.getOrElse("")
        val children = node.get("children") match {
          case Some(l: java.util.List[_]) => l.asScala.toSeq
          case _ => Seq.empty
        }
        if (id.toLowerCase.startsWith("memory")) {
          node.get("size") match {
            case Some(n: Number) if n.longValue > 0 => Some(n.longValue / (1024L * 1024L))
            case _ =>
              val banks = children.collect {
                case c: java.util.Map[_, _] =>
                  val cm = c.asInstanceOf[java.util.Map[String, Any]].asScala
                  val cid = cm.get("id").collect { case s: String => s }.getOrElse("")
                  cm.get("size") match {
                    case Some(n: Number) if cid.toLowerCase.startsWith("bank") && n.longValue > 0 =>
                      n.longValue
                    case _ => 0L
                  }
              }.sum
              if (banks > 0) Some(banks / (1024L * 1024L))
              else children.iterator.flatMap(walk(_).iterator).nextOption()
          }
        } else children.iterator.flatMap(walk(_).iterator).nextOption()
      case _ => None
    }
    try walk(new com.fasterxml.jackson.databind.ObjectMapper()
      .readValue(json, classOf[Object]))
    catch { case _: Throwable => None }
  }

  def parseLshwMemory(raw: DataFrame): DataFrame =
    raw.select(keyCols :+ lshwMemoryUdf(col("content")).as("memory_amount_mib"): _*)
      .filter(col("memory_amount_mib").isNotNull)

  // ---------------------------------------------------------------- lsblk

  private val lsblkSchema = new StructType()
    .add("blockdevices", ArrayType(new StructType()
      .add("name", StringType).add("size", LongType).add("subsystems", StringType)))

  /** Vendors whose boot drive is an attached network drive — their nvme0 is
    * the boot disk and is skipped (`inspector.py:1086-1095`). */
  val bootFromNetworkDrive: Map[String, Boolean] = Map(
    "alicloud" -> true, "aws" -> true, "azure" -> true, "gcp" -> true,
    "hcloud" -> false, "ovh" -> false, "upcloud" -> true, "vultr" -> false)

  /** lsblk JSON → one row per instance-store disk: nvme devices past the
    * boot drive (NVME_SSD) plus Hetzner/OVH virtio-scsi `sda` (NETWORK)
    * (`inspector.py:1070-1129`). Size in GB (10^9). */
  def parseLsblkDisks(raw: DataFrame): DataFrame = {
    val bootNet = map(bootFromNetworkDrive.toSeq
      .flatMap { case (k, v) => Seq(lit(k), lit(v)) }: _*)
    val devices = raw
      .select(keyCols :+ explode(from_json(col("content"), lsblkSchema)
        .getField("blockdevices")).as("d"): _*)
      .withColumn("__bootnet", coalesce(element_at(bootNet, col("vendor_id")), lit(true)))
    val nvmeIdx = num(col("d.name"), "^nvme(\\d+)", "int")
    val nvme = devices
      .filter(nvmeIdx >= when(col("__bootnet"), 1).otherwise(0))
      .select(keyCols ++ Seq(
        floor(col("d.size") / 1000000000L).cast("long").as("size_gb"),
        lit("nvme_ssd").as("storage_type"),
        nvmeIdx.as("device_index")): _*)
    val virtio = devices
      .filter(!col("__bootnet") && col("d.name") === "sda" &&
        col("d.subsystems") === "block:scsi:virtio:pci")
      .select(keyCols ++ Seq(
        floor(col("d.size") / 1000000000L).cast("long").as("size_gb"),
        lit("network").as("storage_type"),
        lit(-1).as("device_index")): _*)
    nvme.unionByName(virtio)
  }

  /** Per-server storage rollup: total size and the type of the largest
    * disk (`inspector.py:1210-1216`). */
  def storageSummary(disks: DataFrame): DataFrame =
    disks.groupBy(keyCols: _*)
      .agg(sum(col("size_gb")).as("storage_size"),
        max_by(col("storage_type"), struct(col("size_gb"), col("device_index")))
          .as("storage_type"),
        count(lit(1)).as("n_disks"))

  // ------------------------------------------------------- combined view

  /** Combined hardware frame: lscpu fields with lstopo cache overrides
    * (lstopo wins where present — `_apply_lstopo_to_caches`) and memory
    * from lstopo → lshw precedence (`get_memory_amount_actual`,
    * `inspector.py:1344-1352`). */
  def hardware(lscpu: DataFrame, lstopo: DataFrame, lshw: DataFrame): DataFrame = {
    val keys = Seq("vendor_id", "server_id")
    val topo = parseLstopoCaches(lstopo)
    val byLevel = Seq("l1d" -> "L1d", "l1i" -> "L1i", "l2" -> "L2", "l3" -> "L3")
      .foldLeft(parseLscpu(lscpu)) { case (acc, (pfx, level)) =>
        val t = topo.filter(col("level") === level)
          .select(col("vendor_id"), col("server_id"),
            col("total_kib").as(s"__t_$pfx"),
            col("per_instance_kib").as(s"__p_$pfx"))
        acc.join(broadcast(t), keys, "left")
          .withColumn(s"${pfx}_total_kib",
            coalesce(col(s"__t_$pfx"), col(s"${pfx}_total_kib")))
          .withColumn(s"${pfx}_kib", coalesce(col(s"__p_$pfx"), col(s"${pfx}_kib")))
          .drop(s"__t_$pfx", s"__p_$pfx")
      }
    val mem = parseLstopoMemory(lstopo)
      .select(col("vendor_id"), col("server_id"), col("memory_amount_mib").as("__m_topo"))
    val memHw = parseLshwMemory(lshw)
      .select(col("vendor_id"), col("server_id"), col("memory_amount_mib").as("__m_lshw"))
    byLevel.join(broadcast(mem), keys, "left").join(broadcast(memHw), keys, "left")
      .withColumn("memory_amount_mib", coalesce(col("__m_topo"), col("__m_lshw")))
      .drop("__m_topo", "__m_lshw")
  }

  /** membench cache threshold per server: L3 total, else L2 total, else
    * L1d total (`inspector.py:652-655`) — replaces the hand-fed constant
    * in [[InspectorParsers.parseMembench]]. */
  def cacheTotalsKib(hw: DataFrame): DataFrame =
    hw.select(keyCols :+
      coalesce(col("l3_total_kib"), col("l2_total_kib"), col("l1d_total_kib"))
        .as("cache_total_kib"): _*)
}

/** One lstopo cache object: level label, cache_size bytes, descendant Core
  * count. Top-level and public on purpose: the UDF return type must be
  * codegen-visible — a private nested class (or an `Option` field) makes
  * Janino's generated accessor calls fail to compile, and Spark silently
  * drops the whole inspector-ingest stage to interpreted mode. */
case class LstopoCache(level: String, sizeBytes: Long, cores: Int)

/** Parsed lstopo XML: cache objects + RAM MemoryModule total (MiB, null
  * when no modules) — nullable boxed Long instead of `Option[Long]` so the
  * encoded struct stays plain nullable fields (see [[LstopoCache]]). */
case class LstopoInfo(caches: Seq[LstopoCache], memoryMib: java.lang.Long)
