package graft.ingest

import graft.SparkSpec

class InspectorParsersSpec extends SparkSpec {

  private def raw(content: String) = {
    val sp = spark; import sp.implicits._
    Seq(("aws", "m5.large", content)).toDF("vendor_id", "server_id", "content")
  }

  test("bw_mem lines parse to operation/size/bandwidth rows") {
    val out = InspectorParsers.parseBwMem(raw("rd 64.00 13087.10\nwr 64.00 9500.25\nnoise\n"))
      .collect().map(r => (r.getString(2), r.getDouble(4)))
    assert(out.toSet == Set("bw_mem:rd" -> 13087.10, "bw_mem:wr" -> 9500.25))
  }

  test("stressng emits per-cores rows plus best1/bestn summaries") {
    val out = InspectorParsers.parseStressNg(raw("cores,bogo_ops\n1,1000.5\n2,1900.0\n4,3500.0\n"))
      .collect().map(r => (r.getString(2), r.getDouble(4)))
    assert(out.count(_._1 == "stressng:cpu") == 3)
    assert(out.contains("stressng:best1" -> 1000.5))
    assert(out.contains("stressng:bestn" -> 3500.0))
  }

  test("passmark Results keys become snake benchmark ids") {
    val yaml = "Version:\n  Major: 11\nResults:\n  SUMM_CPU: 4521.1\n  CPU_INTEGER_MATH: 88123.0\n"
    val out = InspectorParsers.parsePassmark(raw(yaml))
      .collect().map(r => (r.getString(2), r.getDouble(4))).toMap
    assert(out == Map("passmark:summ_cpu" -> 4521.1, "passmark:cpu_integer_math" -> 88123.0))
  }

  test("geekbench nested json flattens with single/multi config") {
    val json =
      """{"Single-Core Performance": {"File Compression": {"score": 1801.0, "description": "281.5 MB/sec"}},
        |"Multi-Core Performance": {"File Compression": {"score": 5204.0, "description": "812 MB/sec"}}}""".stripMargin
    val out = InspectorParsers.parseGeekbench(raw(json))
      .collect().map(r => (r.getString(2), r.getMap[String, String](3).get("cores").get, r.getDouble(4)))
    assert(out.toSet == Set(
      ("geekbench:file_compression", "single", 1801.0),
      ("geekbench:file_compression", "multi", 5204.0)))
  }

  test("membench synthesizes RAM-scope row at first size beyond cache") {
    val csv = "operation,size_kb,bandwidth_mb_s\nread,512,50000.0\nread,2048,30000.0\nread,8192,12000.0\n"
    val out = InspectorParsers.parseMembench(raw(csv), cacheTotalKb = 1024)
      .collect().map(r => (r.getMap[String, String](3).toMap, r.getDouble(4)))
    // 3 measured + 1 RAM-scope (first size > 1024 is 2048)
    assert(out.length == 4)
    assert(out.contains(Map("operation" -> "read", "scope" -> "RAM") -> 30000.0))
  }

  test("compression matrix flattens to keep-best per algo/level/measurement") {
    val json =
      """{"gzip": {"1": [{"ratio": 2.5, "compression_speed": 100.0, "decompression_speed": 400.0},
        |               {"ratio": 2.5, "compression_speed": 110.0, "decompression_speed": 390.0}],
        |          "9": [{"ratio": 3.1, "compression_speed": 20.0, "decompression_speed": 410.0}]}}""".stripMargin
    val out = InspectorParsers.parseCompression(raw(json))
      .collect().map(r => (r.getString(2),
        r.getMap[String, String](3).get("level").get, r.getDouble(4)))
    assert(out.length == 6) // 2 levels x 3 measurements
    assert(out.contains(("compression:gzip:compress", "1", 110.0))) // best of 2 runs
    assert(out.contains(("compression:gzip:ratio", "9", 3.1)))
  }

  test("nvidia-smi XML parses per-GPU rows") {
    val xml =
      """<nvidia_smi_log><gpu id="0">
        |  <product_name>NVIDIA A10G</product_name>
        |  <fb_memory_usage_total>23028 MiB</fb_memory_usage_total>
        |  <graphics_clock>1710 MHz</graphics_clock>
        |</gpu><gpu id="1">
        |  <product_name>NVIDIA A10G</product_name>
        |  <fb_memory_usage_total>23028 MiB</fb_memory_usage_total>
        |  <graphics_clock>1710 MHz</graphics_clock>
        |</gpu></nvidia_smi_log>""".stripMargin
    val out = InspectorParsers.parseNvidiaSmi(raw(xml)).collect()
    assert(out.length == 2)
    assert(out.head.getAs[String]("gpu_model") == "NVIDIA A10G")
    assert(out.head.getAs[Long]("memory_mib") == 23028L)
    assert(out.head.getAs[Int]("graphics_clock_mhz") == 1710)
    // malformed xml degrades to zero rows, not an exception
    assert(InspectorParsers.parseNvidiaSmi(raw("<broken")).count() == 0)
  }

  test("llm_speed JSONL classifies prompt vs generation") {
    val jsonl =
      """{"model_filename": "llama7b.gguf", "n_prompt": 512, "n_gen": 0, "avg_ts": 123.4}
        |{"model_filename": "llama7b.gguf", "n_prompt": 0, "n_gen": 128, "avg_ts": 17.9}""".stripMargin
    val out = InspectorParsers.parseLlmSpeed(raw(jsonl))
      .collect().map(r => (r.getString(2), r.getMap[String, String](3).get("tokens").get, r.getDouble(4)))
    assert(out.toSet == Set(
      ("llm_speed:prompt_processing", "512", 123.4),
      ("llm_speed:text_generation", "128", 17.9)))
  }

  test("rps parser keeps best per (size, connections) and derives extrapolated/throughput") {
    val csv = "size,connections,rps,server_usrsys,client_usrsys\n" +
      "100,8,5000.0,0.5,0.25\n100,8,4800.0,0.5,0.25\n200,16,3000.0,0.6,0.3\n"
    val out = InspectorParsers.parseRps(raw(csv), "static_web")
      .collect().map(r => (r.getString(2), r.getMap[String, String](3).get("size").get, r.getDouble(4)))
    assert(out.count(_._1 == "static_web:rps") == 2)
    assert(out.contains(("static_web:rps", "100", 5000.0))) // best of 5000/4800
    assert(out.contains(("static_web:rps_extrapolated", "100", 5000.0 / 0.5 * 0.75)))
    assert(out.contains(("static_web:throughput", "200", 3000.0 * 200)))
  }
}
