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
