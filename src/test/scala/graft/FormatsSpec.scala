package graft

import java.nio.file.Files
import graft.sources.Formats

class FormatsSpec extends SparkSpec {

  test("csv / jsonl / orc round-trip the nation table losslessly") {
    val nation = Tables(spark, "/root/testdata/sf0.001", "nation")
    val base = Files.createTempDirectory("graft_formats").toString

    Formats.writeCsv(nation, s"$base/csv")
    val csv = Formats.readCsv(spark, s"$base/csv", nation.schema)
    assert(csv.exceptAll(nation).isEmpty && nation.exceptAll(csv).isEmpty)

    Formats.writeJsonl(nation, s"$base/json")
    val json = Formats.readJsonl(spark, s"$base/json", nation.schema)
    assert(json.exceptAll(nation).isEmpty && nation.exceptAll(json).isEmpty)

    Formats.writeOrc(nation, s"$base/orc")
    val orc = Formats.readOrc(spark, s"$base/orc")
    assert(orc.exceptAll(nation).isEmpty && nation.exceptAll(orc).isEmpty)
  }
}
