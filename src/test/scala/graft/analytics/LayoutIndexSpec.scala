package graft.analytics

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.spark.sql.functions._

import graft.SparkSpecBase
import graft.core.Tables

/** Footer-level audit of [[Layout.writeIndexedLayout]]: the write-side
  * data-skipping contract is verifiable in the parquet metadata itself —
  * bloom filters exactly where requested, row-group key ranges pairwise
  * disjoint (so column-index pruning hits one group per point), and the
  * point-range read pushes its filters into the scan. */
class LayoutIndexSpec extends SparkSpecBase {

  private def partFiles(dir: String): Seq[java.io.File] =
    new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .sortBy(_.getName).toSeq

  test("footers carry blooms where asked and disjoint sorted row groups") {
    val out = tmpDir("idx-layout-")
    Layout.writeIndexedLayout(Tables.documents(spark, sf), "doc_id",
      Seq("doc_id", "text"), files = 4, maxRecordsPerFile = 100L, out)

    val files = partFiles(out)
    // 500 docs, 4 range partitions, 100 records/file cap -> >= 5 files
    assert(files.size >= 5, s"expected file splits, got ${files.size}")

    var allRanges = Vector.empty[(Long, Long)]
    for (f <- files) {
      val reader = ParquetFileReader.open(
        HadoopInputFile.fromPath(new Path(f.getAbsolutePath), new Configuration()))
      try {
        for (block <- reader.getFooter.getBlocks.asScala) {
          val cols = block.getColumns.asScala
          def chunk(name: String) =
            cols.find(_.getPath.toDotString == name).get
          val bfReader = reader.getBloomFilterDataReader(block)
          // requested columns carry a bloom filter...
          assert(bfReader.readBloomFilter(chunk("doc_id")) != null,
            s"doc_id bloom missing in ${f.getName}")
          assert(bfReader.readBloomFilter(chunk("text")) != null,
            s"text bloom missing in ${f.getName}")
          // ...unrequested ones do not pay for one
          assert(bfReader.readBloomFilter(chunk("lang")) == null,
            s"unexpected lang bloom in ${f.getName}")
          val stats = chunk("doc_id").getStatistics
          allRanges :+= (stats.genericGetMin.asInstanceOf[Long],
            stats.genericGetMax.asInstanceOf[Long])
        }
      } finally reader.close()
    }
    // sorted + range-partitioned => row-group key ranges never overlap,
    // so a point predicate can match at most ONE row group table-wide
    val sorted = allRanges.sortBy(_._1)
    sorted.sliding(2).foreach {
      case Vector((_, aMax), (bMin, _)) =>
        assert(aMax < bMin, s"overlapping row groups: $sorted")
      case _ => ()
    }
    // ranges tile the full key domain
    assert(sorted.head._1 === 0L && sorted.last._2 === 499L)
  }

  test("point-range lookup pushes filters and returns the exact rows") {
    val df = Layout.indexedLayoutLookup(spark, sf)
    val rows = df.collect()
    val expected = Tables.documents(spark, sf)
      .filter(col("doc_id") >= 100 && col("doc_id") < 140)
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id").asc).collect()
    assert(rows.toSeq === expected.toSeq)
    val scanDesc = df.queryExecution.executedPlan.toString
    assert(scanDesc.contains("PushedFilters") &&
      scanDesc.contains("GreaterThanOrEqual(doc_id,100)"),
      s"filters not pushed:\n$scanDesc")
  }
}
