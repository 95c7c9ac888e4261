package graft.operators

import graft.SparkSpec
import graft.operators.MultimodalOps._

/** Binary media column plumbing: schema, per-partition batch decode, feature
  * frame output.
  */
class MultimodalOpsSpec extends SparkSpec {

  test("asMediaTable + decodeFeatures: per-partition decode yields typed features") {
    val docs = RelationalQueries.table(spark, sfDir, "documents")
    val media = asMediaTable(docs, "doc_id", "text")
    assert(media.schema.fieldNames.toSeq == Seq("doc_id", "media", "media_type"))
    assert(media.schema("media").dataType.typeName == "binary")

    val feats = decodeFeatures(media.repartition(4), FakeDecoder)
    val rows = feats.collect()
    assert(rows.length == docs.count())
    // deterministic fake: n_bytes equals payload length; dims in declared range
    val byId = rows.map(f => f.doc_id -> f).toMap
    val sample = docs.select("doc_id", "text").collect().take(20)
    sample.foreach { r =>
      val f = byId(r.getLong(0))
      assert(f.n_bytes == r.getString(1).getBytes("UTF-8").length)
      assert(f.width >= 16 && f.width <= 16 + 63 * 16)
      assert(f.channels >= 1 && f.channels <= 3)
    }
    // decode twice => identical features (pure, deterministic)
    val again = decodeFeatures(media.repartition(2), FakeDecoder).collect()
      .map(f => f.doc_id -> f).toMap
    assert(byId == again)
  }
}
