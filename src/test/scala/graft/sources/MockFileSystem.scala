package graft.sources

import java.net.URI
import org.apache.hadoop.fs.RawLocalFileSystem

/** Test-scope Hadoop FileSystem registered under the `mockfs:` scheme,
  * delegating to RawLocalFileSystem. Every table/commit path in the engine
  * claims to go through the Hadoop FileSystem of its path (so it works on
  * hdfs:/s3a:/gs:-style URIs, not just file:) — this class makes that claim
  * testable without a cluster: running the ingest roundtrip, the snapshot
  * log, and the bucket-table mutations against `mockfs:` paths proves no
  * java.io.File (or implicit default-FS) leak exists in those paths, since
  * any such leak would miss the scheme and fail loudly.
  *
  * Registration is per-spec: `fs.mockfs.impl` on the session's Hadoop conf.
  */
class MockFileSystem extends RawLocalFileSystem {
  override def getScheme: String = "mockfs"
  override def getUri: URI = URI.create("mockfs:///")
}
