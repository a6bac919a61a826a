package graft.io

import org.apache.hadoop.fs.Path

/** Atomic create-if-absent of a small whole object — the commit
  * primitive object stores CAN give that they cannot give through
  * `rename` (S3-class rename is COPY+DELETE with a HEAD-probe TOCTOU;
  * a directory rename even copies `_SUCCESS` first in listing order,
  * so a reader gating on the marker can observe a HALF-COPIED
  * artifact — which is why [[graft.queries.Materialized]] refuses the
  * staging+rename protocol on non-atomic-rename schemes and commits
  * through a pointer object created with THIS primitive instead).
  *
  * Real S3 exposes it as conditional writes (`PUT` +
  * `If-None-Match: *`, 412 on an existing key — public AWS S3 API,
  * 2024); GCS as `x-goog-if-generation-match: 0`; Azure Blob as
  * `If-None-Match: *`. A Hadoop FileSystem that can honor the
  * semantics advertises it by mixing in this trait —
  * [[graft.io.s3.S3RestFileSystem]] does.
  */
trait AtomicCreate {
  /** Atomically create `path` holding exactly `body` iff no object
    * exists there. Returns true iff THIS call created the object (the
    * caller won the race); false iff an object already existed. The
    * created object is complete-on-visibility: no reader ever sees a
    * partial body. */
  def createIfAbsent(path: Path, body: Array[Byte]): Boolean
}
