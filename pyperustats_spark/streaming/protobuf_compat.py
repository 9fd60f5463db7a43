"""google.protobuf discovery for transformWithStateInPandas (TWS).

TWS's Python worker speaks to the JVM state server through generated
``pyspark.sql.streaming.proto.StateMessage_pb2`` classes, which need a
FUNCTIONAL pure-Python protobuf runtime. This container ships no
``google.protobuf`` on sys.path and installs are unavailable — but a
complete, importable pure-Python protobuf (6.32.0-dev) is already on
disk inside the Google Cloud SDK's bundled App Engine runtime
(``platform/google_appengine/google/protobuf``; BSD-licensed protobuf
source, plain ``google.protobuf`` import paths — unlike the SDK's
other copy under ``third_party/cloudsdk``, whose imports are
rewritten and cannot be aliased in).

:func:`enable_protobuf` makes TWS runnable when any such copy exists:

* prepends the vendor root to THIS interpreter's ``sys.path`` (the
  driver imports ``StateMessage_pb2`` when the stateful-processor
  module loads) and to ``$PYTHONPATH`` (Python workers are forked by
  the JVM, which inherits the driver's environment — so this must run
  BEFORE the first SparkSession starts its JVM);
* sets ``TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK=true`` — the
  runtime's own documented escape hatch (protobuf
  runtime_version.py) — because pyspark 4.1's gencode is 6.33.0 and
  the bundled runtime 6.32.0-dev trips the strict
  "runtime >= gencode" check by one minor version; the wire format
  is unchanged between them and the full state round trip is
  exercised green in tests/test_streaming.py;
* verifies the import actually works (descriptor pool + a generated
  module) before claiming success.

TWS additionally requires the RocksDB state store provider (value/
list/map state are column families, which the default HDFS-backed
provider rejects with STATE_STORE_MULTIPLE_COLUMN_FAMILIES);
:data:`ROCKSDB_PROVIDER` is the session conf value to set per query.
"""

from __future__ import annotations

import os
import sys

ROCKSDB_PROVIDER = ("org.apache.spark.sql.execution.streaming.state."
                    "RocksDBStateStoreProvider")

# Known on-disk pure-Python protobuf copies with unrewritten
# `google.protobuf` import paths, cheapest first.
_VENDOR_ROOTS = (
    "/usr/lib/google-cloud-sdk/platform/google_appengine",
)


def _probe() -> str | None:
    """None when `google.protobuf` imports and functions, else the
    failure signature."""
    try:
        from google.protobuf import descriptor  # noqa: F401
        from google.protobuf import descriptor_pool  # noqa: F401
        return None
    except Exception as e:
        return f"{type(e).__name__}: {e}"


def enable_protobuf() -> str | None:
    """Make ``google.protobuf`` importable for the driver AND future
    Python workers. Returns ``"system"`` when it already imports,
    ``"vendored:<root>"`` after wiring a vendor copy in, or ``None``
    when no working runtime exists (callers should skip TWS with the
    probe signature). Idempotent; must run before the first
    SparkSession launches its JVM for workers to inherit the
    environment."""
    if _probe() is None:
        # version-check opt-out still needed when the system runtime
        # is older than pyspark's gencode; harmless otherwise
        os.environ.setdefault(
            "TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK", "true")
        return "system"
    for root in _VENDOR_ROOTS:
        if not os.path.isdir(os.path.join(root, "google", "protobuf")):
            continue
        if root not in sys.path:
            sys.path.insert(0, root)
        os.environ["TEMPORARILY_DISABLE_PROTOBUF_VERSION_CHECK"] = "true"
        prev = os.environ.get("PYTHONPATH", "")
        if root not in prev.split(os.pathsep):
            os.environ["PYTHONPATH"] = (
                root + (os.pathsep + prev if prev else ""))
        if _probe() is None:
            return f"vendored:{root}"
        # broken copy: undo the sys.path edit, keep looking
        sys.path.remove(root)
    return None
