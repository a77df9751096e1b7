"""Per-user on-disk cache root for engine-derived artifacts (IVF
indexes, derived source-format copies).

Resolution order:
  1. ``$SPARK_GRAFT_CACHE_ROOT`` — on a cluster point this INTO THE
     WAREHOUSE (shared filesystem) so every node sees the same
     artifacts. NOTE: this module manipulates paths with ``os.path``,
     so the override must be a mounted filesystem path; object-store
     URIs (s3a:// etc.) need the artifact writers to go through Spark
     instead — which is why every cache consumer also takes an explicit
     path parameter.
  2. Default: ``$XDG_CACHE_HOME`` or ``~/.cache``, created mode 0700 —
     never the world-writable shared temp dir, where another local user
     could pre-create a poisoned artifact at a predictable path.
"""

from __future__ import annotations

import os


def cache_root(subdir: str) -> str:
    root = os.environ.get("SPARK_GRAFT_CACHE_ROOT")
    if not root:
        cache_home = os.environ.get("XDG_CACHE_HOME") or os.path.join(
            os.path.expanduser("~"), ".cache"
        )
        root = os.path.join(cache_home, "target_iceberg_spark")
    path = os.path.join(root, subdir)
    os.makedirs(path, mode=0o700, exist_ok=True)
    return path
