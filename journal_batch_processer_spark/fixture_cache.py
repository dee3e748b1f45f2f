"""Source-fingerprinted fixture caches.

Several queries materialize derived fixtures (CSV exports, JSONL
round-trip dirs, binary-blob dirs) in the system tmpdir and reuse them
across runs. Round 3 proved the hazard of gating those caches on bare
existence (`_SUCCESS` / `.done`): the driver regenerated
``/root/testdata`` and every existence-gated cache silently kept
serving the OLD data. The fix is to stamp each cache with a
fingerprint of its source file(s) — size + mtime_ns, the same
freshness contract `make` uses — and rebuild whenever the stamp
disagrees.
"""

from __future__ import annotations

import hashlib
import os

_STAMP = ".jbp_src_fingerprint"


def source_fingerprint(*paths: str) -> str:
    """Digest of (basename, size, mtime_ns) for each source path.

    Missing sources contribute a distinct token so a cache built from
    partial inputs never matches one built from full inputs.
    """
    parts = []
    for p in paths:
        try:
            st = os.stat(p)
            parts.append(f"{os.path.basename(p)}:{st.st_size}:{st.st_mtime_ns}")
        except OSError:
            parts.append(f"{os.path.basename(p)}:missing")
    return hashlib.md5(";".join(parts).encode()).hexdigest()[:16]


def is_fresh(cache_dir: str, fingerprint: str) -> bool:
    """True iff ``cache_dir`` carries a stamp matching ``fingerprint``."""
    try:
        with open(os.path.join(cache_dir, _STAMP)) as f:
            return f.read().strip() == fingerprint
    except OSError:
        return False


def mark_fresh(cache_dir: str, fingerprint: str) -> None:
    """Stamp ``cache_dir`` as built from sources with ``fingerprint``.

    Call AFTER the cache contents are fully written — a crash between
    write and stamp leaves the cache unstamped, i.e. rebuilt next time.
    """
    with open(os.path.join(cache_dir, _STAMP), "w") as f:
        f.write(fingerprint)
