"""Repo-local scratch layout shared by every operator that writes files.

One derivation of ``<repo>/.scratch`` (instead of per-module ``dirname``
chains) and one per-``sf_dir`` tag that cannot collide: the tag includes a
short hash of the absolute fixture path, so two fixture directories that
happen to share a basename (e.g. ``/data/a/sf0.01`` and ``/data/b/sf0.01``)
never read or overwrite each other's scratch outputs within a session.
"""

from __future__ import annotations

import hashlib
import os

REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRATCH = os.path.join(REPO_ROOT, ".scratch")


def scratch(*parts: str) -> str:
    """Path under the repo's ``.scratch`` directory."""
    return os.path.join(SCRATCH, *parts)


def sf_tag(sf_dir: str) -> str:
    """Collision-free tag for a fixture dir: basename + abs-path hash."""
    p = os.path.abspath(sf_dir.rstrip("/") or "/")
    base = os.path.basename(p).replace(".", "_")
    return f"{base}_{hashlib.md5(p.encode()).hexdigest()[:8]}"
