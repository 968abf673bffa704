"""At-scale artifact cache locations (VERDICT r3 #2: durable artifacts).

The driver VM wipes /tmp between sessions, which cost round 3 a 4-5 h
3 Gbp index rebuild.  Artifacts now live in a persistent, gitignored
directory inside the repo (the one path the build is allowed to write);
/tmp remains a recognized legacy location so in-flight builds stay usable.

Layout: <dir>/<name>.bin + <name>.json (index artifacts, index/build.py),
plus derived caches (gplanes_<sha>.v1.bin, index/device.py) and block
checkpoints (scripts/build_big.py).
"""
from __future__ import annotations

import os

_REPO_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), "artifacts")


def artifacts_dir() -> str:
    """Persistent directory for writing at-scale artifacts."""
    d = os.environ.get("BTBS_ARTIFACTS", _REPO_DIR)
    os.makedirs(d, exist_ok=True)
    return d


def find_artifact(name: str) -> str | None:
    """Locate `<name>.json` in the persistent dir, then legacy /tmp.
    Returns the artifact prefix (no extension) or None."""
    for d in (os.environ.get("BTBS_ARTIFACTS", _REPO_DIR), "/tmp"):
        prefix = os.path.join(d, name)
        if os.path.exists(prefix + ".json"):
            return prefix
    return None
