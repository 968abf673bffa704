"""scripts/upgrade_klt.py regression: post-hoc KLT upgrade of a saved
artifact must be byte-identical to building at the target depth directly
(the script migrated the round-5 3 Gbp caches to klt 16; this pins the
invariant at test scale)."""
import importlib.util
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _load_script():
    spec = importlib.util.spec_from_file_location(
        "upgrade_klt", os.path.join(REPO, "scripts", "upgrade_klt.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_upgrade_matches_direct_build(tmp_path):
    from bitmapperbs_tpu.index.build import build_index, save_index
    from bitmapperbs_tpu.utils.simulate import random_genome_fasta

    rng = np.random.default_rng(17)
    fasta = random_genome_fasta(rng, contigs=(4000, 3000))

    low = build_index(fasta, sa_rate=4, klt_k=4)
    save_index(low, str(tmp_path / "upgraded"))

    direct = build_index(fasta, sa_rate=4, klt_k=6)
    save_index(direct, str(tmp_path / "direct"))

    mod = _load_script()
    argv = sys.argv
    sys.argv = ["upgrade_klt.py", str(tmp_path / "upgraded"), "6"]
    try:
        mod.main()
    finally:
        sys.argv = argv

    a = (tmp_path / "upgraded.bin").read_bytes()
    b = (tmp_path / "direct.bin").read_bytes()
    assert a == b, "upgraded artifact differs from direct klt build"
    import json
    ja = json.loads((tmp_path / "upgraded.json").read_text())
    jb = json.loads((tmp_path / "direct.json").read_text())
    assert ja == jb
