"""Multi-host driver logic (SURVEY.md 2.2/5.8, section 4 item 4).

The record-strided shard math and the stats psum run single-process on the
virtual CPU mesh; the full two-process jax.distributed path runs as a
subprocess smoke test (real DCN control plane on localhost).
"""
import json
import os
import signal
import socket
import subprocess
import sys
import time

import numpy as np
import pytest

from bitmapperbs_tpu.io.stats import MapStats
from bitmapperbs_tpu.parallel import multihost

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_host_shard_partition():
    H = 3
    shards = [multihost.HostShard(h, H) for h in range(H)]
    n = 100
    codes = [np.zeros(2, np.uint8) + i for i in range(n)]
    qnames = [f"r{i}" for i in range(n)]
    quals = [""] * n
    seen = []
    # batches of 7 with a global start_record, as the CLI produces
    for lo in range(0, n, 7):
        hi = min(lo + 7, n)
        for sh in shards:
            c, q, _ = sh.filter_batch(codes[lo:hi], qnames[lo:hi],
                                      quals[lo:hi], lo)
            seen.extend(q)
    assert sorted(seen, key=lambda s: int(s[1:])) == qnames  # exact cover


def test_shard_path():
    assert multihost.shard_path("out.sam", 0, 1) == "out.sam"
    assert multihost.shard_path("out.sam", 2, 4) == "out.shard2.sam"
    assert multihost.shard_path("o", 1, 2) == "o.shard1.sam"


def test_global_stats_single_process():
    st = MapStats(total=10, mapped=8, unique=7, ambiguous=1, unmapped=2)
    g = multihost.global_stats(st)
    assert g["total"] == 10 and g["mapped"] == 8 and g["unmapped"] == 2


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _cli_subprocess(args, extra_env=None):
    """Run the CLI in a CPU-forced subprocess (the axon plugin ignores
    JAX_PLATFORMS, so force via jax.config before importing the CLI)."""
    code = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from bitmapperbs_tpu.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    if extra_env:
        env.update(extra_env)
    return subprocess.Popen([sys.executable, "-c", code] + args, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)


@pytest.fixture(scope="module")
def tiny_dataset(tmp_path_factory):
    from bitmapperbs_tpu.index.build import build_index, save_index
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_reads)
    from bitmapperbs_tpu.io.fastq import write_fastq

    d = tmp_path_factory.mktemp("mh")
    rng = np.random.default_rng(4)
    fasta_text = random_genome_fasta(rng, contigs=(3000,))
    ref = d / "ref.fa"
    ref.write_text(fasta_text)
    idx = build_index(str(ref))
    save_index(idx, str(ref) + ".btidx")
    sims = simulate_reads(idx.genome, 36, read_len=64, seed=5, sub_rate=0.01)
    fq = d / "reads.fq"
    write_fastq(str(fq), [s.codes for s in sims],
                [f"r{i}" for i in range(len(sims))],
                ["I" * 64 for _ in sims])
    return d, ref, fq


def _sam_records(path):
    return sorted(l for l in open(path).read().splitlines()
                  if l and not l.startswith("@"))


def test_two_process_distributed_smoke(tiny_dataset):
    """Two real processes over jax.distributed (localhost coordinator):
    shard outputs concatenate to exactly the single-host record set."""
    d, ref, fq = tiny_dataset
    single = d / "single.sam"
    p = _cli_subprocess(["search", str(ref), "--seq", str(fq), "-o",
                         str(single), "--oracle", "--batch-size", "8",
                         "--read-bucket", "64"])
    out, err = p.communicate(timeout=300)
    assert p.returncode == 0, err.decode()

    port = _free_port()
    procs = []
    for h in range(2):
        procs.append(_cli_subprocess(
            ["search", str(ref), "--seq", str(fq), "-o", str(d / "mh.sam"),
             "--oracle", "--batch-size", "8", "--read-bucket", "64",
             "--dist-hosts", "2", "--dist-host-id", str(h),
             "--dist-coordinator", f"127.0.0.1:{port}"]))
    for p in procs:
        out, err = p.communicate(timeout=300)
        assert p.returncode == 0, err.decode()

    merged = (_sam_records(d / "mh.shard0.sam")
              + _sam_records(d / "mh.shard1.sam"))
    assert sorted(merged) == _sam_records(single)
