"""Fault injection (SURVEY.md 5.3): SIGKILL a run mid-stream, resume from
the cursor checkpoint, and require the final SAM to equal an uninterrupted
run's.  The kill is by exact child PID."""
import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cli_subprocess(args):
    code = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
            "from bitmapperbs_tpu.cli import main; "
            "sys.exit(main(sys.argv[1:]))")
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    return subprocess.Popen([sys.executable, "-c", code] + args, env=env,
                            stdout=subprocess.PIPE, stderr=subprocess.PIPE)


def test_sigkill_and_resume(tmp_path):
    from bitmapperbs_tpu.index.build import build_index, save_index
    from bitmapperbs_tpu.io.fastq import write_fastq
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_reads)

    rng = np.random.default_rng(8)
    ref = tmp_path / "ref.fa"
    ref.write_text(random_genome_fasta(rng, contigs=(3000,)))
    idx = build_index(str(ref))
    save_index(idx, str(ref) + ".btidx")
    sims = simulate_reads(idx.genome, 60, read_len=64, seed=6, sub_rate=0.01)
    fq = tmp_path / "reads.fq"
    write_fastq(str(fq), [s.codes for s in sims],
                [f"r{i}" for i in range(len(sims))], ["I" * 64 for _ in sims])

    base = ["search", str(ref), "--seq", str(fq), "--oracle",
            "--batch-size", "6", "--read-bucket", "64"]

    # ground truth: uninterrupted run
    ok = tmp_path / "full.sam"
    p = _cli_subprocess(base + ["-o", str(ok)])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()

    # interrupted run: SIGKILL (host crash) once the cursor has advanced
    out = tmp_path / "crash.sam"
    cursor = str(out) + ".cursor"
    p = _cli_subprocess(base + ["-o", str(out)])
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(cursor):
            break
        if p.poll() is not None:
            pytest.fail("run finished before it could be killed; "
                        "shrink batch size")
        time.sleep(0.05)
    os.kill(p.pid, signal.SIGKILL)          # exact child PID only
    p.wait(timeout=60)
    assert os.path.exists(cursor), "cursor checkpoint missing after crash"
    n_before = sum(1 for l in open(out) if not l.startswith("@"))
    assert n_before < 60, "crashed run unexpectedly complete"

    # resume must complete the remaining reads without duplicating any
    p = _cli_subprocess(base + ["-o", str(out), "--resume"])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()
    assert not os.path.exists(cursor)       # completed: cursor dropped

    want = [l for l in open(ok).read().splitlines() if not l.startswith("@")]
    got = [l for l in open(out).read().splitlines() if not l.startswith("@")]
    assert got == want


def test_resume_truncates_unacknowledged_output(tmp_path):
    """A crash BETWEEN the output flush and the cursor write leaves records
    past the cursor; resume must truncate them instead of duplicating."""
    import json

    from bitmapperbs_tpu.index.build import build_index, save_index
    from bitmapperbs_tpu.io.fastq import write_fastq
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_reads)

    rng = np.random.default_rng(9)
    ref = tmp_path / "ref.fa"
    ref.write_text(random_genome_fasta(rng, contigs=(2500,)))
    idx = build_index(str(ref))
    save_index(idx, str(ref) + ".btidx")
    sims = simulate_reads(idx.genome, 24, read_len=64, seed=7, sub_rate=0.01)
    fq = tmp_path / "reads.fq"
    write_fastq(str(fq), [s.codes for s in sims],
                [f"r{i}" for i in range(len(sims))], ["I" * 64 for _ in sims])
    base = ["search", str(ref), "--seq", str(fq), "--oracle",
            "--batch-size", "8", "--read-bucket", "64"]

    ok = tmp_path / "full.sam"
    p = _cli_subprocess(base + ["-o", str(ok)])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()

    # simulate the torn state: output holds batches 1-2, cursor only acks 1
    out = tmp_path / "torn.sam"
    lines = open(ok).read().splitlines(keepends=True)
    hdr = [l for l in lines if l.startswith("@")]
    recs = [l for l in lines if not l.startswith("@")]
    with open(out, "w") as f:
        f.writelines(hdr + recs[:16])       # two batches written...
        f.flush()
    acked = sum(len(l) for l in hdr + recs[:8])
    # byte offset of record 8 in the FASTQ (4 lines per record)
    fq_lines = open(fq, "rb").read().splitlines(keepends=True)
    off = sum(len(l) for l in fq_lines[:8 * 4])
    json.dump({"record": 8, "offset": off, "out_pos": acked},
              open(str(out) + ".cursor", "w"))

    p = _cli_subprocess(base + ["-o", str(out), "--resume"])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()
    got = [l for l in open(out).read().splitlines() if not l.startswith("@")]
    want = [l.rstrip("\n") for l in recs]
    assert got == want


def test_bam_sigkill_and_resume(tmp_path):
    """BAM resume: save_cursor flushes the BGZF writer, so out_pos is a
    block+record boundary; truncate-and-append yields a BAM whose decoded
    records equal an uninterrupted run's (block framing may differ)."""
    from tests.test_bam import decode_bam

    from bitmapperbs_tpu.index.build import build_index, save_index
    from bitmapperbs_tpu.io.fastq import write_fastq
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_reads)

    rng = np.random.default_rng(21)
    ref = tmp_path / "ref.fa"
    ref.write_text(random_genome_fasta(rng, contigs=(3000,)))
    idx = build_index(str(ref))
    save_index(idx, str(ref) + ".btidx")
    sims = simulate_reads(idx.genome, 40, read_len=64, seed=22,
                          sub_rate=0.01)
    fq = tmp_path / "reads.fq"
    write_fastq(str(fq), [s.codes for s in sims],
                [f"r{i}" for i in range(len(sims))], ["I" * 64 for _ in sims])
    base = ["search", str(ref), "--seq", str(fq), "--oracle",
            "--batch-size", "5", "--read-bucket", "64"]

    ok = tmp_path / "full.bam"
    p = _cli_subprocess(base + ["-o", str(ok)])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()

    out = tmp_path / "crash.bam"
    cursor = str(out) + ".cursor"
    p = _cli_subprocess(base + ["-o", str(out)])
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(cursor):
            break
        if p.poll() is not None:
            pytest.fail("run finished before it could be killed")
        time.sleep(0.05)
    os.kill(p.pid, signal.SIGKILL)          # exact child PID only
    p.wait(timeout=60)

    p = _cli_subprocess(base + ["-o", str(out), "--resume"])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()
    assert not os.path.exists(cursor)

    text_w, refs_w, want = decode_bam(open(ok, "rb").read())
    text_g, refs_g, got = decode_bam(open(out, "rb").read())
    assert refs_g == refs_w
    assert got == want


def test_pe_sharded_sigkill_and_resume(tmp_path):
    """PE + --dist-hosts: the resume cursor must advance by the FULL batch
    (not the shard-filtered count) so record/byte offsets stay aligned and
    shard ownership is stable across a resume.  jax.distributed is stubbed
    so both 'hosts' run sequentially without a coordinator."""
    from bitmapperbs_tpu.index.build import build_index, save_index
    from bitmapperbs_tpu.io.fastq import write_fastq
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_pairs)

    rng = np.random.default_rng(31)
    ref = tmp_path / "ref.fa"
    ref.write_text(random_genome_fasta(rng, contigs=(3000,)))
    idx = build_index(str(ref))
    save_index(idx, str(ref) + ".btidx")
    prs = simulate_pairs(idx.genome, 26, read_len=60, seed=32, sub_rate=0.01,
                         min_insert=120, max_insert=300)
    for mate in (0, 1):
        write_fastq(str(tmp_path / f"r{mate+1}.fq"),
                    [p[mate].codes for p in prs],
                    [f"p{i}" for i in range(len(prs))],
                    ["I" * 60 for _ in prs])
    base = ["search", str(ref), "--seq1", str(tmp_path / "r1.fq"),
            "--seq2", str(tmp_path / "r2.fq"), "--pe", "--min", "100",
            "--max", "350", "--oracle", "--batch-size", "4",
            "--read-bucket", "64"]

    def _stub_subprocess(args):
        code = ("import jax, sys; jax.config.update('jax_platforms', 'cpu'); "
                "from bitmapperbs_tpu.parallel import multihost; "
                "multihost.init_distributed = lambda c, n, p: (p or 0, n); "
                "from bitmapperbs_tpu.cli import main; "
                "sys.exit(main(sys.argv[1:]))")
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
        return subprocess.Popen([sys.executable, "-c", code] + args, env=env,
                                stdout=subprocess.PIPE,
                                stderr=subprocess.PIPE)

    ok = tmp_path / "full.sam"
    p = _cli_subprocess(base + ["-o", str(ok)])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()

    out = str(tmp_path / "mh.sam")
    shard_args = ["--dist-hosts", "2"]
    # host 0: SIGKILL once its cursor exists, then resume to completion
    cursor = str(tmp_path / "mh.shard0.sam") + ".cursor"
    p = _stub_subprocess(base + ["-o", out, "--dist-host-id", "0"]
                         + shard_args)
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(cursor) or p.poll() is not None:
            break
        time.sleep(0.05)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=60)
    if os.path.exists(cursor):
        p = _stub_subprocess(base + ["-o", out, "--dist-host-id", "0",
                                     "--resume"] + shard_args)
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()
    # host 1: uninterrupted
    p = _stub_subprocess(base + ["-o", out, "--dist-host-id", "1"]
                         + shard_args)
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()

    def recs(path):
        return [l for l in open(path).read().splitlines()
                if l and not l.startswith("@")]

    merged = sorted(recs(tmp_path / "mh.shard0.sam")
                    + recs(tmp_path / "mh.shard1.sam"))
    assert merged == sorted(recs(ok))


def test_pe_sigkill_and_resume(tmp_path):
    """PE runs checkpoint a (record, offset1, offset2) cursor and resume
    exactly like SE."""
    from bitmapperbs_tpu.index.build import build_index, save_index
    from bitmapperbs_tpu.io.fastq import write_fastq
    from bitmapperbs_tpu.utils.simulate import (random_genome_fasta,
                                                simulate_pairs)

    rng = np.random.default_rng(13)
    ref = tmp_path / "ref.fa"
    ref.write_text(random_genome_fasta(rng, contigs=(3000,)))
    idx = build_index(str(ref))
    save_index(idx, str(ref) + ".btidx")
    prs = simulate_pairs(idx.genome, 30, read_len=60, seed=14, sub_rate=0.01,
                         min_insert=120, max_insert=300)
    for mate in (0, 1):
        write_fastq(str(tmp_path / f"r{mate+1}.fq"),
                    [p[mate].codes for p in prs],
                    [f"p{i}" for i in range(len(prs))],
                    ["I" * 60 for _ in prs])
    base = ["search", str(ref), "--seq1", str(tmp_path / "r1.fq"),
            "--seq2", str(tmp_path / "r2.fq"), "--pe", "--min", "100",
            "--max", "350", "--oracle", "--batch-size", "4",
            "--read-bucket", "64"]

    ok = tmp_path / "full.sam"
    p = _cli_subprocess(base + ["-o", str(ok)])
    _, err = p.communicate(timeout=600)
    assert p.returncode == 0, err.decode()

    out = tmp_path / "crash.sam"
    cursor = str(out) + ".cursor"
    p = _cli_subprocess(base + ["-o", str(out)])
    deadline = time.time() + 300
    while time.time() < deadline:
        if os.path.exists(cursor) or p.poll() is not None:
            break
        time.sleep(0.05)
    if p.poll() is None:
        os.kill(p.pid, signal.SIGKILL)
        p.wait(timeout=60)
    if os.path.exists(cursor):
        p = _cli_subprocess(base + ["-o", str(out), "--resume"])
        _, err = p.communicate(timeout=600)
        assert p.returncode == 0, err.decode()
    want = [l for l in open(ok).read().splitlines() if not l.startswith("@")]
    got = [l for l in open(out).read().splitlines() if not l.startswith("@")]
    assert got == want
