"""Multi-host (DCN) driver: sharded FASTQ in, sharded SAM out, global stats.

SURVEY.md section 2.2 / 5.8: the reference is single-node pthreads; the TPU
framework scales over hosts with `jax.distributed` for control plane, ICI
collectives inside the pjit'd mapper (parallel/shard.py), and DCN only for
host-level input sharding and end-of-run statistics.

Topology: every host runs this same driver.  Host h of H reads FASTQ records
h, h+H, h+2H, ... (record-strided sharding needs no index pass and balances
read-length skew), maps them on its local chips through the shard_map
pipeline over the GLOBAL mesh, and writes `<out>.shard<h>.sam`.  Shards
concatenate to a complete record set (order differs from input; each record
is independent and tagged by qname).  End-of-run counters are summed over
hosts with a psum on a tiny device array (the only DCN collective).

Degrades exactly to the single-host path when process_count == 1, which is
how the logic is unit-tested (a real pod run only changes process_count).
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import BSIndex
from bitmapperbs_tpu.io.stats import MapStats


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> tuple[int, int]:
    """jax.distributed.initialize wrapper; returns (process_id, num_processes).

    With no arguments on a single host this is a no-op returning (0, 1).
    On a pod slice, pass the coordinator address (or rely on the TPU
    environment's auto-detection) before any other JAX call.  A host that
    cannot reach the coordinator times out inside jax.distributed -- that
    timeout IS the missing-host detection of SURVEY.md 5.3; the run then
    restarts from each host's output cursor.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return jax.process_index(), jax.process_count()


@dataclasses.dataclass
class HostShard:
    """Record-strided FASTQ shard assignment for this host."""

    process_id: int
    num_processes: int

    def owns(self, record_index: int) -> bool:
        return record_index % self.num_processes == self.process_id

    def filter_batch(self, codes, qnames, quals, start_record: int):
        keep = [i for i in range(len(codes))
                if self.owns(start_record + i)]
        return ([codes[i] for i in keep], [qnames[i] for i in keep],
                [quals[i] for i in keep])


def shard_path(output: str, process_id: int, num_processes: int) -> str:
    if num_processes == 1:
        return output
    base = output[:-4] if output.endswith(".sam") else output
    return f"{base}.shard{process_id}.sam"


def global_stats(stats: MapStats) -> dict:
    """Sum per-host counters over all hosts (single DCN psum).

    Each host contributes its counters on its first local device only, then
    a pmapped psum over the GLOBAL device set (jax extends the axis across
    processes) yields the exact cross-host totals on every host.
    """
    names = ("total", "mapped", "unique", "ambiguous", "unmapped",
             "proper_pairs", "overflow_reads")
    vals = np.array([getattr(stats, k) for k in names], dtype=np.int64)
    n_local = jax.local_device_count()
    contrib = np.zeros((n_local, len(vals)), dtype=np.int64)
    contrib[0] = vals
    summed = np.asarray(
        jax.pmap(lambda x: jax.lax.psum(x, "d"), axis_name="d")(
            jnp.asarray(contrib)))[0]
    return {k: int(v) for k, v in zip(names, summed)}
