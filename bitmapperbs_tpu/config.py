"""AlignerConfig: one frozen, hashable config object (SURVEY.md section 5.6).

The reference's hand-rolled argv parser + compiled-in #define thresholds become
a single dataclass used as a static jit argument; the CLI maps 1:1 onto it.
"""
from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class AlignerConfig:
    # --- error model -------------------------------------------------------
    max_errors: int = 4          # -e : edit-distance budget per read
    indels: bool = True          # False -> Hamming-only fast path (config 1)

    # --- seeding policy (frozen spec: pigeonhole e+1 equal slices) ---------
    max_seed_occ: int = 64       # seed interval wider than this is skipped
    locate_budget: int = 64      # SA entries located per read per (pat,block)
    max_candidates: int = 32     # verified anchors per read per (pat,block)

    # --- library protocol --------------------------------------------------
    non_directional: bool = False  # --pbat / non-directional: add PAT_GA
    paired: bool = False
    min_insert: int = 0
    max_insert: int = 1000

    # --- batching ----------------------------------------------------------
    batch_size: int = 4096       # reads per device batch (per shard)
    read_len_bucket: int = 160   # padded read length (SURVEY hard-part 4)

    # --- device / parallelism ---------------------------------------------
    mesh_shape: tuple[int, ...] = (1,)
    mesh_axes: tuple[str, ...] = ("data",)
    use_pallas: bool = True      # False -> pure-jnp kernels (CPU tests)

    # --- compacted candidate pipeline ---------------------------------------
    # The locate/verify stages run over a flat buffer holding only OCCUPIED
    # candidate slots (batch-wide), instead of dense (B, F, budget) grids
    # sized for the worst case -- measured ~20x slot waste on typical reads.
    # Results are bit-identical to the dense path unless the flat buffer
    # overflows (reported per read as `gdrop`; the host then re-runs those
    # reads through the dense path, keeping output deterministic).
    compact: bool = True
    # flat slots per read (buffer = batch * this).  0 = genome-size adaptive:
    # candidate counts grow ~linearly with genome size (the 3-letter
    # converted alphabet makes seeds T-rich and heavy-tailed), so small
    # genomes get a tight buffer and large ones approach the per-frame
    # budget bound F * locate_budget, above which gdrop cannot occur.
    locate_flat_cap: int = 0

    def resolve_flat_cap(self, genome_len: int, num_frames: int) -> int:
        hard = num_frames * self.locate_budget   # per-read entries never exceed
        if self.locate_flat_cap > 0:
            return min(self.locate_flat_cap, hard)
        return int(np.clip(-(-genome_len // 1_500_000), 16, hard))

    # --- output ------------------------------------------------------------
    report_ambiguous: bool = True   # emit MAPQ-0 record vs suppress
    sam_rg: str | None = None

    @property
    def num_seeds(self) -> int:
        return self.max_errors + 1

    @property
    def band(self) -> int:
        """Myers band half-width == max_errors; full band 2e+1 columns."""
        return self.max_errors

    def replace(self, **kw) -> "AlignerConfig":
        return dataclasses.replace(self, **kw)

    def validate(self) -> None:
        if self.max_errors < 0 or self.max_errors > 15:
            raise ValueError("max_errors must be in [0, 15]")
        if self.paired and self.min_insert > self.max_insert:
            raise ValueError("min_insert > max_insert")
        if self.read_len_bucket % 32 != 0:
            raise ValueError("read_len_bucket must be a multiple of 32")
        if self.locate_flat_cap < 0:
            raise ValueError("locate_flat_cap must be >= 0 (0 = auto)")
