"""Device-resident (HBM) index arrays (SURVEY.md L2 TPU restatement).

The two PackedBlocks are padded to a common shape and stacked on a leading
block axis so one gather, indexed by `block * rows_max + row`, serves lanes
working in either block (occ-table lookup = "vectorized gather over
HBM-resident bit-packed BWT blocks", BASELINE).  The original genome is held
as bit-packed planes in both orientations (fwd and rc) so block-1
verification gathers contiguous forward words instead of bit-reversing.

All positions/counters are uint32 (SURVEY.md hard-part 6); gather row
indices are int32 (row counts are < 2^31 even for GRCh38).
"""
from __future__ import annotations

import dataclasses

import numpy as np

import jax
import jax.numpy as jnp

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.index.build import BSIndex


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class DeviceIndex:
    # FM blocks, stacked [2, ...]
    cp_rows: jax.Array      # uint32[2 * rows_max, CP_ROW_U32] (flattened)
    cbase: jax.Array        # uint32[2, CONV_ALPHA]
    sa_samples: jax.Array   # uint32[2 * samples_max] (flat; shardable)
    n: jax.Array            # uint32[2] text lengths (incl sentinel)
    # original genome, bit-packed planes, fwd + rc orientations.  FLAT
    # rows (block-0 words then block-1 words), fixed at upload so no jit
    # ever reshapes the multi-GB table (and sharded row math is uniform).
    g_planes: jax.Array     # uint32[2 * g_words, 3]: row -> [b0, b1, nmask]
    # k-mer lookup table (constants.py KLT): first klt_k backward-search
    # steps in one gather; always replicated (worst case 3^14 * 2 u32
    # = 38 MB per block, 76 MB both blocks at KLT_MAX_K=14).
    klt: jax.Array          # uint32[2 * 3^klt_k, 2] (flat over blocks)
    rows_max: int = dataclasses.field(metadata=dict(static=True))
    genome_len: int = dataclasses.field(metadata=dict(static=True))
    samples_max: int = dataclasses.field(metadata=dict(static=True))
    sa_rate: int = dataclasses.field(default=K.DEFAULT_SA_RATE,
                                     metadata=dict(static=True))
    klt_k: int = dataclasses.field(default=0, metadata=dict(static=True))
    # per-block GLOBAL g_planes row count (block-1 rows start at this offset;
    # needed by sharded fetches where the local array is only a row range)
    g_words: int = dataclasses.field(default=0, metadata=dict(static=True))
    # sharded-index mode (BASELINE: index "replicated or sharded"): when set,
    # cp_rows / sa_samples / g_planes hold only this device's shard along
    # their major axis and every fetch psums partial gathers over this axis.
    idx_axis: str | None = dataclasses.field(
        default=None, metadata=dict(static=True))

    @property
    def nbytes(self) -> int:
        return sum(int(a.size) * 4 for a in
                   (self.cp_rows, self.sa_samples, self.g_planes))


# Single device_put RPCs through the remote-TPU tunnel fail (UNAVAILABLE)
# once the array exceeds the transport's message cap (observed on the
# ~3.3 GB cp_rows of a 3.08 Gbp index).  Chunk big arrays: stream row
# ranges and stitch them into a donated device buffer, so peak HBM is
# full-array + one chunk and no RPC carries more than _CHUNK_BYTES.
_CHUNK_BYTES = 256 << 20
_PUT_THRESHOLD = 1 << 30


def _chunked_put(x: np.ndarray, device):
    if x.nbytes <= _PUT_THRESHOLD:
        return jax.device_put(jnp.asarray(x), device)
    row_bytes = max(1, x.nbytes // max(1, x.shape[0]))
    rows = max(1, _CHUNK_BYTES // row_bytes)

    def _update(buf, chunk, start):
        return jax.lax.dynamic_update_slice_in_dim(buf, chunk, start, axis=0)

    update = jax.jit(_update, donate_argnums=0)
    buf = jax.device_put(jnp.zeros(x.shape, dtype=x.dtype), device)
    for s in range(0, x.shape[0], rows):
        chunk = jax.device_put(jnp.asarray(x[s:s + rows]), device)
        buf = update(buf, chunk, jnp.int32(s))
        del chunk
    return jax.block_until_ready(buf)


def upload_index(idx: BSIndex, device=None) -> DeviceIndex:
    """Host BSIndex -> device arrays."""
    rows_max = max(b.cp_rows.shape[0] for b in idx.blocks)
    smax = max(len(b.sa_samples) for b in idx.blocks)

    def padded(arrs, rows, width):
        out = np.zeros((2, rows, width), dtype=np.uint32)
        for i, a in enumerate(arrs):
            out[i, :a.shape[0]] = a
        return out

    cp = padded([b.cp_rows for b in idx.blocks], rows_max, K.CP_ROW_U32)
    sa = np.zeros((2, max(smax, 1)), dtype=np.uint32)
    for i, b in enumerate(idx.blocks):
        sa[i, :len(b.sa_samples)] = b.sa_samples

    planes = idx.genome.packed_planes()
    words = len(planes["g0"])
    # leading zero word: ops/verify.window_planes biases starts by +32 so
    # wrapped-negative window starts (anchor - e near position 0) resolve;
    # plane-INTERLEAVED rows so one gather fetches all 3 planes of a word
    gp = np.zeros((2, words + 1, 3), dtype=np.uint32)
    for oi, pref in enumerate(("g", "r")):
        for pi, suf in enumerate(("0", "1", "n")):
            gp[oi, 1:, pi] = planes[pref + suf]

    klt_k = idx.blocks[0].klt_k
    assert all(b.klt_k == klt_k for b in idx.blocks)
    klt = np.stack([b.klt for b in idx.blocks])       # [2, 3^k, 2]

    put = lambda x: _chunked_put(np.ascontiguousarray(x), device)
    return DeviceIndex(
        cp_rows=put(cp.reshape(2 * rows_max, K.CP_ROW_U32)),
        cbase=put(np.stack([b.cbase for b in idx.blocks])),
        sa_samples=put(sa.reshape(-1)),
        n=put(np.array([b.n for b in idx.blocks], dtype=np.uint32)),
        g_planes=put(gp.reshape(2 * (words + 1), 3)),
        klt=put(klt.reshape(2 * 3 ** klt_k, 2)),
        rows_max=rows_max,
        genome_len=idx.genome.length,
        samples_max=sa.shape[1],
        sa_rate=idx.blocks[0].sa_rate,
        klt_k=klt_k,
        g_words=words + 1,
    )
