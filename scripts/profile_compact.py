"""Ablation profile of candidate_grids_compact: cumulative-prefix timings.

NOTE: historical measurement snapshot -- it inlines the compact pipeline as
of the searchsorted-expansion era to attribute stage costs; the production
pipeline has since moved on (run-marker expansion, interleaved planes,
sorted seeds).  Kept because PERF.md cites its methodology.

Each variant jits the pipeline cut off after stage k; differences attribute
wall time per stage (all on the same batch, same index).
"""
from __future__ import annotations

import functools
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np

from bitmapperbs_tpu import constants as K
from bitmapperbs_tpu.config import AlignerConfig
from bitmapperbs_tpu.index.build import build_index
from bitmapperbs_tpu.index.device import upload_index
from bitmapperbs_tpu.models import aligner
from bitmapperbs_tpu.models.host import prepare_batch
from bitmapperbs_tpu.ops import fm, verify
from bitmapperbs_tpu.utils.simulate import random_genome_fasta, simulate_reads

U32 = jnp.uint32
INVALID = aligner.INVALID
INF = aligner.INF


def timed(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def pipeline_prefix(dix, cfg, frames, stop: str):
    """Replica of candidate_grids_compact cut after `stop`."""

    @functools.partial(jax.jit, static_argnames=())
    def run(reads, lengths):
        B, m = reads.shape
        e, S, O = cfg.max_errors, cfg.num_seeds, cfg.max_seed_occ
        LB, Kc = cfg.locate_budget, cfg.max_candidates
        F = len(frames)
        Wd = m // 32
        L = dix.genome_len
        R = B * F
        CAP = B * cfg.locate_flat_cap

        frame_reads, blocks, bp_codes, starts_l, sp, ep = aligner._seed_stage(
            dix, cfg, reads, lengths, frames)
        if stop == "seed":
            return sp, ep

        cnt_u = ep - sp
        seed_ok = (cnt_u > 0) & (cnt_u <= O)
        cnt = jnp.where(seed_ok, cnt_u, 0).astype(jnp.int32)
        cum = jnp.cumsum(cnt, axis=-1)
        total = cum[..., -1]
        frame_occ = jnp.minimum(total, LB).reshape(R)
        frame_base = jnp.cumsum(frame_occ) - frame_occ
        g = jnp.arange(CAP, dtype=jnp.int32)
        fidx = jnp.searchsorted(frame_base, g, side="right").astype(jnp.int32) - 1
        lslot = g - frame_base[fidx]
        ok = lslot < frame_occ[fidx]
        cum_f = cum.reshape(R, S)[fidx]
        s_idx = jnp.minimum((cum_f <= lslot[:, None]).sum(-1), S - 1).astype(jnp.int32)
        cum_prev = jnp.where(
            s_idx > 0,
            jnp.take_along_axis(cum_f, jnp.maximum(s_idx - 1, 0)[:, None], -1)[..., 0], 0)
        within = (lslot - cum_prev).astype(jnp.int32)
        flat_fs = fidx * S + s_idx
        sa_row = sp.reshape(-1)[flat_fs] + within.astype(U32)
        st = starts_l.reshape(-1)[flat_fs]
        blk = blocks[fidx % F]
        read_b = fidx // F
        len_b = lengths[read_b]
        if stop == "expand":
            return sa_row, st, blk

        tp = fm.locate(dix, blk, sa_row, ok)
        anchor = tp - st.astype(U32)
        n_lane = dix.n[blk]
        a_ok = ok & (tp >= st.astype(U32)) & (anchor <= n_lane - 1 - len_b.astype(U32))
        anchor = jnp.where(a_ok, anchor, INVALID)
        if stop == "locate":
            return anchor

        key_row = jnp.where(a_ok, fidx, R)
        rowS, anchS = jax.lax.sort((key_row, anchor), num_keys=2)
        validS = rowS < R
        first = jnp.concatenate([
            jnp.ones(1, jnp.bool_),
            (rowS[1:] != rowS[:-1]) | (anchS[1:] != anchS[:-1])])
        uniq = validS & first
        s_in = jnp.cumsum(uniq.astype(jnp.int32))
        s_excl = s_in - uniq
        seg_first = jnp.full(R + 1, 1 << 30, jnp.int32).at[rowS].min(s_excl)
        rank = s_excl - seg_first[rowS]
        keep = uniq & (rank < Kc)
        if stop == "dedup":
            return rowS, anchS, keep, rank

        rowC = jnp.minimum(rowS, R - 1)
        blkS = blocks[rowC % F]
        cand = jnp.where(keep, anchS, 0)
        planes3 = jnp.stack(verify.pack_codes(frame_reads), axis=2)
        rp = planes3.reshape(R, 3, Wd)[rowC]
        d0, d1, dn = rp[:, 0], rp[:, 1], rp[:, 2]
        padv = ~verify.length_mask(lengths, m)[rowC // F]
        lenmask = ~padv
        ncols = m + 2 * e
        Ww = -(-ncols // 32)
        wide = verify.window_planes(dix.g_planes, blkS, cand - U32(e), Ww, L, None)
        ham = verify.hamming(aligner._shift_planes(wide, e, Wd), (d0, d1, dn), lenmask)
        if stop == "hamming":
            return ham
        peq = aligner._peq_from_planes(d0, d1, dn, padv)
        med = aligner.myers_fn(cfg)(wide, peq, padv, m, ncols)
        score = jnp.where(ham <= e, ham, med)
        score = jnp.where(keep & (score <= e), score, INF)
        if stop == "myers":
            return score
        raise ValueError(stop)

    return run


def main():
    rng = np.random.default_rng(0)
    cache = "/tmp/profile_idx_10m"
    from bitmapperbs_tpu.index.build import load_index, save_index
    if os.path.exists(cache + ".json"):
        idx = load_index(cache)
    else:
        idx = build_index(random_genome_fasta(
            rng, contigs=(5_000_000, 5_000_000)))
        save_index(idx, cache)
    dix = upload_index(idx)
    cfg = AlignerConfig(max_errors=4, indels=True, read_len_bucket=96,
                        batch_size=4096)
    sims = simulate_reads(idx.genome, 4096, read_len=90, seed=1,
                          sub_rate=0.01, indel_rate=0.005)
    arr, lengths = prepare_batch([s.codes for s in sims], 96, 4096)
    arr, lengths = jnp.asarray(arr), jnp.asarray(lengths)
    frames = tuple(aligner.frames_for(cfg))

    prev = 0.0
    for stage in ("seed", "expand", "locate", "dedup", "hamming", "myers"):
        fn = pipeline_prefix(dix, cfg, frames, stage)
        dt = timed(fn, arr, lengths)
        print(f"{stage:8s} cumulative {dt*1e3:7.1f} ms  (+{(dt-prev)*1e3:6.1f})")
        prev = dt

    full = functools.partial(aligner.map_batch_device, dix, cfg)
    dt = timed(full, arr, lengths)
    print(f"full     cumulative {dt*1e3:7.1f} ms  (+select/scatter)")
    B = arr.shape[0]
    print(f"-> {B/dt:8.0f} reads/s")


if __name__ == "__main__":
    main()
