"""Pallas TPU kernels for the hot verification loops (SURVEY.md C11/C12;
BASELINE: "the Hamming filter becomes a popcount-over-XOR Pallas kernel;
banded edit-distance verification becomes a fixed-band bit-parallel DP
kernel with masked batching").

Layout rule: the LANE axis is minor (T lanes per grid tile), word/plane axes
are sublanes, so every op is a full-width VPU vector op.  The Myers kernel
keeps VP/VN/score in registers across the whole column loop -- the jnp
fallback (ops/verify.py) spills that state to HBM every fori iteration,
which is exactly what this kernel eliminates.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

U32 = np.uint32            # numpy scalars inline into kernels as literals
FULL = np.uint32(0xFFFFFFFF)

LANE_TILE = 2048  # lanes per grid step


def _myers_kernel(win_ref, peq_ref, pad_ref, out_ref, *, Wd, Ww, m, ncols):
    """One tile: win (3*Ww, T) u32, peq (4*Wd, T) u32, pad (Wd, T) u32,
    out (1, T) i32.  Semi-global Myers, min over ncols columns."""
    T = out_ref.shape[-1]
    pad = [pad_ref[k:k + 1, :] for k in range(Wd)]
    peq = [[peq_ref[c * Wd + k:c * Wd + k + 1, :] for k in range(Wd)]
           for c in range(4)]

    def make_col(vp, vn, score, best, w0, w1, wn, b):
        c0 = (w0 >> b) & 1
        c1 = (w1 >> b) & 1
        cn = (wn >> b) & 1
        n_mask = U32(0) - cn                      # all-ones where column is N
        s0 = U32(0) - c0
        s1 = U32(0) - c1
        eq = []
        for k in range(Wd):
            # select PEQ[c][k] among the 4 symbols with bit arithmetic
            e = (peq[0][k] & ~s0 & ~s1) | (peq[1][k] & s0 & ~s1) \
                | (peq[2][k] & ~s0 & s1) | (peq[3][k] & s0 & s1)
            eq.append((e & ~n_mask) | (pad[k] & n_mask))

        # D0 = (((eq & vp) + vp) ^ vp) | eq | vn, with cross-word carry
        d0, hp, hn = [], [], []
        carry = None
        for k in range(Wd):
            t = eq[k] & vp[k]
            s = t + vp[k]
            c_out = (s < t).astype(U32)
            if carry is not None:
                s2 = s + carry
                c_out = c_out | (s2 < s).astype(U32)
                s = s2
            carry = c_out
            d0.append((s ^ vp[k]) | eq[k] | vn[k])
            hp.append(vn[k] | ~(d0[k] | vp[k]))
            hn.append(vp[k] & d0[k])

        top = ((hp[Wd - 1] >> 31) & 1).astype(jnp.int32) - \
              ((hn[Wd - 1] >> 31) & 1).astype(jnp.int32)
        score = score + top
        best = jnp.minimum(best, score)

        # shift hp/hn left by one (shift-in 0: free start), update vp/vn
        nvp, nvn = [], []
        prev_hp = jnp.zeros_like(hp[0])
        prev_hn = jnp.zeros_like(hn[0])
        for k in range(Wd):
            x = (hp[k] << 1) | (prev_hp >> 31)
            sh_hn = (hn[k] << 1) | (prev_hn >> 31)
            nvp.append(sh_hn | ~(d0[k] | x))
            nvn.append(d0[k] & x)
            prev_hp, prev_hn = hp[k], hn[k]
        return nvp, nvn, score, best

    nfull, tail = ncols // 32, ncols % 32

    def block(wb, st):
        vp = [st[0][k:k + 1, :] for k in range(Wd)]
        vn = [st[1][k:k + 1, :] for k in range(Wd)]
        score, best = st[2], st[3]
        w0 = win_ref[pl.ds(wb, 1), :]
        w1 = win_ref[pl.ds(Ww + wb, 1), :]
        wn = win_ref[pl.ds(2 * Ww + wb, 1), :]
        for b in range(32):
            vp, vn, score, best = make_col(vp, vn, score, best,
                                           w0, w1, wn, U32(b))
        return (jnp.concatenate(vp, axis=0), jnp.concatenate(vn, axis=0),
                score, best)

    vp0 = jnp.full((Wd, T), FULL, U32)
    vn0 = jnp.zeros((Wd, T), U32)
    score0 = jnp.full((1, T), m, jnp.int32)
    st = jax.lax.fori_loop(0, nfull, block, (vp0, vn0, score0, score0))

    if tail:
        vp = [st[0][k:k + 1, :] for k in range(Wd)]
        vn = [st[1][k:k + 1, :] for k in range(Wd)]
        score, best = st[2], st[3]
        w0 = win_ref[nfull:nfull + 1, :]
        w1 = win_ref[Ww + nfull:Ww + nfull + 1, :]
        wn = win_ref[2 * Ww + nfull:2 * Ww + nfull + 1, :]
        for b in range(tail):
            vp, vn, score, best = make_col(vp, vn, score, best,
                                           w0, w1, wn, U32(b))
        st = (None, None, score, best)

    out_ref[:, :] = st[3]


def _myers_scan_kernel(win_ref, peq_ref, pad_ref, out_ref, *, Wd, Ww, m,
                       ncols):
    """Like _myers_kernel, but emits the running score at EVERY column:
    out (ncols, T) i32 -- the per-end-column scan mate rescue consumes."""
    T = out_ref.shape[-1]
    pad = [pad_ref[k:k + 1, :] for k in range(Wd)]
    peq = [[peq_ref[c * Wd + k:c * Wd + k + 1, :] for k in range(Wd)]
           for c in range(4)]

    def make_col(vp, vn, score, w0, w1, wn, b):
        c0 = (w0 >> b) & 1
        c1 = (w1 >> b) & 1
        cn = (wn >> b) & 1
        n_mask = U32(0) - cn
        s0 = U32(0) - c0
        s1 = U32(0) - c1
        eq = []
        for k in range(Wd):
            e = (peq[0][k] & ~s0 & ~s1) | (peq[1][k] & s0 & ~s1) \
                | (peq[2][k] & ~s0 & s1) | (peq[3][k] & s0 & s1)
            eq.append((e & ~n_mask) | (pad[k] & n_mask))

        d0, hp, hn = [], [], []
        carry = None
        for k in range(Wd):
            t = eq[k] & vp[k]
            s = t + vp[k]
            c_out = (s < t).astype(U32)
            if carry is not None:
                s2 = s + carry
                c_out = c_out | (s2 < s).astype(U32)
                s = s2
            carry = c_out
            d0.append((s ^ vp[k]) | eq[k] | vn[k])
            hp.append(vn[k] | ~(d0[k] | vp[k]))
            hn.append(vp[k] & d0[k])

        top = ((hp[Wd - 1] >> 31) & 1).astype(jnp.int32) - \
              ((hn[Wd - 1] >> 31) & 1).astype(jnp.int32)
        score = score + top

        nvp, nvn = [], []
        prev_hp = jnp.zeros_like(hp[0])
        prev_hn = jnp.zeros_like(hn[0])
        for k in range(Wd):
            x = (hp[k] << 1) | (prev_hp >> 31)
            sh_hn = (hn[k] << 1) | (prev_hn >> 31)
            nvp.append(sh_hn | ~(d0[k] | x))
            nvn.append(d0[k] & x)
            prev_hp, prev_hn = hp[k], hn[k]
        return nvp, nvn, score

    nfull, tail = ncols // 32, ncols % 32

    def block(wb, st):
        vp = [st[0][k:k + 1, :] for k in range(Wd)]
        vn = [st[1][k:k + 1, :] for k in range(Wd)]
        score = st[2]
        w0 = win_ref[pl.ds(wb, 1), :]
        w1 = win_ref[pl.ds(Ww + wb, 1), :]
        wn = win_ref[pl.ds(2 * Ww + wb, 1), :]
        for b in range(32):
            vp, vn, score = make_col(vp, vn, score, w0, w1, wn, U32(b))
            out_ref[pl.ds(wb * 32 + b, 1), :] = score
        return (jnp.concatenate(vp, axis=0), jnp.concatenate(vn, axis=0),
                score)

    vp0 = jnp.full((Wd, T), FULL, U32)
    vn0 = jnp.zeros((Wd, T), U32)
    score0 = jnp.full((1, T), m, jnp.int32)
    st = jax.lax.fori_loop(0, nfull, block, (vp0, vn0, score0))

    if tail:
        vp = [st[0][k:k + 1, :] for k in range(Wd)]
        vn = [st[1][k:k + 1, :] for k in range(Wd)]
        score = st[2]
        w0 = win_ref[nfull:nfull + 1, :]
        w1 = win_ref[Ww + nfull:Ww + nfull + 1, :]
        wn = win_ref[2 * Ww + nfull:2 * Ww + nfull + 1, :]
        for b in range(tail):
            vp, vn, score = make_col(vp, vn, score, w0, w1, wn, U32(b))
            out_ref[nfull * 32 + b:nfull * 32 + b + 1, :] = score


def _popcount(v):
    """SWAR popcount on uint32 vectors (avoids relying on a native op in
    the Mosaic lowering; ~5 extra VPU ops per word)."""
    v = v - ((v >> 1) & U32(0x55555555))
    v = (v & U32(0x33333333)) + ((v >> 2) & U32(0x33333333))
    v = (v + (v >> 4)) & U32(0x0F0F0F0F)
    return (v * U32(0x01010101)) >> 24


def _fused_verify_kernel(win_ref, rd_ref, lm_ref, out_ref, *, Wd, Ww, m,
                         ncols, e):
    """Fused candidate verification for one lane tile (SURVEY C11+C12,
    BASELINE's "popcount-over-XOR Pallas kernel" + banded DP in ONE pass):

      win (3*Ww, T) u32   wide window planes starting at anchor - e
      rd  (3*Wd, T) u32   read planes (b0, b1, nmask)
      lm  (Wd, T)   u32   read length mask
      out (1, T)    i32   = ham  if ham <= e (anchored asymmetric Hamming)
                            else min-column semi-global Myers distance

    The e-bit funnel shift recovers the anchored window from the wide one,
    the asymmetric-match PEQ table is derived from the read planes
    in-register, and the Myers VP/VN state never leaves registers -- the
    window planes are read from VMEM exactly once for both the filter and
    the DP (the jnp path reads them twice and materializes ham/med)."""
    T = out_ref.shape[-1]
    d0 = [rd_ref[k:k + 1, :] for k in range(Wd)]
    d1 = [rd_ref[Wd + k:Wd + k + 1, :] for k in range(Wd)]
    dn = [rd_ref[2 * Wd + k:2 * Wd + k + 1, :] for k in range(Wd)]
    lm = [lm_ref[k:k + 1, :] for k in range(Wd)]

    # ---- anchored Hamming from the e-shifted wide window ------------------
    ham = jnp.zeros((1, T), jnp.int32)
    for k in range(Wd):
        if e == 0:
            a0, a1, an = (win_ref[k:k + 1, :], win_ref[Ww + k:Ww + k + 1, :],
                          win_ref[2 * Ww + k:2 * Ww + k + 1, :])
        else:
            sh, ish = U32(e), U32(32 - e)
            a0 = (win_ref[k:k + 1, :] >> sh) \
                | (win_ref[k + 1:k + 2, :] << ish)
            a1 = (win_ref[Ww + k:Ww + k + 1, :] >> sh) \
                | (win_ref[Ww + k + 1:Ww + k + 2, :] << ish)
            an = (win_ref[2 * Ww + k:2 * Ww + k + 1, :] >> sh) \
                | (win_ref[2 * Ww + k + 1:2 * Ww + k + 2, :] << ish)
        eqb = ~(a0 ^ d0[k]) & ~(a1 ^ d1[k])
        ref_c = a0 & ~a1
        read_t = d0[k] & d1[k]
        match = (eqb | (ref_c & read_t)) & ~an & ~dn[k]
        ham = ham + _popcount(~match & lm[k]).astype(jnp.int32)

    # ---- PEQ from read planes (asymmetric match; pad rows always-match) ---
    pad, peq = [], [[], [], [], []]
    for k in range(Wd):
        p = ~lm[k]
        pad.append(p)
        a = ~d0[k] & ~d1[k] & ~dn[k]
        c = d0[k] & ~d1[k] & ~dn[k]
        g = ~d0[k] & d1[k] & ~dn[k]
        t = d0[k] & d1[k] & ~dn[k]
        peq[0].append(a | p)
        peq[1].append(c | t | p)
        peq[2].append(g | p)
        peq[3].append(t | p)

    def make_col(vp, vn, score, best, w0, w1, wn, b):
        c0 = (w0 >> b) & 1
        c1 = (w1 >> b) & 1
        cn = (wn >> b) & 1
        n_mask = U32(0) - cn
        s0 = U32(0) - c0
        s1 = U32(0) - c1
        eq = []
        for k in range(Wd):
            sym = (peq[0][k] & ~s0 & ~s1) | (peq[1][k] & s0 & ~s1) \
                | (peq[2][k] & ~s0 & s1) | (peq[3][k] & s0 & s1)
            eq.append((sym & ~n_mask) | (pad[k] & n_mask))

        dd0, hp, hn = [], [], []
        carry = None
        for k in range(Wd):
            tw = eq[k] & vp[k]
            s = tw + vp[k]
            c_out = (s < tw).astype(U32)
            if carry is not None:
                s2 = s + carry
                c_out = c_out | (s2 < s).astype(U32)
                s = s2
            carry = c_out
            dd0.append((s ^ vp[k]) | eq[k] | vn[k])
            hp.append(vn[k] | ~(dd0[k] | vp[k]))
            hn.append(vp[k] & dd0[k])

        top = ((hp[Wd - 1] >> 31) & 1).astype(jnp.int32) - \
              ((hn[Wd - 1] >> 31) & 1).astype(jnp.int32)
        score = score + top
        best = jnp.minimum(best, score)

        nvp, nvn = [], []
        prev_hp = jnp.zeros_like(hp[0])
        prev_hn = jnp.zeros_like(hn[0])
        for k in range(Wd):
            x = (hp[k] << 1) | (prev_hp >> 31)
            sh_hn = (hn[k] << 1) | (prev_hn >> 31)
            nvp.append(sh_hn | ~(dd0[k] | x))
            nvn.append(dd0[k] & x)
            prev_hp, prev_hn = hp[k], hn[k]
        return nvp, nvn, score, best

    nfull, tail = ncols // 32, ncols % 32

    def block(wb, st):
        vp = [st[0][k:k + 1, :] for k in range(Wd)]
        vn = [st[1][k:k + 1, :] for k in range(Wd)]
        score, best = st[2], st[3]
        w0 = win_ref[pl.ds(wb, 1), :]
        w1 = win_ref[pl.ds(Ww + wb, 1), :]
        wn = win_ref[pl.ds(2 * Ww + wb, 1), :]
        for b in range(32):
            vp, vn, score, best = make_col(vp, vn, score, best,
                                           w0, w1, wn, U32(b))
        return (jnp.concatenate(vp, axis=0), jnp.concatenate(vn, axis=0),
                score, best)

    vp0 = jnp.full((Wd, T), FULL, U32)
    vn0 = jnp.zeros((Wd, T), U32)
    score0 = jnp.full((1, T), m, jnp.int32)
    st = jax.lax.fori_loop(0, nfull, block, (vp0, vn0, score0, score0))

    best = st[3]
    if tail:
        vp = [st[0][k:k + 1, :] for k in range(Wd)]
        vn = [st[1][k:k + 1, :] for k in range(Wd)]
        score, best = st[2], st[3]
        w0 = win_ref[nfull:nfull + 1, :]
        w1 = win_ref[Ww + nfull:Ww + nfull + 1, :]
        wn = win_ref[2 * Ww + nfull:2 * Ww + nfull + 1, :]
        for b in range(tail):
            vp, vn, score, best = make_col(vp, vn, score, best,
                                           w0, w1, wn, U32(b))

    out_ref[:, :] = jnp.where(ham <= e, ham, best)


@functools.partial(jax.jit, static_argnames=("m", "ncols", "e", "interpret"))
def verify_fused_pallas(win_planes, read_planes, lenmask, m: int, ncols: int,
                        e: int, interpret: bool = False):
    """Fused filter+DP verification: drop-in for the compact path's
    hamming(shift(wide)) -> myers(wide) -> where(ham <= e) sequence.

    win_planes: (b0, b1, n) each uint32[..., Ww] (window at anchor - e);
    read_planes: (b0, b1, n) each uint32[..., Wd]; lenmask uint32[..., Wd].
    Returns int32 lanes: ham where ham <= e else the Myers distance.
    """
    Wd = m // 32
    wb0, wb1, wn = win_planes
    Ww = wb0.shape[-1]
    lanes = lenmask.shape[:-1]
    L = 1
    for d in lanes:
        L *= d

    T = LANE_TILE
    Lpad = -(-L // T) * T

    def to_feature_major(x, F):
        flat = x.reshape(L, F)
        out = jnp.zeros((Lpad, F), x.dtype).at[:L].set(flat)
        return out.T

    win = jnp.concatenate(
        [to_feature_major(jnp.broadcast_to(w, (*lanes, Ww)), Ww)
         for w in (wb0, wb1, wn)], axis=0)
    rd = jnp.concatenate(
        [to_feature_major(jnp.broadcast_to(r, (*lanes, Wd)), Wd)
         for r in read_planes], axis=0)
    lm = to_feature_major(jnp.broadcast_to(lenmask, (*lanes, Wd)), Wd)

    kernel = functools.partial(_fused_verify_kernel, Wd=Wd, Ww=Ww, m=m,
                               ncols=ncols, e=e)
    out = pl.pallas_call(
        kernel,
        grid=(Lpad // T,),
        in_specs=[
            pl.BlockSpec((3 * Ww, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3 * Wd, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wd, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Lpad), jnp.int32),
        interpret=interpret,
    )(win, rd, lm)
    return out[0, :L].reshape(lanes)


@functools.partial(jax.jit, static_argnames=("m", "ncols"))
def myers_scan_pallas(win_planes, peq, pad, m: int, ncols: int):
    """Drop-in TPU replacement for ops.verify.myers_scan.

    win_planes: (b0, b1, n) each uint32[..., Ww]; peq uint32[..., 4, Wd];
    pad uint32[..., Wd].  Returns int32[..., ncols]."""
    Wd = m // 32
    wb0, wb1, wn = win_planes
    Ww = wb0.shape[-1]
    lanes = pad.shape[:-1]
    L = 1
    for d in lanes:
        L *= d

    # tile sized so the (ncols, T) i32 output block fits comfortably in VMEM
    T = LANE_TILE
    while T > 256 and ncols * T * 4 > 6 * 1024 * 1024:
        T //= 2
    Lpad = -(-L // T) * T

    def to_feature_major(x, F):
        flat = x.reshape(L, F)
        out = jnp.zeros((Lpad, F), x.dtype).at[:L].set(flat)
        return out.T

    win = jnp.concatenate(
        [to_feature_major(jnp.broadcast_to(w, (*lanes, Ww)), Ww)
         for w in (wb0, wb1, wn)], axis=0)
    peq_f = to_feature_major(
        jnp.broadcast_to(peq, (*lanes, 4, Wd)).reshape(*lanes, 4 * Wd),
        4 * Wd)
    pad_f = to_feature_major(jnp.broadcast_to(pad, (*lanes, Wd)), Wd)

    kernel = functools.partial(_myers_scan_kernel, Wd=Wd, Ww=Ww, m=m,
                               ncols=ncols)
    out = pl.pallas_call(
        kernel,
        grid=(Lpad // T,),
        in_specs=[
            pl.BlockSpec((3 * Ww, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Wd, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wd, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((ncols, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ncols, Lpad), jnp.int32),
    )(win, peq_f, pad_f)
    return jnp.moveaxis(out[:, :L], 0, -1).reshape(*lanes, ncols)


@functools.partial(jax.jit, static_argnames=("m", "ncols"))
def myers_pallas(win_planes, peq, pad, m: int, ncols: int):
    """Drop-in replacement for ops.verify.myers on TPU.

    win_planes: (b0, b1, n) each uint32[..., Ww]; peq uint32[..., 4, Wd];
    pad uint32[..., Wd].  Returns int32 lanes.
    """
    Wd = m // 32
    wb0, wb1, wn = win_planes
    Ww = wb0.shape[-1]
    lanes = pad.shape[:-1]
    L = 1
    for d in lanes:
        L *= d

    T = LANE_TILE
    Lpad = -(-L // T) * T

    def to_feature_major(x, F):
        flat = x.reshape(L, F)
        out = jnp.zeros((Lpad, F), x.dtype).at[:L].set(flat)
        return out.T  # (F, Lpad)

    win = jnp.concatenate(
        [to_feature_major(jnp.broadcast_to(w, (*lanes, Ww)), Ww)
         for w in (wb0, wb1, wn)], axis=0)                     # (3Ww, Lpad)
    peq_f = to_feature_major(
        jnp.broadcast_to(peq, (*lanes, 4, Wd)).reshape(*lanes, 4 * Wd),
        4 * Wd)                                                # (4Wd, Lpad)
    pad_f = to_feature_major(jnp.broadcast_to(pad, (*lanes, Wd)), Wd)

    kernel = functools.partial(_myers_kernel, Wd=Wd, Ww=Ww, m=m, ncols=ncols)
    grid = (Lpad // T,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((3 * Ww, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4 * Wd, T), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Wd, T), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, Lpad), jnp.int32),
    )(win, peq_f, pad_f)
    return out[0, :L].reshape(lanes)
