"""Fused whole-frame device program: ONE dispatch per frame.

On a tunneled TPU every kernel dispatch and host->device transfer costs
~1 ms of fixed latency, so the eager per-bucket driver (the original
models/tpu_inter execution loop: one upload + one or two dispatches per
(plane, size-class) bucket) spent hundreds of ms of pure host latency
per 1080p frame. This module re-expresses a frame's ENTIRE device pixel
stage as one jit-compiled program per frame *signature*:

  * the host planning pass packs every descriptor / coefficient / mask
    array into a single flat int32 buffer (ONE upload per frame), and
  * a traced interpreter replays the identical kernel sequence with
    STATIC slices of that buffer, so XLA sees the whole frame as one
    program (one dispatch; free inter-kernel fusion and scheduling).

The signature is the tuple of op records (kinds, size classes, padded
counts, buffer offsets). Pow2 batch padding with OOB-dropped pad rows
(see models/tpu_inter) keeps the signature set small: a stream converges
to a handful of compiled programs that are reused across frames and — via
the persistent compilation cache — across processes.

Kernels are the same bit-exact ops the eager driver used (ops/mc_tpu,
ops/mc_pallas, ops/itx); this module only changes WHERE their inputs
come from and how many programs carry them.

Reference mapping: the device half of dav1d's 2-pass decode
(src/decode.c:3375 submit + src/recon_tmpl.c drivers), compressed into
one XLA program per frame shape.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from ..ops.mc_tpu import (mc_unit_batch, mc_unit_batch_hv, mc_hplanes,
                          mc_hv_combos, warp8x8_batch, mc_scaled_batch,
                          scatter_units, set_slots, scatter_slot_units,
                          comp_join_wavg, comp_join_wmask, comp_join_mask,
                          obmc_blend_batch, _HPAD_L)
from ..ops import mc_pallas
from ..ops.itx import (_residual_core, _residual_multi_core, itx_residual,
                       itx_residual_multi)


# int16 OOB sentinel for destination rows: PAD_OOB (1 << 20) marks
# dropped scatter rows but doesn't fit int16, so narrow emits carry
# OOB16 and the interpreter widens it back (put/puthv destination
# columns were the second-largest int32 descriptor slice)
OOB16 = 0x7FFF


def emit_ys16(prog, ys):
    from ..ops.mc_tpu import PAD_OOB
    v = np.asarray(ys, np.int64)
    assert v.max(initial=0) < 0x7FFF or \
        v[v >= 0x7FFF].min(initial=PAD_OOB) >= PAD_OOB, \
        "ys16 value collides with OOB16"
    return prog.emit16(np.where(v >= PAD_OOB, OOB16, v))


def _ys_oob(ys):
    from ..ops.mc_tpu import PAD_OOB
    return jnp.where(ys == OOB16, PAD_OOB, ys)


def compact_cf(cf):
    """Sparsify a (B, sh, sw) coefficient batch to (vals (B, K),
    pos (B, K), K): inverse-transform inputs are mostly zeros (eob
    truncates the scan), and on the tunneled TPU every descriptor byte
    is frame time, so the upload carries only the nonzeros; the device
    rebuilds the dense block with one batched scatter (pad lanes carry
    an OOB position, mode=\"drop\"). K is the bucket's max nonzero
    count, padded to pow2 by the caller's schema for signature
    stability."""
    B = cf.shape[0]
    S = cf.shape[1] * cf.shape[2]
    flat = cf.reshape(B, S)
    r, c = np.nonzero(flat)
    counts = np.bincount(r, minlength=B)
    K = max(int(counts.max()) if B else 0, 1)
    starts = np.zeros(B + 1, np.int64)
    np.cumsum(counts, out=starts[1:])
    k_idx = np.arange(len(r)) - starts[r]
    vals = np.zeros((B, K), np.int32)
    pos = np.full((B, K), S, np.int32)   # S = OOB -> dropped
    vals[r, k_idx] = flat[r, c]
    pos[r, k_idx] = c
    return vals, pos, K


def _expand_cf(vals, pos, sh: int, sw: int):
    """Device-side inverse of compact_cf: (B, K)+(B, K) -> (B, sh, sw)."""
    B = vals.shape[0]
    dense = jnp.zeros((B, sh * sw), jnp.int32)
    dense = dense.at[jnp.arange(B)[:, None], pos].set(vals, mode="drop")
    return dense.reshape(B, sh, sw)


@functools.partial(jax.jit, static_argnums=(6, 7, 8))
def _resid_scatter_multi(plane, cfs, rsel, csel, ys, xs, tx: int,
                         bitdepth: int, add: bool = True):
    """Type-as-data variant of _resid_scatter: ONE op per (plane, tx
    size) covers every transform type (ops/itx.itx_residual_multi), the
    key to a per-frame program signature that converges across frames."""
    res = _residual_multi_core(cfs, rsel, csel, tx, bitdepth, jnp)
    uh, uw = res.shape[1], res.shape[2]
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    if add:
        res = jnp.clip(plane[yy, xx] + res, 0, (1 << bitdepth) - 1)
    return plane.at[yy, xx].set(res, mode="drop")


@functools.partial(jax.jit, static_argnums=(4, 5, 6, 7))
def _resid_scatter(plane, cfs, ys, xs, tx: int, txtp: int,
                   bitdepth: int, add: bool = True):
    """Inverse-transform one bucket and scatter at (ys, xs): clip-add
    onto reconstructed pixels (add=True, the inter driver) or raw-set
    into a residual plane (add=False, the intra engine). Pad rows carry
    PAD_OOB ys — dropped by mode=\"drop\". Jitted so the EAGER
    interpreter path (CPU backends) runs the butterflies compiled,
    exactly like the old per-bucket driver; inside the fused trace it
    inlines."""
    res = _residual_core(cfs, tx, txtp, bitdepth, jnp)
    uh, uw = res.shape[1], res.shape[2]
    yy = ys[:, None, None] + jnp.arange(uh)[None, :, None]
    xx = xs[:, None, None] + jnp.arange(uw)[None, None, :]
    if add:
        res = jnp.clip(plane[yy, xx] + res, 0, (1 << bitdepth) - 1)
    return plane.at[yy, xx].set(res, mode="drop")


class FrameProgram:
    """Builder: accumulates op records + one flat int32 descriptor
    buffer. Everything static (shapes, size classes, offsets) lives in
    the op records; everything data lives in the buffer."""

    def __init__(self, n_planes, bitdepth, plane_shapes, refspec=(),
                 srefspec=(), plane_inputs=False, out_dtype=None):
        """refspec: per plane ((h_vis, w_vis), 7-tuple of refsrc index
        or -1 for an absent/mismatched slot); srefspec: per scaled ref
        (refsrc index, h_vis, w_vis). The reference stacks are assembled
        INSIDE the program from the deduped refsrc buffers — reference
        slot fan-out costs zero dispatches."""
        self.n_planes = n_planes
        self.bd = bitdepth
        self.plane_shapes = tuple(tuple(s) for s in plane_shapes)
        self.refspec = tuple(refspec)
        self.srefspec = tuple(srefspec)
        self.ref_shapes = tuple(s for s, _ in self.refspec)
        self.plane_inputs = bool(plane_inputs)
        # plane pixel values fit the frame's native dtype; casting the
        # output planes on device quarters the download (and the HBM
        # footprint of reference planes — consumers re-cast to int32)
        self.out_dtype = np.dtype(out_dtype).name if out_dtype else None
        self.ops = []
        self._chunks = []
        self._off = 0
        self._chunks16 = []
        self._off16 = 0
        self._chunks8 = []
        self._off8 = 0
        self._hp_ids = {}      # (pl, combos-bytes) -> cache id
        self._n_cm = 0         # seg-mask registry counter
        self.use_pallas = mc_pallas.pallas_available()

    # -- packing ----------------------------------------------------
    def emit(self, arr):
        a = np.ascontiguousarray(np.asarray(arr, dtype=np.int32))
        h = (self._off, a.shape)
        self._chunks.append(a.reshape(-1))
        self._off += a.size
        return h

    def emit16(self, arr):
        """Emit into the int16 side buffer (halves the per-frame
        host->device descriptor upload, the dominant fixed transfer at
        1080p+). Callers must guarantee values fit int16 — coefficient
        payloads at 8 bpc, filter level/edge maps, small taps. The
        interpreter casts slices back to int32 on device (free, fused).
        NEVER use for arrays carrying the PAD_OOB sentinel (1<<20)."""
        a = np.ascontiguousarray(np.asarray(arr, dtype=np.int16))
        h = (self._off16, a.shape, 16)
        self._chunks16.append(a.reshape(-1))
        self._off16 += a.size
        return h

    def emit8(self, arr):
        """Emit into the int8 side buffer — for small-range per-4x4
        filter maps (deblock levels <= 63, edge masks, luts, CDEF
        strengths), the dominant upload of the filter-chain program.
        The tunnel charges ~100 ms latency + bandwidth per frame, so
        every descriptor byte is frame time. Same caveats as emit16."""
        a = np.asarray(arr)
        assert a.size == 0 or (a.min() >= -128 and a.max() <= 127), \
            "emit8 value out of int8 range"
        a = np.ascontiguousarray(a.astype(np.int8))
        h = (self._off8, a.shape, 8)
        self._chunks8.append(a.reshape(-1))
        self._off8 += a.size
        return h

    def op(self, *rec):
        self.ops.append(rec)

    def hplanes_id(self, pl, combos, stable_key=None):
        """Cache id for an H-filtered plane stack; emits the build op on
        first use (mirrors the eager driver's per-plane hcache).
        stable_key (schema mode): identify the stack by its put CASE,
        not by combos content — content-keyed dedup makes the cid
        assignment (a static signature field) vary frame-to-frame and
        defeats program reuse; the per-ref-grouped refmap/taps are
        padded to a combos-count-only bound for the same reason."""
        key = (pl, stable_key) if stable_key is not None \
            else (pl, combos.tobytes())
        cid = self._hp_ids.get(key)
        if cid is None:
            cid = len(self._hp_ids)
            self._hp_ids[key] = cid
            if self.use_pallas:
                refmap, taps, remap = mc_pallas.hplanes_prep(combos)
                if stable_key is not None:
                    # schema mode: the per-ref HGROUP grouping adds at
                    # most (HGROUP-1) rows per distinct ref (<=7), so
                    # pad to the C-only upper bound — a pure function
                    # of the (schema-stable) combos count, immune to
                    # the frame's ref mix
                    hg = mc_pallas.HGROUP
                    Cp = -(-(combos.shape[0] + (hg - 1) * 7) // hg) * hg
                    k2 = Cp - refmap.shape[0]
                    assert k2 >= 0, (Cp, refmap.shape)
                    if k2 > 0:
                        refmap = np.concatenate(
                            [refmap, np.repeat(refmap[-1:], k2)])
                        taps = np.concatenate(
                            [taps, np.repeat(taps[-1:], k2, 0)])
                self.op("hpp", pl, cid, self.emit(refmap),
                        self.emit(taps))
                self._hp_ids[key] = cid = (cid, remap)
            else:
                self.op("hpx", pl, cid, self.emit(combos))
        return self._hp_ids[key]

    def new_cm(self):
        self._n_cm += 1
        return self._n_cm - 1

    def finalize(self):
        desc = np.concatenate(self._chunks) if self._chunks else \
            np.zeros(1, np.int32)
        desc16 = np.concatenate(self._chunks16) if self._chunks16 else \
            np.zeros(1, np.int16)
        desc8 = np.concatenate(self._chunks8) if self._chunks8 else \
            np.zeros(1, np.int8)
        sig = (tuple(self.ops), self.n_planes, self.bd,
               self.plane_shapes, self.refspec, self.srefspec,
               self.plane_inputs, self.out_dtype)
        return sig, desc, desc16, desc8


def _fuse_default() -> bool:
    """Whole-frame fusion pays off when dispatch latency dominates (real
    TPUs, tunneled or not); on CPU backends the per-signature compile of
    a hundred-kernel program costs far more than it saves, so the same
    op sequence runs eagerly there (reusing the individually-jitted
    kernels). DAV1D_TPU_FUSE=0/1 overrides."""
    import os
    env = os.environ.get("DAV1D_TPU_FUSE")
    if env in ("0", "1"):
        return env == "1"
    try:
        return jax.devices()[0].platform in ("tpu", "axon")
    except Exception:
        return False


def run_frame_program(prog: FrameProgram, refsrc, fuse=None):
    """Execute the packed program. refsrc: tuple of deduped reference
    plane buffers (device int32 from previous frames' filter chains, or
    host uint8/16 uploads); the program assembles the per-plane 7-slot
    stacks and scaled-ref views from them. Returns
    (planes tuple, hres tuple)."""
    sig, desc, desc16, desc8 = prog.finalize()
    if fuse is None:
        fuse = _fuse_default()
    if _VOLLOG:
        _log_volumes(sig, desc, desc16, desc8)
    if fuse:
        if _SIGLOG:
            _log_signature(sig, desc)
        return _compiled(sig)(jnp.asarray(desc), jnp.asarray(desc16),
                              jnp.asarray(desc8), tuple(refsrc))
    # eager replay: keep the descriptor on the HOST — get() then slices
    # numpy (free) and the jitted kernels take the numpy views directly,
    # instead of issuing thousands of tiny device slice ops
    return _interpreter(sig)(desc, desc16, desc8, tuple(refsrc))


import os as _os
_SIGLOG = bool(_os.environ.get("DAV1D_TPU_SIGLOG"))
_VOLLOG = bool(_os.environ.get("DAV1D_TPU_VOLLOG"))
_seen_sigs = {}


def _log_volumes(sig, desc, desc16, desc8):
    """DAV1D_TPU_VOLLOG=1: one stderr line per program dispatch with the
    host<->device transfer volumes this program implies — descriptor
    upload (int32 + int16 sides) and result download (hres residual
    buckets + output planes). The tunnel download path is ~30 MB/s, so
    these volumes ARE the steady-state frame time at 1080p."""
    import sys
    ops, n_planes = sig[0], sig[1]
    plane_shapes, out_dtype = sig[3], sig[7]
    hres_el = 0
    for op in ops:
        if op[0] == "hresm":
            hres_el += int(np.prod(op[2][1], dtype=np.int64))
        elif op[0] == "hres":
            hres_el += int(np.prod(op[3][1], dtype=np.int64))
        elif op[0] == "hresc":        # (tx, txtp, sh, sw, h_v, h_p)
            hres_el += op[5][1][0] * op[3] * op[4]
        elif op[0] == "hresmc":       # (tx, sh, sw, h_v, h_p, ...)
            hres_el += op[4][1][0] * op[2] * op[3]
    pb = sum(int(np.prod(s, dtype=np.int64)) for s in plane_shapes)
    pb *= np.dtype(out_dtype).itemsize if out_dtype else 4
    print(f"[vollog] up32={desc.nbytes/1e6:.2f}MB "
          f"up16={desc16.nbytes/1e6:.2f}MB "
          f"up8={desc8.nbytes/1e6:.2f}MB "
          f"hres={hres_el*4/1e6:.2f}MB planes={pb/1e6:.2f}MB "
          f"ops={len(ops)}", file=sys.stderr, flush=True)


def _log_signature(sig, desc):
    """DAV1D_TPU_SIGLOG=1: one stderr line per fused-program dispatch —
    signature hash, op count, descriptor size, whether this signature is
    new in-process (= an XLA compile or persistent-cache load), and for
    a new signature the op-level diff vs the previous one (the data
    VERDICT r3 asked for to close signature variance)."""
    import hashlib
    import sys
    h = hashlib.sha1(repr(sig).encode()).hexdigest()[:12]
    ops = sig[0]
    new = h not in _seen_sigs
    line = (f"[siglog] sig={h} ops={len(ops)} desc={desc.size} "
            f"{'NEW' if new else 'hit'}")
    if new and _seen_sigs:
        prev = _seen_sigs[next(reversed(_seen_sigs))]
        pset = {repr(o) for o in prev}
        cset = {repr(o) for o in ops}
        added = [o for o in cset - pset]
        removed = [o for o in pset - cset]
        line += f" | +{len(added)} ops -{len(removed)} ops"
        for o in sorted(added)[:8]:
            line += f"\n[siglog]   + {o[:160]}"
        for o in sorted(removed)[:8]:
            line += f"\n[siglog]   - {o[:160]}"
    if new:
        _seen_sigs[h] = ops
    print(line, file=sys.stderr, flush=True)


@functools.lru_cache(maxsize=128)
def _compiled(sig):
    # plane-input programs (the filter chain) own their input planes —
    # donate them so XLA can filter in place instead of allocating a
    # second set of 1080p planes per frame
    donate = (3,) if sig[6] else ()   # refsrc (the chain's input planes)
    return jax.jit(_interpreter(sig), donate_argnums=donate)


@functools.lru_cache(maxsize=128)
def _interpreter(sig):
    (ops, n_planes, bd, plane_shapes, refspec, srefspec,
     plane_inputs, out_dtype) = sig

    def body(desc, desc16, desc8, refsrc):
        def get(h):
            if len(h) == 3:      # narrow side buffers (emit16/emit8)
                off, shape, bits = h
                n = int(np.prod(shape, dtype=np.int64)) if shape else 1
                src = desc16 if bits == 16 else desc8
                return src[off:off + n].reshape(shape).astype(np.int32)
            off, shape = h
            n = int(np.prod(shape, dtype=np.int64)) if shape else 1
            return desc[off:off + n].reshape(shape)

        refs = []
        for (hv, wv), slots in refspec:
            refs.append(jnp.stack(
                [jnp.zeros((hv, wv), jnp.int32) if i < 0 else
                 refsrc[i][:hv, :wv].astype(jnp.int32) for i in slots]))
        srefs = [refsrc[i][:h, :w][None].astype(jnp.int32)
                 for i, h, w in srefspec]
        if plane_inputs:
            planes = [p.astype(jnp.int32) for p in refsrc]
        else:
            planes = [jnp.zeros(s, jnp.int32) for s in plane_shapes]
        hp = {}       # cache id -> H-plane stack (xla) / padded (pallas)
        cms = {}      # seg-mask registry
        snap = {}     # filter-chain plane snapshots (pre-CDEF, pre-LR)
        hres = []

        def hres_out(x):
            # residuals fit int16 at 8 bpc (dav1d's own coef type):
            # halve their tunnel download; consumers widen back
            hres.append(x.astype(jnp.int16) if bd == 8 else x)

        def side_tmp(pl, bwp, bhp, N, subops, prep):
            tmp = jnp.zeros((N, bhp, bwp), jnp.int32)
            for s in subops:
                if s[0] == "t":
                    _, hh, hv, h_arr, h_sl = s
                    a = get(h_arr)
                    out = mc_unit_batch(
                        (refs[pl], a[:, 0], a[:, 1], a[:, 2], a[:, 3],
                         a[:, 4], a[:, 5]), bwp, bhp, hh, hv, bd, prep)
                    tmp = set_slots(tmp, get(h_sl), out)
                elif s[0] == "w":
                    _, h_rows, h_base = s
                    out = warp8x8_batch(refs[pl], get(h_rows), bd,
                                        prep)
                    tmp = scatter_slot_units(tmp, get(h_base), out,
                                             8, 8, bwp)
                else:
                    _, sid, uw, uh, h_rows, h_base = s
                    out = mc_scaled_batch(srefs[sid], get(h_rows),
                                          uw, uh, 2 * uw + 10,
                                          2 * uh + 10, bd, prep)
                    tmp = scatter_slot_units(tmp, get(h_base), out,
                                             uh, uw, bwp)
            return tmp

        for rec in ops:
            kind = rec[0]
            if kind == "hpx":
                _, pl, cid, h_combos = rec
                hp[cid] = mc_hplanes(refs[pl], get(h_combos), bd)
            elif kind == "hpp":
                _, pl, cid, h_refmap, h_taps = rec
                hs = mc_pallas.hplanes_run(refs[pl], get(h_refmap),
                                           get(h_taps), bd)
                hp[cid] = mc_pallas.pad_hstack(hs)[0]
            elif kind == "put":
                _, pl, uw, uh, hh, hv, h_arr, h_ys, h_xs = rec
                a = get(h_arr)
                out = mc_unit_batch(
                    (refs[pl], a[:, 0], a[:, 1], a[:, 2], a[:, 3],
                     a[:, 4], a[:, 5]), uw, uh, hh, hv, bd, False)
                planes[pl] = scatter_units(planes[pl], out,
                                           _ys_oob(get(h_ys)),
                                           get(h_xs), uh, uw)
            elif kind == "puthv_x":
                (_, pl, uw, uh, cid, h_slot, h_oy, h_ox, h_my, h_tv,
                 h_ys, h_xs) = rec
                out = mc_unit_batch_hv(
                    (hp[cid], get(h_slot), get(h_oy),
                     get(h_ox), get(h_my), get(h_tv)),
                    uw, uh, bd, False)
                planes[pl] = scatter_units(planes[pl], out,
                                           _ys_oob(get(h_ys)),
                                           get(h_xs), uh, uw)
            elif kind == "puthv_p":
                _, pl, uw, uh, cid, h_cols, B, h_ys, h_xs = rec
                hpad = hp[cid]
                cols = [get(h) for h in h_cols]
                if len(cols) == 7:
                    # compact form: (slot, ry, r0, rx, x0, frow, my) —
                    # expand the (8, Bp*uw) tap lanes on device
                    fv = mc_pallas.vpass_cols_device(
                        cols[5], cols[6], uw)
                    cols = cols[:5] + [fv]
                out = mc_pallas.vpass_run(hpad, *cols, uw, uh, bd,
                                          False, B)
                planes[pl] = scatter_units(planes[pl], out,
                                           _ys_oob(get(h_ys)),
                                           get(h_xs), uh, uw)
            elif kind == "warp":
                _, pl, h_rows, h_ys, h_xs = rec
                out = warp8x8_batch(refs[pl], get(h_rows), bd,
                                    False)
                planes[pl] = scatter_units(planes[pl], out,
                                           get(h_ys),
                                           get(h_xs), 8, 8)
            elif kind == "scaled":
                _, pl, sid, uw, uh, h_rows, h_ys, h_xs = rec
                out = mc_scaled_batch(srefs[sid], get(h_rows), uw,
                                      uh, 2 * uw + 10, 2 * uh + 10, bd,
                                      False)
                planes[pl] = scatter_units(planes[pl], out,
                                           get(h_ys),
                                           get(h_xs), uh, uw)
            elif kind == "comp":
                (_, pl, bwp, bhp, N, sides, joins, ssh, ssv, h_dy,
                 h_dx) = rec
                tmps = [side_tmp(pl, bwp, bhp, N, sides[i], True)
                        for i in (0, 1)]
                out = jnp.zeros((N, bhp, bwp), jnp.int32)
                for j in joins:
                    if j[0] == "wavg":
                        _, h_sl, h_w = j
                        out = comp_join_wavg(
                            out, tmps[0], tmps[1], get(h_sl),
                            get(h_w)[:, None, None], bd)
                    elif j[0] == "segl":
                        _, h_sl, h_sgn, cmid = j
                        out, cm = comp_join_wmask(
                            out, tmps[0], tmps[1], get(h_sl),
                            get(h_sgn), ssh, ssv, bd)
                        cms[cmid] = cm
                    elif j[0] == "segc":
                        _, h_sl, h_sgn, spec = j
                        if spec[0] == "one":
                            m = cms[spec[1]][get(spec[2])]
                        else:
                            m = jnp.stack([cms[cmid][jj]
                                           for cmid, jj in spec[1]])
                        out = comp_join_mask(out, tmps[0], tmps[1],
                                             get(h_sl),
                                             get(h_sgn), m, bd)
                    else:  # wedge
                        _, h_sl, h_sgn, h_masks = j
                        out = comp_join_mask(out, tmps[0], tmps[1],
                                             get(h_sl),
                                             get(h_sgn),
                                             get(h_masks), bd)
                planes[pl] = scatter_units(planes[pl], out,
                                           get(h_dy),
                                           get(h_dx), bhp, bwp)
            elif kind == "obmc":
                _, pl, lh, lw, region, vert, nL, subops, h_ys, h_xs = rec
                lap = side_tmp(pl, lw, lh, nL, subops, False)
                planes[pl] = obmc_blend_batch(
                    planes[pl], lap, get(h_ys), get(h_xs),
                    lh, lw, region, vert)
            # ---- in-loop filter chain ops (packed by models/tpu_filters)
            elif kind == "dbk":
                (_, pl, luma, sb4, h_ev, h_eh, h_lv, h_lh,
                 h_el, h_il) = rec
                from ..ops.loopfilter_tpu import deblock_plane_tpu
                # the *_prev neighbour-level maps are pure shifts of
                # lv/lh — derived here instead of uploaded (the 6-map
                # upload was the filter program's dominant slice)
                lv = jnp.asarray(get(h_lv))
                lh = jnp.asarray(get(h_lh))
                lvp = jnp.pad(lv[:, :-1], ((0, 0), (1, 0)))
                lhp = jnp.pad(lh[:-1, :], ((1, 0), (0, 0)))
                planes[pl] = deblock_plane_tpu(
                    planes[pl], get(h_ev), get(h_eh),
                    lv, lvp, lh, lhp, get(h_el), get(h_il),
                    luma=luma, bitdepth=bd, sb_step4=sb4)
            elif kind == "snap":
                snap[rec[1]] = list(planes)
            elif kind == "cdef":
                (_, h_idx, h_ns, h_ystr, h_uvstr, damping, ssh, ssv,
                 mono) = rec
                from ..ops.cdef_tpu import cdef_frame_tpu
                new = cdef_frame_tpu(
                    tuple(planes), get(h_idx),
                    get(h_ns).astype(bool), get(h_ystr),
                    get(h_uvstr), damping=damping, bitdepth=bd,
                    ss_hor=ssh, ss_ver=ssv, monochrome=mono)
                planes = list(new)
            elif kind == "sres":
                _, tgt, pl, out_w, src_w, step, mx0, h_vis, oshape = rec
                from ..ops.mc_tpu import resize_plane_tpu
                src = planes[pl] if tgt is None else snap[tgt][pl]
                res = resize_plane_tpu(src[:h_vis], out_w, src_w, step,
                                       mx0, bd)
                new = jax.lax.dynamic_update_slice(
                    jnp.zeros(oshape, jnp.int32), res, (0, 0))
                if tgt is None:
                    planes[pl] = new
                else:
                    snap[tgt][pl] = new
            elif kind == "lrw":
                (_, pl, snapid, w, h, h_xs, h_ysin, h_ysout, h_eg, h_fh,
                 h_fv) = rec
                from ..ops.looprestoration_tpu import (pad_stripes_tpu,
                                                      wiener_batch_tpu)
                padded = pad_stripes_tpu(
                    snap[("prelr", pl)][pl], snap[snapid][pl],
                    get(h_xs), get(h_ysin), get(h_eg),
                    w, h)
                res = wiener_batch_tpu(padded, get(h_fh),
                                       get(h_fv), w, h, bd)
                planes[pl] = scatter_units(planes[pl], res,
                                           get(h_ysout),
                                           get(h_xs), h, w)
            elif kind == "lrs":
                (_, pl, snapid, skind, w, h, h_xs, h_ysin, h_ysout, h_eg,
                 h_s0, h_s1, h_w0, h_w1) = rec
                from ..ops.looprestoration_tpu import (pad_stripes_tpu,
                                                      sgr_batch_tpu)
                from ..ops.mc_tpu import gather_units
                padded = pad_stripes_tpu(
                    snap[("prelr", pl)][pl], snap[snapid][pl],
                    get(h_xs), get(h_ysin), get(h_eg),
                    w, h)
                cur = gather_units(planes[pl], get(h_ysin),
                                   get(h_xs), h, w)
                res = sgr_batch_tpu(padded, cur, get(h_s0),
                                    get(h_s1), get(h_w0),
                                    get(h_w1), w, h, bd, skind)
                planes[pl] = scatter_units(planes[pl], res,
                                           get(h_ysout),
                                           get(h_xs), h, w)
            elif kind == "resid":
                _, pl, sh, sw, tx, txtp, h_cf, h_ys, h_xs = rec
                planes[pl] = _resid_scatter(
                    planes[pl], get(h_cf), get(h_ys),
                    get(h_xs), tx, txtp, bd)
            elif kind == "residm":
                _, pl, sh, sw, tx, h_cf, h_rs, h_cs, h_ys, h_xs = rec
                planes[pl] = _resid_scatter_multi(
                    planes[pl], get(h_cf), get(h_rs),
                    get(h_cs), get(h_ys), get(h_xs),
                    tx, bd)
            elif kind == "residc":
                _, pl, sh, sw, tx, txtp, h_v, h_p, h_ys, h_xs = rec
                cf = _expand_cf(get(h_v), get(h_p), sh, sw)
                planes[pl] = _resid_scatter(
                    planes[pl], cf, get(h_ys), get(h_xs), tx, txtp, bd)
            elif kind == "residmc":
                _, pl, sh, sw, tx, h_v, h_p, h_rs, h_cs, h_ys, h_xs = rec
                cf = _expand_cf(get(h_v), get(h_p), sh, sw)
                planes[pl] = _resid_scatter_multi(
                    planes[pl], cf, get(h_rs), get(h_cs),
                    get(h_ys), get(h_xs), tx, bd)
            elif kind == "hresm":
                _, tx, h_cf, h_rs, h_cs = rec
                hres_out(itx_residual_multi(
                    get(h_cf), get(h_rs), get(h_cs),
                    tx, bd))
            elif kind == "hresc":
                _, tx, txtp, sh, sw, h_v, h_p = rec
                cf = _expand_cf(get(h_v), get(h_p), sh, sw)
                hres_out(itx_residual(cf, tx, txtp, bd))
            elif kind == "hresmc":
                _, tx, sh, sw, h_v, h_p, h_rs, h_cs = rec
                cf = _expand_cf(get(h_v), get(h_p), sh, sw)
                hres_out(itx_residual_multi(cf, get(h_rs),
                                             get(h_cs), tx, bd))
            # ---- intra wavefront engine ops (models/tpu_intra) ----
            elif kind == "setplane":
                _, pl, h_arr = rec
                planes[pl] = jnp.asarray(get(h_arr))
            elif kind == "newres":
                snap["res"] = [jnp.zeros_like(p) for p in planes]
            elif kind == "resraw":
                _, pl, tx, txtp, h_cf, h_ys, h_xs = rec
                snap["res"][pl] = _resid_scatter(
                    snap["res"][pl], get(h_cf), get(h_ys),
                    get(h_xs), tx, txtp, bd, False)
            elif kind == "resrawm":
                # type-as-data twin of resraw (mirrors residm) — keyed
                # by (plane, tx SIZE) for schema-stable signatures
                _, pl, sh, sw, tx, h_cf, h_rs, h_cs, h_ys, h_xs = rec
                snap["res"][pl] = _resid_scatter_multi(
                    snap["res"][pl], get(h_cf), get(h_rs),
                    get(h_cs), get(h_ys), get(h_xs),
                    tx, bd, False)
            elif kind == "resrawc":
                _, pl, tx, txtp, sh, sw, h_v, h_p, h_ys, h_xs = rec
                cf = _expand_cf(get(h_v), get(h_p), sh, sw)
                snap["res"][pl] = _resid_scatter(
                    snap["res"][pl], cf, get(h_ys), get(h_xs),
                    tx, txtp, bd, False)
            elif kind == "resrawmc":
                _, pl, sh, sw, tx, h_v, h_p, h_rs, h_cs, h_ys, h_xs = rec
                cf = _expand_cf(get(h_v), get(h_p), sh, sw)
                snap["res"][pl] = _resid_scatter_multi(
                    snap["res"][pl], cf, get(h_rs), get(h_cs),
                    get(h_ys), get(h_xs), tx, bd, False)
            elif kind == "embed":
                # re-home a plane into the intra engine's padded layout
                # (PADT top/left margin, uniform luma-padded shape) —
                # bridges the inter program's planes to intrascan
                _, pl, Hp, Wp, ph, pw, padt = rec
                planes[pl] = jnp.zeros((Hp, Wp), jnp.int32).at[
                    padt:padt + ph, padt:padt + pw].set(
                        planes[pl][:ph, :pw])
            elif kind == "palset":
                # palette pixels pre-placed as 4x4 tiles (no recon
                # dependency; PAD_OOB rows dropped by the scatter)
                _, pl, h_vals, h_ys, h_xs = rec
                planes[pl] = scatter_units(planes[pl], get(h_vals),
                                           get(h_ys),
                                           get(h_xs), 4, 4)
            elif kind == "intrascan":
                _, wm, wf, ssh, ssv, npl = rec
                from .tpu_intra import intra_scan
                from ..ops.ipred_tpu import NPARAMS, P_DC_MULT

                def _expand_plan(w):
                    # compact wave plan -> dense (nw, K, NPARAMS)
                    # (tpu_intra._emit_wave_plan): scatter the real
                    # unit rows back into the padded scan layout
                    nw_, K_, h_rows, h_mult, h_slots = w
                    # jnp.asarray: the eager path hands numpy slices
                    rows = jnp.asarray(get(h_rows))
                    rows = rows.at[:, P_DC_MULT].set(get(h_mult))
                    dense = jnp.zeros((nw_ * K_, NPARAMS),
                                      jnp.int32).at[get(h_slots)].set(
                        rows, mode="drop")
                    return dense.reshape(nw_, K_, NPARAMS)

                out = intra_scan(
                    tuple(planes[:npl]), tuple(snap["res"][:npl]),
                    _expand_plan(wm), _expand_plan(wf), bd, ssh, ssv,
                    npl)
                for i in range(npl):
                    planes[i] = out[i]
            elif kind == "crop":
                _, pl, oy, ox, ph, pw, fh, fw = rec
                crop = jax.lax.dynamic_slice(planes[pl], (oy, ox),
                                             (ph, pw))
                if (fh, fw) != (ph, pw):
                    crop = jnp.zeros((fh, fw),
                                     jnp.int32).at[:ph, :pw].set(crop)
                planes[pl] = crop
            elif kind == "hres":
                _, tx, txtp, h_cf = rec
                hres_out(itx_residual(get(h_cf), tx, txtp, bd))
            elif kind == "out":
                planes = [p.astype(jnp.dtype(out_dtype)) for p in planes]
            elif kind == "outpack":
                # single flat download buffer: the tunneled device->host
                # path pays a fixed round-trip per transfer, so the
                # deferred-download gather stage pulls ONE buffer
                # instead of one per plane (api._gather_planes splits)
                planes = planes + [jnp.concatenate(
                    [p.reshape(-1) for p in planes])]
        return tuple(planes), tuple(hres)

    return body


# ---------------------------------------------------------------------
# pack helpers shared with the driver (models/tpu_inter)
# ---------------------------------------------------------------------
def pack_put_case(prog: FrameProgram, pl, key, arr, combos_pad=None):
    """One translational-put bucket. arr: pow2-padded (B, 8) rows
    (ref, oy, ox, mx, my, f2d, dst_y, dst_x) with PAD_OOB dst_y pads.
    combos_pad: optional grow-only pad (ProgramSchema) so the H-plane
    stack's dims stay frame-invariant. All columns ride the int16 side
    (coords < 8K, the dst_y OOB sentinel narrowed to OOB16): put rows
    were the second-largest int32 descriptor slice at 1080p."""
    uw, uh, has_h, has_v = key
    h_ys = emit_ys16(prog, arr[:, 6])
    h_xs = prog.emit16(arr[:, 7])
    if has_h and has_v:
        W = prog.ref_shapes[pl][1]
        H = prog.ref_shapes[pl][0]
        combos, slot, tv = mc_hv_combos(arr[:, :6], uw)
        if combos_pad is not None:
            C = combos_pad(combos.shape[0])
            if C > combos.shape[0]:
                combos = np.concatenate(
                    [combos,
                     np.repeat(combos[-1:], C - combos.shape[0], 0)])
        cid = prog.hplanes_id(pl, combos,
                              stable_key=(key if combos_pad is not None
                                          else None))
        if prog.use_pallas:
            cid, remap = cid
            cols, _ = mc_pallas.vpass_prep_compact(
                remap[slot], arr[:, :6], tv, uw, uh, H, W)
            # all compact columns are int16-range (slot<combos, coords
            # < padded plane dims, taps selectors tiny) — this bucket
            # family used to dominate the frame descriptor upload
            prog.op("puthv_p", pl, uw, uh, cid,
                    tuple(prog.emit16(c) for c in cols), arr.shape[0],
                    h_ys, h_xs)
        else:
            ox = np.clip(arr[:, 2], -_HPAD_L, W - 1).astype(np.int32)
            prog.op("puthv_x", pl, uw, uh, cid, prog.emit16(slot),
                    prog.emit16(arr[:, 1]), prog.emit16(ox),
                    prog.emit16(arr[:, 4]), prog.emit16(tv), h_ys, h_xs)
    else:
        prog.op("put", pl, uw, uh, bool(has_h), bool(has_v),
                prog.emit16(arr[:, :6]), h_ys, h_xs)
