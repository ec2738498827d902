"""Device (TPU/XLA) inter-frame reconstruction.

The dav1d 2-pass seam re-expressed TPU-first: the host entropy pass has
already produced per-block modes/MVs and dequantized coefficients; this
module turns them into dense unit descriptor arrays and runs the pixel work
as batched device kernels:

  * translational MC (single-ref and compound avg/weighted-avg) as
    fixed-size unit batches over stacked reference planes (ops/mc_tpu),
  * residual inverse transforms bucketed by (tx, txtp) with scatter-add
    (ops/itx).

Blocks the batched path does not cover (warp, OBMC, inter-intra, masked
compound, sub-8x8 chroma, scaled refs) and intra blocks (sequential
neighbour dependency) run on the host afterwards, in decode order — valid
because inter prediction never reads current-frame pixels, so all batched
work commutes with the sequential remainder.

Bit-exact with the NumPy reference pipeline (and therefore with dav1d).
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from ..host.tilecoder import (T_BLOCK_DIM, T_TXFM, COMP_INTER_NONE,
                              COMP_INTER_AVG, COMP_INTER_WEIGHTED_AVG)
from ..ops.mc_tpu import PAD_OOB
from .ref_decoder import _recon_tile, _gmv_warp_params


# ---------------------------------------------------------------------
# Shape stabilization.  Every batched kernel call pads its batch dim to
# a power of two so the set of XLA programs a stream compiles is small
# and converges after a few frames (one program per kernel x size class
# instead of one per frame x bucket occupancy).  Pad entries carry a
# PAD_OOB destination row, which XLA scatter drops — exact no-ops.
# ---------------------------------------------------------------------
def _p2(n: int, floor: int = 8) -> int:
    p = floor
    while p < n:
        p <<= 1
    return p


def _pad_rows(arr: np.ndarray, ycol: int | None, P: int | None = None):
    """Pad (B, ...) int32 array to pow2 (or P) rows (dup of last row);
    mark the pad rows' scatter origin column OOB when ycol is given."""
    b = arr.shape[0]
    p = P if P is not None else _p2(b)
    if p == b:
        return arr
    pad = np.repeat(arr[-1:], p - b, axis=0)
    if ycol is not None:
        pad[:, ycol] = PAD_OOB
    return np.concatenate([arr, pad], axis=0)


def _pad_vec(vec: np.ndarray, oob: bool, P: int | None = None):
    """Pad a (B,) vector to pow2 (or P) (dup last, or PAD_OOB)."""
    b = vec.shape[0]
    p = P if P is not None else _p2(b)
    if p == b:
        return vec
    fill = np.full(p - b, PAD_OOB if oob else vec[-1], vec.dtype)
    return np.concatenate([vec, fill])


class ProgramSchema:
    """Grow-only case-presence + batch-size memory shared across a
    Decoder's frames (api.Decoder._prog_schema).

    The fused frame program's signature (models/frame_exec) embeds the
    op sequence AND every descriptor offset, so two frames compile to
    the same XLA program only if they pack the same cases at the same
    padded sizes in the same order. Per-frame bucket occupancy made
    every 1080p frame a fresh multi-minute compile (the round-2 bench
    timeout). Packing through this schema canonicalizes the program:
    case keys are the grow-only UNION of everything the stream has
    shown (absent cases emit schema-sized all-OOB dummy batches that
    scatter drops), batch dims only ever grow along the pow2 ladder.
    After a few frames the signature is byte-identical and the stream
    runs on ONE compiled program (plus the persistent cache across
    processes). dav1d's analogue: its per-bucket DSP calls are
    dispatch, not compile, so it never had this trade."""

    __slots__ = ("counts", "keysets", "_lock")

    def __init__(self):
        self.counts = {}
        self.keysets = {}
        # builds of DIFFERENT frames may run concurrently on the
        # 2-worker build stage (api._build_pipe); growth is monotone so
        # interleaving only affects which frame grows a pad first
        import threading
        self._lock = threading.Lock()

    def pad(self, key, n, extra: int = 0) -> int:
        """Padded batch size for `key`: pow2(n + extra), never smaller
        than any previous frame's answer. `extra` reserves sacrificial
        pad slots (comp joins need >=1 slot that no real work targets)."""
        with self._lock:
            p = max(_p2(max(n + extra, 1)), self.counts.get(key, 0))
            self.counts[key] = p
            return p

    def combos_pad(self, key, n: int) -> int:
        """mc_hv_combos' 1.5x-step ladder (multiples of 8), grow-only."""
        p = 8
        while p < n:
            p = (p + (p >> 1) + 7) & ~7
        with self._lock:
            p = max(p, self.counts.get(key, 0))
            self.counts[key] = p
            return p

    def union(self, family, keys):
        with self._lock:
            s = self.keysets.setdefault(family, set())
            s.update(keys)
            return sorted(s)


def _block_device_class(fhdr, coder, b, refs, cur_w, cur_h):
    """'single' / 'comp' if the batched device path covers this block's
    motion-compensated prediction, else None (host fallback). The device
    surface spans translation, warp, OBMC, masked compound (wedge/seg),
    scaled references and sub-8x8 chroma. Inter-intra blocks get their
    PUT on device too; the intra blend over reconstructed neighbours is
    decode-order work the native pass-2 walk finishes (callers track
    them separately). Intra-frame intrabc stays sequential host work
    (it reads the current frame's freshly decoded pixels)."""
    if b.intra:
        return None
    if fhdr.frame_type in (0, 2):  # intrabc
        return None
    for i in range(2 if b.comp_type else 1):
        rb = refs[fhdr.refidx[b.ref[i]]]
        if rb is None:
            return None
    return "comp" if b.comp_type else "single"


def _scale_fac(ref_sz, this_sz):
    return ((ref_sz << 14) + (this_sz >> 1)) // this_sz


def _scale_mv(val, scale):
    tmp = val * scale + (scale - 0x4000) * 8
    v = (abs(tmp) + 128) >> 8
    return (-v if tmp < 0 else v) + 32


def _units_for_block_raw(plan, pl, ss_hor, ss_ver, b_dims, bx, by, mv,
                         ref_i, f2d, dst=None, whole=False):
    """Decompose one plane region into fixed-size translational MC units
    (dav1d recon_tmpl.c mc:957 geometry). b_dims/bx/by are the
    ALREADY-ALIGNED block dims/pos in (luma-scaled) 4px units; dst
    overrides the destination pixel position (sub-8x8 chroma places
    neighbour predictions at the current block)."""
    bw4, bh4 = b_dims
    if pl == 0:
        ss_hor = ss_ver = 0
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    pw, ph = bw4 * h_mul, bh4 * v_mul
    mvy, mvx = mv
    mx = (mvx & (15 >> (0 if ss_hor else 1))) << (0 if ss_hor else 1)
    my = (mvy & (15 >> (0 if ss_ver else 1))) << (0 if ss_ver else 1)
    sx = bx * h_mul + (mvx >> (3 + ss_hor))
    sy = by * v_mul + (mvy >> (3 + ss_ver))
    dst_y, dst_x = dst if dst is not None else (by * v_mul, bx * h_mul)
    has_h, has_v = mx != 0, my != 0
    uw, uh = (pw, ph) if whole else (min(pw, 8), min(ph, 8))
    key = (uw, uh, has_h, has_v)
    lst = plan.setdefault(key, [])
    for oy in range(0, ph, uh):
        for ox in range(0, pw, uw):
            lst.append((ref_i,
                        sy + oy - (3 if has_v else 0),
                        sx + ox - (3 if has_h else 0),
                        mx, my, f2d, dst_y + oy, dst_x + ox))


def _warp_rows(ss_hor, ss_ver, wm, bx, by, bw4, bh4, ref_slot):
    """8x8 warp sub-unit descriptor rows (dav1d recon_tmpl.c
    warp_affine:1134 loop). Returns [(row10, sub_y, sub_x)] with sub
    offsets in plane pixels."""
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    mat = wm.matrix
    out = []
    for y in range(0, bh4 * v_mul, 8):
        src_y = by * 4 + ((y + 4) << ss_ver)
        mat3_y = mat[3] * src_y + mat[0]
        mat5_y = mat[5] * src_y + mat[1]
        for x in range(0, bw4 * h_mul, 8):
            src_x = bx * 4 + ((x + 4) << ss_hor)
            mvx = (mat[2] * src_x + mat3_y) >> ss_hor
            mvy = (mat[4] * src_x + mat5_y) >> ss_ver
            dx = (mvx >> 16) - 4
            mx = ((mvx & 0xFFFF) - wm.alpha * 4 - wm.beta * 7) & ~0x3F
            dy = (mvy >> 16) - 4
            my = ((mvy & 0xFFFF) - wm.gamma * 4 - wm.delta * 4) & ~0x3F
            out.append(((ref_slot, dy - 3, dx - 3, mx, my, wm.alpha,
                         wm.beta, wm.gamma, wm.delta, 0), y, x))
    return out


def _scaled_pos(ss_hor, ss_ver, bx, by, mv, scale):
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    mvy, mvx = mv
    orig_x = (bx * h_mul << 4) + mvx * (1 << (0 if ss_hor else 1))
    orig_y = (by * v_mul << 4) + mvy * (1 << (0 if ss_ver else 1))
    return _scale_mv(orig_x, scale[0]), _scale_mv(orig_y, scale[1])


def _scaled_rows(ss_hor, ss_ver, b_dims, bx, by, mv, f2d, ref_slot,
                 scale, step, split=True):
    """Scaled-MC sub-unit rows (dav1d recon_tmpl.c mc:1010-1037); pos
    recomputed per sub-unit via the closed-form per-pixel stepping.
    Returns [(row9, uw, uh, sub_y, sub_x)]."""
    bw4, bh4 = b_dims
    h_mul, v_mul = 4 >> ss_hor, 4 >> ss_ver
    pw, ph = bw4 * h_mul, bh4 * v_mul
    pos_x, pos_y = _scaled_pos(ss_hor, ss_ver, bx, by, mv, scale)
    su = 8 if split else max(pw, ph)
    out = []
    for oy in range(0, ph, su):
        uh = min(su, ph - oy)
        py = pos_y + oy * step[1]
        for ox in range(0, pw, su):
            uw = min(su, pw - ox)
            px = pos_x + ox * step[0]
            out.append(((ref_slot, py >> 10, px >> 10, px & 0x3FF,
                         py & 0x3FF, step[0], step[1], f2d, 0),
                        uw, uh, oy, ox))
    return out


class _FramePlan:
    """All device MC work for one frame, bucketed for batching."""

    def __init__(self, n_planes):
        self.put = [dict() for _ in range(n_planes)]       # translational
        self.warp_put = [[] for _ in range(n_planes)]      # (row, y, x)
        self.scaled_put = [dict() for _ in range(n_planes)]
        # OBMC laps, applied after all puts: phase 0 = top, 1 = left;
        # bucket (phase, lap_h, lap_w, region_dim); entries
        # (kind, row, (dst_y, dst_x))
        self.laps = [dict() for _ in range(n_planes)]
        # compound: bucket (bw_px, bh_px) -> list of block entry dicts
        self.comp = [dict() for _ in range(n_planes)]
        # vector-planned translational puts (models/plan_vec): per-plane
        # {(uw, uh, hh, hv): (B, 8) int32}; merged with self.put at pack
        self.put_vec = [dict() for _ in range(n_planes)]


def _vec_plan_enabled() -> bool:
    import os
    return os.environ.get("DAV1D_TPU_NO_VEC_PLAN") != "1"


def _vec_plan(fhdr, coders, refs, plan, n_planes, ss_hor, ss_ver,
              cur_w, cur_h):
    """Vectorized bulk planning (models/plan_vec): plans every plain
    translational put as numpy array programs, precomputes the decode-
    order filter state, and returns the per-coder special-block indices
    the per-block loop still has to visit (warp / scaled / OBMC laps /
    sub-8x8 chroma / compound). Returns None when a coder lacks dense
    records (Python-entropy streams keep the per-block walk)."""
    from . import plan_vec as pv
    ref_ok = np.zeros(7, bool)
    ref_scaled = np.zeros(7, bool)
    gm_warp = np.zeros(7, bool)
    for i in range(7):
        rb = refs[fhdr.refidx[i]]
        ref_ok[i] = rb is not None
        if rb is not None:
            ref_scaled[i] = rb.width != cur_w or rb.height != cur_h
        gm_warp[i] = _gmv_warp_params(fhdr, i,
                                      bool(ref_scaled[i])) is not None
    rf = coders[0].rf
    blk_all, _, n_per = pv.blocks_meta(coders)
    tl_all = pv.f2d_products(blk_all)
    f2d_map = pv.paint_f2d_map(blk_all, coders[0].bw, coders[0].bh)

    special, dd_per, tl_per = [], [], []
    off = 0
    for ci, coder in enumerate(coders):
        blk = coder.native_arrays[0]
        nb = blk.shape[0]
        cl = pv.classify(blk, ref_ok, gm_warp, ref_scaled)
        bw4, bh4 = cl["bw4"], cl["bh4"]
        bx, by = blk[:, pv.B_BX], blk[:, pv.B_BY]
        has_chroma = np.zeros(nb, bool) if n_planes == 1 else (
            ((bw4 > ss_hor) | (bx & 1).astype(bool)) &
            ((bh4 > ss_ver) | (by & 1).astype(bool)))
        sub8 = _sub8x8_refined_vec(blk, bw4, bh4, ss_hor, ss_ver,
                                   has_chroma, rf)
        luma_vec = cl["single"] & ~cl["use_warp"] & ~cl["scaled0"]
        chroma_vec = luma_vec & has_chroma & ~sub8
        vp = pv.plan_translational(blk, ss_hor, ss_ver, n_planes,
                                   luma_vec, chroma_vec)
        for pl in range(n_planes):
            for k, arr in vp[pl].items():
                prev = plan.put_vec[pl].get(k)
                plan.put_vec[pl][k] = (arr if prev is None else
                                       np.concatenate([prev, arr]))
        dd = np.zeros(nb, np.uint8)
        dd[cl["covered"]] = 1
        dd[cl["ii"]] = 2
        dd_per.append(dd)
        sp = cl["comp"] | (cl["single"] &
                           (cl["use_warp"] | cl["scaled0"] |
                            (blk[:, pv.B_MOTION_MODE] == 1) |
                            (sub8 & has_chroma)))
        special.append(np.nonzero(sp)[0])
        tl_per.append(tl_all[off:off + nb])
        off += nb
    return dict(special=special, dd_per=dd_per, tl=tl_per,
                f2d_map=f2d_map)


def _sub8x8_refined_vec(blk, bw4, bh4, ssh, ssv, has_chroma, rf):
    """Vectorized is_sub8x8 refinement (tpu_inter.py:458-465 /
    recon_tmpl.c:1703): neighbour inter-ness gathered from rf.ref.
    Negative-index wrap matches the per-block Python semantics."""
    from . import plan_vec as pv
    cand = has_chroma & ((bw4 == ssh) | (bh4 == ssv))
    if not cand.any():
        return cand
    idx = np.nonzero(cand)[0]
    by = blk[idx, pv.B_BY]
    bx = blk[idx, pv.B_BX]
    refarr = rf.ref[:, :, 0]
    ok = np.ones(len(idx), bool)
    w1 = bw4[idx] == 1
    h1 = bh4[idx] == ssv
    if w1.any():
        ok &= ~w1 | (refarr[by, bx - 1] > 0)
    if h1.any():
        ok &= ~h1 | (refarr[by - 1, bx] > 0)
    both = w1 & h1
    if both.any():
        ok &= ~both | (refarr[by - 1, bx - 1] > 0)
    out = np.zeros(blk.shape[0], bool)
    out[idx] = ok
    return out


def _plan_obmc(plan, pl, ssh, ssv, coder, fhdr, refs, rf, f2d_map, b,
               scaled_of, scale_step):
    """OBMC lap planning (dav1d recon_tmpl.c obmc:1071)."""
    b_dim = T_BLOCK_DIM[b.bs]
    bw4, bh4 = int(b_dim[0]), int(b_dim[1])
    bx, by = b.bx, b.by
    w4 = min(bw4, coder.bw - bx)
    h4 = min(bh4, coder.bh - by)
    h_mul, v_mul = 4 >> ssh, 4 >> ssv
    dst_y = (by * 4) >> ssv
    dst_x = (bx * 4) >> ssh

    def emit(phase, ow4, mc_h4, cy, cx, src_bx, src_by, d):
        """one lap: MC of (ow4, mc_h4) at (src_bx, src_by) with the
        neighbour's mv/ref, blended at d."""
        rref = int(rf.ref[cy, cx, 0]) - 1
        rmv = (int(rf.mv[cy, cx, 0, 0]), int(rf.mv[cy, cx, 0, 1]))
        f2d = int(f2d_map[cy, cx])
        lw = ow4 * h_mul
        lh = mc_h4 * v_mul
        region_dim = (v_mul * ((mc_h4 * 4 + 1) // 3) if False else 0)
        # region dim for the mask: top laps blend (oh4*v_mul*3)>>2 rows;
        # left laps use the full lap width
        if phase == 0:
            region = d[2]
        else:
            region = lw
        key = (phase, lh, lw, region)
        lst = plan.laps[pl].setdefault(key, [])
        rb = refs[fhdr.refidx[rref]]
        if scaled_of(rref):
            scale, step = scale_step(rref)
            (row, uw, uh, _, _), = _scaled_rows(
                ssh if pl else 0, ssv if pl else 0, (ow4, mc_h4),
                src_bx, src_by, rmv, f2d, rref, scale, step, split=False)
            lst.append(("s", row, (d[0], d[1])))
        else:
            tmp = {}
            _units_for_block_raw(tmp, pl, ssh, ssv, (ow4, mc_h4),
                                 src_bx, src_by, rmv, rref, f2d,
                                 dst=(d[0], d[1]), whole=True)
            (k2, l2), = tmp.items()
            lst.append(("t", l2[0][:6] + k2[2:4], (d[0], d[1])))

    if by > coder.row_start and (pl == 0 or
                                 bw4 * h_mul + bh4 * v_mul >= 16):
        i = 0
        x = 0
        while x < w4 and i < min(int(b_dim[2]), 4):
            cy, cx = by - 1, bx + x + 1
            step4 = max(2, min(16, int(T_BLOCK_DIM[rf.bs[cy, cx]][0])))
            if rf.ref[cy, cx, 0] > 0:
                ow4 = min(step4, bw4)
                oh4 = min(bh4, 16) >> 1
                mc_h4 = (oh4 * 3 + 3) >> 2
                emit(0, ow4, mc_h4, cy, cx, bx + x, by,
                     (dst_y, dst_x + x * h_mul, v_mul * oh4))
                i += 1
            x += step4
    if bx > coder.col_start:
        i = 0
        y = 0
        while y < h4 and i < min(int(b_dim[3]), 4):
            cy, cx = by + y + 1, bx - 1
            step4 = max(2, min(16, int(T_BLOCK_DIM[rf.bs[cy, cx]][1])))
            if rf.ref[cy, cx, 0] > 0:
                ow4 = min(bw4, 16) >> 1
                oh4 = min(step4, bh4)
                emit(1, ow4, oh4, cy, cx, bx, by + y,
                     (dst_y + y * v_mul, dst_x, 0))
                i += 1
            y += step4


class BuiltFrame:
    """Output of build_frame_program: the frame's fused device program
    plus everything execute_frame_program needs. Holds only entropy-
    stage products and reference IDENTITY — no reference pixels — so it
    can be built for frame N+1 while frame N is still executing (the
    second leg of the host/device software pipeline)."""
    __slots__ = ("prog", "ref_desc", "hres_meta", "device_blocks",
                 "ii_blocks", "intra_frame", "full_device", "dd_per")


def recon_frame_tpu(seq, fhdr, coders, bufs, refs, jnt_weights=None,
                    keep_device=False):
    """Device-batched inter reconstruction; mutates bufs.planes."""
    built = build_frame_program(seq, fhdr, coders, bufs, refs,
                                jnt_weights, keep_device=keep_device)
    return execute_frame_program(built, seq, fhdr, coders, bufs, refs,
                                 jnt_weights, keep_device=keep_device)


def build_frame_program(seq, fhdr, coders, bufs, refs, jnt_weights=None,
                        keep_device=False, schema: ProgramSchema = None,
                        intra_engine=False):
    """Plan + pack the whole per-frame device pixel stage. Reads only
    entropy products (blocks/coefs/refmvs) and reference METADATA
    (dims/slots) — reference pixels are bound later by
    execute_frame_program, so this can run ahead of the in-order pixel
    worker. `schema` (one per Decoder) canonicalizes the packing so
    successive frames reuse ONE compiled program; see ProgramSchema."""
    bd = seq.bitdepth
    cur_w, cur_h = fhdr.width[0], fhdr.height
    ss_hor, ss_ver = bufs.ss_hor, bufs.ss_ver
    n_planes = len(bufs.planes)
    intra_frame = fhdr.frame_type in (0, 2)
    if intra_frame:
        # intra programs are tiny (hres batches only) and have no MC
        # planes; keep them out of the inter schema's case unions
        schema = None
    from ..ops.ref.wedge import wedge_mask

    from ..utils.trace import trace_scope
    import contextlib
    _scopes = []

    def _phase(name):
        while _scopes:
            _scopes.pop().__exit__(None, None, None)
        c = trace_scope(f"recon.{name}")
        c.__enter__()
        _scopes.append(c)

    plan = _FramePlan(n_planes)
    device_blocks = set()
    ii_blocks = set()   # device put + decode-order inter-intra blend
    _phase("plan")

    def ref_of(i):
        return refs[fhdr.refidx[i]]

    def scaled_of(i):
        rb = ref_of(i)
        return rb.width != cur_w or rb.height != cur_h

    def scale_step(i):
        rb = ref_of(i)
        sx = _scale_fac(rb.width, cur_w)
        sy = _scale_fac(rb.height, cur_h)
        return (sx, sy), ((sx + 8) >> 4, (sy + 8) >> 4)

    def plan_put(pl, b_dims, bx, by, mv, f2d, ref_i, ssh, ssv, dst=None):
        if scaled_of(ref_i):
            scale, step = scale_step(ref_i)
            h_mul = 4 >> (ssh if pl else 0)
            v_mul = 4 >> (ssv if pl else 0)
            base = dst if dst is not None else (by * v_mul, bx * h_mul)
            for row, uw, uh, oy, ox in _scaled_rows(
                    ssh if pl else 0, ssv if pl else 0, b_dims, bx, by,
                    mv, f2d, ref_i, scale, step):
                plan.scaled_put[pl].setdefault((uw, uh, ref_i),
                                               []).append(
                    (row, base[0] + oy, base[1] + ox))
        else:
            _units_for_block_raw(plan.put[pl], pl, ssh, ssv, b_dims, bx,
                                 by, mv, ref_i, f2d, dst=dst)

    # decode-order host state (dav1d t->tl_4x4_filter + filter map)
    f2d_map = np.zeros((coders[0].bh, coders[0].bw), np.uint8)
    tl_4x4_filter = [0]

    # vectorized bulk planning: the plain translational majority is
    # planned as numpy array programs over the native walk's dense
    # records; the per-block loop below then visits ONLY the special
    # shapes (see _vec_plan). `vec is None` keeps the original
    # all-blocks walk for Python-entropy streams.
    vec = None
    if (not intra_frame and _vec_plan_enabled() and
            all(getattr(c, "native_arrays", None) is not None
                for c in coders)):
        vec = _vec_plan(fhdr, coders, refs, plan, n_planes, ss_hor,
                        ss_ver, cur_w, cur_h)
        if vec is not None:
            f2d_map = vec["f2d_map"]

    for ci, coder in enumerate(coders):
        if intra_frame:
            break
        rf = coder.rf
        for bi in (vec["special"][ci] if vec is not None
                   else range(len(coder.blocks))):
            bi = int(bi)
            b = coder.blocks[bi]
            cls = _block_device_class(fhdr, coder, b, refs, cur_w, cur_h)
            b_dim = T_BLOCK_DIM[b.bs]
            bw4, bh4 = int(b_dim[0]), int(b_dim[1])
            bx, by = b.bx, b.by
            if cls is None:
                if not b.intra:
                    if b.comp_type == COMP_INTER_NONE:
                        tl_4x4_filter[0] = b.filter2d
                    f2d_map[by:by + bh4, bx:bx + bw4] = b.filter2d
                continue
            if b.interintra_type:
                # put planned below; the intra blend + residual stay
                # decode-order host work (native_recon / _recon_b_inter)
                ii_blocks.add((ci, bi))
            else:
                device_blocks.add((ci, bi))
            has_chroma = (n_planes > 1 and
                          (bw4 > ss_hor or bx & 1) and
                          (bh4 > ss_ver or by & 1))

            if cls == "single":
                scaled = scaled_of(b.ref[0])
                warp_wm = None
                if min(bw4, bh4) > 1:
                    if b.motion_mode == 2 and b.warp is not None and \
                            b.warp.type > 1:
                        warp_wm = b.warp
                    elif b.inter_mode == 2:  # GLOBALMV
                        warp_wm = _gmv_warp_params(fhdr, b.ref[0], scaled)
                use_warp = warp_wm is not None

                if use_warp:
                    for row, sy, sx in _warp_rows(0, 0, warp_wm, bx, by,
                                                  bw4, bh4, b.ref[0]):
                        plan.warp_put[0].append(
                            (row, by * 4 + sy, bx * 4 + sx))
                else:
                    if vec is None or scaled:
                        # plain translational luma is vector-planned
                        plan_put(0, (bw4, bh4), bx, by, b.mv[0],
                                 b.filter2d, b.ref[0], 0, 0)
                    if b.motion_mode == 1:  # OBMC
                        _plan_obmc(plan, 0, 0, 0, coder, fhdr, refs, rf,
                                   f2d_map, b, scaled_of, scale_step)

                if has_chroma:
                    cbw4 = (bw4 + ss_hor) >> ss_hor
                    cbh4 = (bh4 + ss_ver) >> ss_ver
                    is_sub8x8 = bw4 == ss_hor or bh4 == ss_ver
                    if is_sub8x8:
                        if bw4 == 1:
                            is_sub8x8 &= rf.ref[by, bx - 1, 0] > 0
                        if bh4 == ss_ver:
                            is_sub8x8 &= rf.ref[by - 1, bx, 0] > 0
                        if bw4 == 1 and bh4 == ss_ver:
                            is_sub8x8 &= rf.ref[by - 1, bx - 1, 0] > 0
                    if is_sub8x8:
                        # neighbour-MV chroma MC quadrants (dav1d
                        # recon_tmpl.c:1703-1747)
                        uvx = (bx >> ss_hor) * 4
                        uvy = (by >> ss_ver) * 4
                        h_off = v_off = 0

                        def sub_mc(cy, cx, dyo, dxo, f2d_val):
                            rref = int(rf.ref[cy, cx, 0]) - 1
                            rmv = (int(rf.mv[cy, cx, 0, 0]),
                                   int(rf.mv[cy, cx, 0, 1]))
                            for pl in (1, 2):
                                plan_put(pl, (bw4, bh4), cx, cy, rmv,
                                         f2d_val, rref, ss_hor, ss_ver,
                                         dst=(uvy + dyo, uvx + dxo))

                        tl_val = (tl_4x4_filter[0] if vec is None
                                  else int(vec["tl"][ci][bi]))
                        if bw4 == 1 and bh4 == ss_ver:
                            sub_mc(by - 1, bx - 1, 0, 0, tl_val)
                            v_off, h_off = 2, 2
                        if bw4 == 1:
                            sub_mc(by, bx - 1, v_off, 0,
                                   int(f2d_map[by, bx - 1]))
                            h_off = 2
                        if bh4 == ss_ver:
                            sub_mc(by - 1, bx, 0, h_off,
                                   int(f2d_map[by - 1, bx]))
                            v_off = 2
                        for pl in (1, 2):
                            plan_put(pl, (bw4, bh4), bx, by, b.mv[0],
                                     b.filter2d, b.ref[0], ss_hor,
                                     ss_ver, dst=(uvy + v_off,
                                                  uvx + h_off))
                    elif use_warp and min(cbw4, cbh4) > 1:
                        for pl in (1, 2):
                            for row, sy, sx in _warp_rows(
                                    ss_hor, ss_ver, warp_wm, bx, by, bw4,
                                    bh4, b.ref[0]):
                                plan.warp_put[pl].append(
                                    (row, ((by * 4) >> ss_ver) + sy,
                                     ((bx * 4) >> ss_hor) + sx))
                    else:
                        for pl in (1, 2):
                            if vec is None or use_warp or scaled:
                                # plain translational chroma is
                                # vector-planned
                                plan_put(pl, (bw4 << (bw4 == ss_hor),
                                              bh4 << (bh4 == ss_ver)),
                                         bx & ~ss_hor, by & ~ss_ver,
                                         b.mv[0], b.filter2d, b.ref[0],
                                         ss_hor, ss_ver)
                            if not use_warp and b.motion_mode == 1:
                                _plan_obmc(plan, pl, ss_hor, ss_ver,
                                           coder, fhdr, refs, rf,
                                           f2d_map, b, scaled_of,
                                           scale_step)
                if vec is None:
                    tl_4x4_filter[0] = b.filter2d
            else:
                # compound (dav1d recon_tmpl.c:1822-1907)
                def side(i, pl, ssh, ssv):
                    wm = _gmv_warp_params(fhdr, b.ref[i],
                                          scaled_of(b.ref[i])) \
                        if b.inter_mode == 6 else None
                    cbw4c = (bw4 + ssh) >> ssh
                    cbh4c = (bh4 + ssv) >> ssv
                    if wm is not None and (pl == 0 or
                                           min(cbw4c, cbh4c) > 1):
                        return ("w", _warp_rows(ssh, ssv, wm, bx, by,
                                                bw4, bh4, b.ref[i]))
                    if scaled_of(b.ref[i]):
                        scale, step = scale_step(b.ref[i])
                        return ("s", _scaled_rows(ssh, ssv, (bw4, bh4),
                                                  bx, by, b.mv[i],
                                                  b.filter2d, b.ref[i],
                                                  scale, step))
                    return ("t", (b.ref[i], b.mv[i], b.filter2d))

                jw = 8
                if b.comp_type == COMP_INTER_WEIGHTED_AVG:
                    jw = jnt_weights[b.ref[0]][b.ref[1]]
                join = {COMP_INTER_AVG: ("avg", 8),
                        COMP_INTER_WEIGHTED_AVG: ("wavg", jw),
                        3: ("seg", 0),
                        4: ("wedge", b.wedge_idx)}[b.comp_type]
                entry = dict(sides=[side(0, 0, 0, 0), side(1, 0, 0, 0)],
                             join=join, sign=b.mask_sign,
                             dst=(by * 4, bx * 4), bs=b.bs,
                             dims=(bw4, bh4), pos=(bx, by))
                plan.comp[0].setdefault((bw4 * 4, bh4 * 4),
                                        []).append(entry)
                if has_chroma:
                    for pl in (1, 2):
                        centry = dict(
                            sides=[side(0, pl, ss_hor, ss_ver),
                                   side(1, pl, ss_hor, ss_ver)],
                            join=join, sign=b.mask_sign,
                            dst=((by * 4) >> ss_ver, (bx * 4) >> ss_hor),
                            bs=b.bs, dims=(bw4, bh4), pos=(bx, by),
                            luma=entry)
                        plan.comp[pl].setdefault(
                            ((bw4 * 4) >> ss_hor, (bh4 * 4) >> ss_ver),
                            []).append(centry)
            if vec is None:
                f2d_map[by:by + bh4, bx:bx + bw4] = b.filter2d

    _phase("ref-upload")
    # --- reference sources ---
    # The per-plane 7-slot stacks and scaled-ref views are assembled
    # INSIDE the fused program from deduped source buffers (zero
    # dispatches); a source is the device copy a previous frame's filter
    # chain left behind (rb.dev_planes) or — when a ref was decoded on
    # the host path — its numpy plane, uploaded in its native dtype.
    # Only the (buffer, plane) IDENTITY is recorded here; the actual
    # handles are bound by execute_frame_program, after the in-order
    # pixel worker has finished producing those reference pixels.
    ref_desc = []
    _src_ids = {}

    def _src(rb, pl):
        k = (id(rb), pl)
        if k not in _src_ids:
            ref_desc.append((rb, pl))
            _src_ids[k] = len(ref_desc) - 1
        return _src_ids[k]

    refspec = []
    sref_keys = []
    srefspec = []
    for pl in range(n_planes if not intra_frame else 0):
        ssh = ss_hor if pl else 0
        ssv = ss_ver if pl else 0
        w_vis = (cur_w + ssh) >> ssh
        h_vis = (cur_h + ssv) >> ssv
        slots = []
        for i in range(7):
            rb = refs[fhdr.refidx[i]]
            if rb is None or rb.width != cur_w or rb.height != cur_h:
                if rb is not None and (pl, i) not in sref_keys:
                    w_v = (rb.width + ssh) >> ssh
                    h_v = (rb.height + ssv) >> ssv
                    sref_keys.append((pl, i))
                    srefspec.append((_src(rb, pl), h_v, w_v))
                slots.append(-1)
            else:
                slots.append(_src(rb, pl))
        refspec.append(((h_vis, w_vis), tuple(slots)))

    _phase("pack")
    # --- pack the WHOLE device pixel stage into one fused program ---
    # (models/frame_exec: one descriptor upload + one dispatch per frame
    # signature; this loop only builds numpy arrays + static op records)
    from .frame_exec import FrameProgram, run_frame_program, pack_put_case
    sref_idx = {k: i for i, k in enumerate(sref_keys)}
    prog = FrameProgram(
        n_planes, bd,
        [] if intra_frame else [p.shape for p in bufs.planes],
        refspec, srefspec,
        out_dtype=None if intra_frame else bufs.planes[0].dtype)

    def _cases(family, cases, dummy):
        """Iterate case keys: this frame's, or (with a schema) the
        grow-only union — absent keys get `dummy(key)` payloads whose
        destinations are PAD_OOB, so scatter drops them exactly."""
        if schema is None:
            for key in sorted(cases):
                yield key, cases[key]
            return
        for key in schema.union(family, cases.keys()):
            got = cases.get(key)
            yield key, (got if got is not None and len(got)
                        else dummy(key))

    def _padn(key, n, extra=0):
        return schema.pad(key, n, extra) if schema is not None \
            else _p2(n + extra)

    # translational put batches
    def _dummy_put(key):
        uw, uh, hh, hv = key
        return [(0, 0, 0, 8 * bool(hh), 8 * bool(hv), 0, PAD_OOB, 0)]

    for pl in range(0 if intra_frame else n_planes):
        merged_put = dict(plan.put[pl])
        for key, varr in plan.put_vec[pl].items():
            got = merged_put.get(key)
            merged_put[key] = (varr if got is None else np.concatenate(
                [varr, np.asarray(got, np.int32).reshape(-1, 8)]))
        for key, lst in _cases(("put", pl), merged_put, _dummy_put):
            arr = np.asarray(lst, np.int32).reshape(-1, 8)
            arr = _pad_rows(arr, 6, _padn(("put", pl, key),
                                          arr.shape[0]))
            pack_put_case(prog, pl, key, arr,
                          combos_pad=(
                              None if schema is None else
                              (lambda n, _k=("combos", pl, key):
                               schema.combos_pad(_k, n))))

    # warp put batches (presence sticky via schema: a frame without
    # warp blocks still emits the schema-sized all-OOB batch)
    _dummy_warp = [(np.zeros(10, np.int32) + np.asarray(
        [0, 8, 8, 0, 0, 0, 0, 0, 0, 0], np.int32), PAD_OOB, 0)]
    for pl in range(0 if intra_frame else n_planes):
        wl = plan.warp_put[pl]
        if schema is not None:
            if not schema.union(("warpp", pl), [1] if wl else []):
                continue
            if not wl:
                wl = _dummy_warp
        elif not wl:
            continue
        P = _padn(("warp", pl), len(wl))
        rows = _pad_rows(np.asarray([r for r, _, _ in wl], np.int32),
                         None, P)
        ys = _pad_vec(np.asarray([y for _, y, _ in wl], np.int32),
                      True, P)
        xs = _pad_vec(np.asarray([x for _, _, x in wl], np.int32),
                      False, P)
        prog.op("warp", pl, prog.emit(rows), prog.emit(ys),
                prog.emit(xs))

    # scaled put batches. Scaled-ref cases stay per-frame (no schema
    # union): their sref views exist only while that reference's
    # geometry mismatches, so a sticky dummy could reference a vanished
    # buffer; resolution-change frames just recompile.
    for pl in range(0 if intra_frame else n_planes):
        for (uw, uh, ref_i), lst in sorted(plan.scaled_put[pl].items()):
            P = _padn(("scaled", pl, uw, uh, ref_i), len(lst))
            rows = np.asarray([r for r, _, _ in lst], np.int32)
            rows[:, 0] = 0
            rows = _pad_rows(rows, None, P)
            ys = _pad_vec(np.asarray([y for _, y, _ in lst], np.int32),
                          True, P)
            xs = _pad_vec(np.asarray([x for _, _, x in lst], np.int32),
                          False, P)
            prog.op("scaled", pl, sref_idx[(pl, ref_i)], uw, uh,
                    prog.emit(rows), prog.emit(ys), prog.emit(xs))

    # compound batches (luma first: seg chroma masks derive from the
    # luma preps)
    def _pack_side(pl, bwp, bhp, group, i, ssh, ssv, ckey):
        tcases, wunits, sunits = {}, [], {}
        for slot, e in enumerate(group):
            kind, payload = e["sides"][i]
            if kind == "t":
                ref_i, mv, f2d = payload
                tmp2 = {}
                _units_for_block_raw(tmp2, pl, ssh, ssv, e["dims"],
                                     e["pos"][0], e["pos"][1], mv,
                                     ref_i, f2d, whole=True)
                (k2, l2), = tmp2.items()
                tcases.setdefault(k2[2:4], []).append((slot, l2[0]))
            elif kind == "w":
                for row, sy, sx in payload:
                    wunits.append((slot, row, sy, sx))
            else:
                for row, uw, uh, sy, sx in payload:
                    sunits.setdefault((uw, uh, row[0]), []).append(
                        (slot, row, sy, sx))
        subops = []
        # slot N-1 is always a pad (its scatter dst is OOB), so dummy
        # sub-ops for schema-union cases can safely write garbage there
        dumm = len(group) - 1

        def _tdummy(k):
            hh, hv = k
            return [(dumm, (0, 0, 0, 8 * bool(hh), 8 * bool(hv), 0))]

        for k, lst in _cases(("compside", pl, ckey, i), tcases,
                             _tdummy):
            hh, hv = k
            P = _padn(("compsideN", pl, ckey, i, k), len(lst))
            arr = _pad_rows(np.asarray([u[:6] for _, u in lst],
                                       np.int32), None, P)
            slots = _pad_vec(np.asarray([s for s, _ in lst], np.int32),
                             False, P)
            subops.append(("t", bool(hh), bool(hv), prog.emit(arr),
                           prog.emit(slots)))
        if schema is not None:
            if schema.union(("compsideW", pl, ckey, i),
                            [1] if wunits else []) and not wunits:
                wunits = [(dumm, np.asarray(
                    [0, 8, 8, 0, 0, 0, 0, 0, 0, 0], np.int32), 0, 0)]
        if wunits:
            P = _padn(("compsideWN", pl, ckey, i), len(wunits))
            rows = _pad_rows(np.asarray([r for _, r, _, _ in wunits],
                                        np.int32), None, P)
            base = _pad_vec(np.asarray(
                [s * bhp * bwp + sy * bwp + sx
                 for s, _, sy, sx in wunits], np.int32), False, P)
            subops.append(("w", prog.emit(rows), prog.emit(base)))
        for (uw, uh, ref_i), lst in sorted(sunits.items()):
            P = _padn(("compsideS", pl, ckey, i, uw, uh, ref_i),
                      len(lst))
            rows = np.asarray([r for _, r, _, _ in lst], np.int32)
            rows[:, 0] = 0
            rows = _pad_rows(rows, None, P)
            base = _pad_vec(np.asarray(
                [s * bhp * bwp + sy * bwp + sx
                 for s, _, sy, sx in lst], np.int32), False, P)
            subops.append(("s", sref_idx[(pl, ref_i)], uw, uh,
                           prog.emit(rows), prog.emit(base)))
        return tuple(subops)

    def _dummy_comp(key):
        bwp, bhp = key
        return []    # group padding below synthesizes the pad entries

    for pl in range(0 if intra_frame else n_planes):
        ssh = ss_hor if pl else 0
        ssv = ss_ver if pl else 0
        for key, group in _cases(("comp", pl), plan.comp[pl],
                                 _dummy_comp):
            bwp, bhp = key
            if not group:   # schema-union dummy case
                group = [dict(
                    sides=[("t", (0, (0, 0), 0)), ("t", (0, (0, 0), 0))],
                    join=("avg", 8), sign=0, dst=(PAD_OOB, 0), bs=0,
                    dims=((bwp << ssh) // 4, (bhp << ssv) // 4),
                    pos=(0, 0))]
            # shape-stabilize: pad the group with copies of the last
            # entry whose destination is OOB (scatter drops them);
            # always reserve >=1 pad so slot N-1 is sacrificial
            npad = _padn(("compN", pl, key), len(group), 1) - len(group)
            last = group[-1]
            group = group + [dict(last, dst=(PAD_OOB, 0))
                             for _ in range(npad)]
            N = len(group)
            sides = tuple(_pack_side(pl, bwp, bhp, group, i, ssh, ssv,
                                     key)
                          for i in (0, 1))

            joins = []
            idx_by_kind = {}
            for slot, e in enumerate(group):
                idx_by_kind.setdefault(e["join"][0], []).append(slot)
            # "wavg"/"avg" and "wedge" kinds are schema-sticky (absent
            # ones join into the sacrificial slot N-1); seg stays
            # per-frame (its chroma spec references luma batch state)
            dummy_kinds = set()
            if schema is not None:
                kinds_u = schema.union(
                    ("compjoinK", pl, key),
                    [k for k in idx_by_kind if k in ("avg", "wavg",
                                                     "wedge")])
                for k in kinds_u:
                    if k not in idx_by_kind:
                        idx_by_kind[k] = [N - 1]
                        dummy_kinds.add(k)
            for kind, slots in sorted(idx_by_kind.items()):
                P = _padn(("compjoinN", pl, key, kind), len(slots))
                slots = slots + [slots[-1]] * (P - len(slots))
                h_sl = prog.emit(np.asarray(slots, np.int32))
                h_sgn = prog.emit(np.asarray(
                    [group[s]["sign"] for s in slots], np.int32))
                if kind in ("avg", "wavg"):
                    h_w = prog.emit(np.asarray(
                        [group[s]["join"][1] for s in slots], np.int32))
                    joins.append(("wavg", h_sl, h_w))
                elif kind == "seg":
                    if pl == 0:
                        cmid = prog.new_cm()
                        joins.append(("segl", h_sl, h_sgn, cmid))
                        # defer per-slot slicing: chroma gathers rows
                        # from the registered luma mask batch
                        for j, s in enumerate(slots):
                            group[s]["cmask"] = (cmid, j)
                    else:
                        crefs = [group[s]["luma"]["cmask"]
                                 for s in slots]
                        if all(r[0] == crefs[0][0] for r in crefs):
                            spec = ("one", crefs[0][0], prog.emit(
                                np.asarray([r[1] for r in crefs],
                                           np.int32)))
                        else:   # slots span several luma batches
                            spec = ("mix", tuple(crefs))
                        joins.append(("segc", h_sl, h_sgn, spec))
                else:  # wedge
                    if kind in dummy_kinds:
                        # schema-union dummy: all slots point at the
                        # sacrificial pad (dst OOB); any mask works and
                        # the pad entry's bs may not be a wedge size
                        masks = np.zeros((len(slots), bhp, bwp),
                                         np.int32)
                    elif pl == 0:
                        masks = np.stack([
                            wedge_mask(0, group[s]["bs"], 0,
                                       group[s]["join"][1])
                            [:bhp, :bwp] for s in slots]).astype(np.int32)
                    else:
                        chr_idx = ss_hor + ss_ver
                        masks = np.stack([
                            wedge_mask(chr_idx, group[s]["bs"],
                                       group[s]["sign"],
                                       group[s]["join"][1])
                            [:bhp, :bwp] for s in slots]).astype(np.int32)
                    joins.append(("wedge", h_sl, h_sgn,
                                  prog.emit(masks)))

            h_dy = prog.emit(np.asarray([e["dst"][0] for e in group],
                                        np.int32))
            h_dx = prog.emit(np.asarray([e["dst"][1] for e in group],
                                        np.int32))
            prog.op("comp", pl, bwp, bhp, N, sides, tuple(joins),
                    ss_hor, ss_ver, h_dy, h_dx)

    # OBMC lap batches (after ALL puts; top phase, then left)
    def _dummy_lap(key):
        return [("t", (0, 0, 0, 8, 8, 0, 1, 1), (PAD_OOB, 0))]

    for phase in (0, 1):
        for pl in range(0 if intra_frame else n_planes):
            for (ph_, lh, lw, region), lst in _cases(
                    ("obmc", pl, phase), plan.laps[pl], _dummy_lap):
                if ph_ != phase:
                    continue
                okey = (pl, ph_, lh, lw, region)
                lk, lr, _ = lst[-1]
                # extra=1 reserves a sacrificial pad so slot nL-1 is
                # NEVER a real lap: schema-union dummy t-cases
                # (_tdummy2) target slot nL-1, and side_tmp's
                # last-write-wins set_slots would otherwise overwrite a
                # real lap's MC unit when a bucket exactly fills pow2
                # (mirrors the compN reservation below)
                nL = _padn(("obmcN",) + okey, len(lst), 1)
                lst = lst + [(lk, lr, (PAD_OOB, 0))] * (nL - len(lst))
                tcases, sunits = {}, {}
                for slot, (kind, row, d) in enumerate(lst):
                    if kind == "t":
                        tcases.setdefault(tuple(row[6:8]), []).append(
                            (slot, row[:6]))
                    else:
                        sunits.setdefault((row[0],), []).append(
                            (slot, row))
                subops = []

                def _tdummy2(k):
                    hh, hv = k
                    return [(nL - 1,
                             (0, 0, 0, 8 * bool(hh), 8 * bool(hv), 0))]

                for (hh, hv), l2 in _cases(("obmcT",) + okey, tcases,
                                           _tdummy2):
                    P = _padn(("obmcTN",) + okey + (hh, hv), len(l2))
                    arr = _pad_rows(np.asarray([u for _, u in l2],
                                               np.int32), None, P)
                    slots = _pad_vec(
                        np.asarray([s for s, _ in l2], np.int32),
                        False, P)
                    subops.append(("t", bool(hh), bool(hv),
                                   prog.emit(arr), prog.emit(slots)))
                for (ref_i,), l2 in sorted(sunits.items()):
                    P = _padn(("obmcS",) + okey + (ref_i,), len(l2))
                    rows = np.asarray([r for _, r in l2], np.int32)
                    rows[:, 0] = 0
                    rows = _pad_rows(rows, None, P)
                    # full-slot writes expressed as sub-rect scatters at
                    # base offset slot*lh*lw (same semantics as set_slots)
                    base = _pad_vec(
                        np.asarray([s * lh * lw for s, _ in l2],
                                   np.int32), False, P)
                    subops.append(("s", sref_idx[(pl, ref_i)], lw, lh,
                                   prog.emit(rows), prog.emit(base)))
                h_ys = prog.emit(np.asarray([d[0] for _, _, d in lst],
                                            np.int32))
                h_xs = prog.emit(np.asarray([d[1] for _, _, d in lst],
                                            np.int32))
                prog.op("obmc", pl, lh, lw,
                        region if phase == 0 else lw, phase == 1, nL,
                        tuple(subops), h_ys, h_xs)

    _phase("residuals")
    # --- residual inverse transforms, ALL blocks ---
    # Device-covered inter blocks scatter-add straight onto the plane
    # (their prediction is already there). Every other block — intra,
    # intrabc, host-fallback inter — gets its residual batch-computed on
    # device too and handed to the host walk via a (plane, y, x) map:
    # prediction needs reconstructed neighbours (sequential), but the
    # inverse transforms (the FLOPs) depend only on coefficients.
    # Buckets are keyed by (plane, tx SIZE) only — the transform TYPE is
    # per-block data consumed by the type-as-data itx kernel
    # (ops/itx.itx_residual_multi). This collapses dav1d's
    # itxfm_add[19][17] bucket explosion (hundreds of ops + a fresh
    # program signature per frame) to <=19 ops per plane with stable
    # signatures. WHT (lossless 4x4) keeps its dedicated bucket.
    from ..ops.itx import itx_multi_sel
    from ..ops.itx_meta import WHT_WHT
    from .plan_vec import (ResidBucket, plan_residuals_vec, B_INTRA,
                           B_SKIP)
    # ---- mixed-frame device intra (wavefront engine) eligibility ----
    # Every non-intra block must be device-covered (dd 1) and there may
    # be no inter-intra blends (dd 2, host decode-order work): intra
    # units' edges must only ever read pixels the device itself
    # produced. Eligible intra blocks are re-marked dd=3; their
    # residuals feed the engine's residual planes instead of the
    # host-map (hres) path, and the frame becomes full_device — no
    # plane download, no host walk.
    eng = bool(intra_engine and not intra_frame and vec is not None
               and keep_device)
    if eng:
        for ci, coder in enumerate(coders):
            blk = coder.native_arrays[0]
            dd = vec["dd_per"][ci]
            intra_m = blk[:, B_INTRA] != 0
            if ((dd == 2).any() or
                    ((dd == 0) & ~intra_m).any()):
                eng = False
                break
        if eng:
            for ci, coder in enumerate(coders):
                blk = coder.native_arrays[0]
                dd = vec["dd_per"][ci]
                dd[(dd == 0) & (blk[:, B_INTRA] != 0)] = 3
    rplans = hplans = iplans = None
    if vec is not None:
        rv = plan_residuals_vec(coders, vec["dd_per"])
        if rv is not None:
            rplans, hplans, iplans = rv
    if rplans is None and eng:
        # vectorized residual bucketing unavailable: undo the engine
        # marking so the per-block fallback routes intra to the host
        eng = False
        for dd in vec["dd_per"]:
            dd[dd == 3] = 0
    if rplans is None:
        rplans = {}     # scatter-add buckets
        hplans = {}     # host-map buckets
        for ci, coder in enumerate(coders):
            dd = vec["dd_per"][ci] if vec is not None else None
            for bi, b in enumerate(coder.blocks):
                if b.skip:
                    continue
                is_dev = (dd[bi] == 1) if dd is not None \
                    else (ci, bi) in device_blocks
                dst = rplans if is_dev else hplans
                for cj in range(b.coef_lo, b.coef_hi):
                    cb = coder.coefs[cj]
                    if cb.eob < 0:
                        continue
                    key = (cb.plane, cb.tx, True) if cb.txtp == WHT_WHT \
                        else (cb.plane, cb.tx, False)
                    dst.setdefault(key, []).append(
                        (cb.cf, cb.y * 4, cb.x * 4, ci, cj, cb.txtp))

    _dummy_resid = lambda key: []   # noqa: E731 — zero real entries

    # scatter-add buckets: part of the fused program (the descriptor
    # buffer is the frame's single upload, coefficients included)
    from ..ops.itx_meta import TX_INFO as _TXI

    # Sparse/dense split threshold: measured nnz distribution at 1080p
    # q=80 is p90 ~ 8, max ~ 400 (PROFILE_r05) — one dense block per
    # bucket would force K to ~512 for the whole batch, a ~50x padding
    # waste. Blocks with <= KS nonzeros ride the K=KS lanes; the rare
    # dense tail gets its own sub-bucket.
    KS_SPARSE = 16

    def _emit_compact_cf(cf, kkey):
        """Sparse coefficient upload (frame_exec.compact_cf): dense tx
        blocks are mostly zeros past the eob, and on the tunneled TPU
        every descriptor byte is frame time — upload (vals, pos) of
        the nonzeros only; K is schema-padded so the signature stays
        frame-invariant. Returns (h_vals, h_pos, K)."""
        from .frame_exec import compact_cf
        vals, pos, K = compact_cf(cf)
        S = cf.shape[1] * cf.shape[2]
        Kp = _padn(kkey, K)
        if Kp > K:
            vals = np.pad(vals, ((0, 0), (0, Kp - K)))
            pos = np.pad(pos, ((0, 0), (0, Kp - K)),
                         constant_values=S)
        # 8 bpc coefficient values fit int16 (dav1d's own 8bpc coef
        # type); positions always do (S <= 1024)
        h_vals = prog.emit16(vals) if bd == 8 else prog.emit(vals)
        return h_vals, prog.emit16(pos), Kp

    def _split_sparse(cf_real):
        """(idx_sparse, idx_dense): real-row partition by nnz."""
        if not cf_real.shape[0]:
            z = np.zeros(0, np.int64)
            return z, z
        nnz = (cf_real.reshape(cf_real.shape[0], -1) != 0).sum(axis=1)
        sp = nnz <= KS_SPARSE
        return np.nonzero(sp)[0], np.nonzero(~sp)[0]

    def _bucket_rows(lst, B):
        """(cf (B,sh,sw), ys, xs, sel) real rows of a bucket."""
        if isinstance(lst, ResidBucket):
            return (lst.cf, lst.ys, lst.xs, lst.sel)
        cf = np.stack([e[0] for e in lst]) if B else None
        ys = np.fromiter((e[1] for e in lst), np.int32, B)
        xs = np.fromiter((e[2] for e in lst), np.int32, B)
        sel = np.zeros((B, 2), np.int32)
        return cf, ys, xs, sel

    for (pl, tx, is_wht), lst in _cases(("residm",), rplans,
                                        _dummy_resid):
        w_t, h_t, _ = _TXI[tx]
        sh, sw = min(h_t, 32), min(w_t, 32)
        B = len(lst)
        P = _padn(("residmN", pl, tx, is_wht), B)
        cf = np.zeros((P, sh, sw), np.int32)
        ys = np.full(P, PAD_OOB, np.int32)
        xs = np.zeros(P, np.int32)
        sel = np.zeros((P, 2), np.int32)
        if isinstance(lst, ResidBucket):
            cf[:B] = lst.cf
            ys[:B] = lst.ys
            xs[:B] = lst.xs
            sel[:B] = lst.sel
        elif B:
            cf[:B] = np.stack([e[0] for e in lst])
            ys[:B] = np.fromiter((e[1] for e in lst), np.int32, B)
            xs[:B] = np.fromiter((e[2] for e in lst), np.int32, B)
            for i, e in enumerate(lst):
                sel[i] = itx_multi_sel(tx, e[5]) if not is_wht else 0
        # sparse/dense sub-buckets (see KS_SPARSE): the dense tail is
        # schema-sticky so its presence never flips the signature
        idx_s, idx_d = _split_sparse(cf[:B])
        has_d = bool(schema.union(("residD", pl, tx, is_wht),
                                  [1] if len(idx_d) else [])) \
            if schema is not None else bool(len(idx_d))
        subs = [("s", idx_s)]
        if has_d:
            subs.append(("d", idx_d))
        else:
            subs[0] = ("s", np.arange(B))    # no dense tail ever seen
        for tag, idx in subs:
            Bs = len(idx)
            Ps = _padn(("residmN" + tag, pl, tx, is_wht), Bs)
            cfs2 = np.zeros((Ps, sh, sw), np.int32)
            yss = np.full(Ps, PAD_OOB, np.int32)
            xss = np.zeros(Ps, np.int32)
            sels = np.zeros((Ps, 2), np.int32)
            cfs2[:Bs] = cf[idx]
            yss[:Bs] = ys[idx]
            xss[:Bs] = xs[idx]
            sels[:Bs] = sel[idx]
            h_vals, h_pos, _ = _emit_compact_cf(
                cfs2, ("residmK" + tag, pl, tx, is_wht))
            if is_wht:
                prog.op("residc", pl, sh, sw, tx, WHT_WHT, h_vals,
                        h_pos, prog.emit(yss), prog.emit(xss))
            else:
                prog.op("residmc", pl, sh, sw, tx, h_vals, h_pos,
                        prog.emit(sels[:, 0]), prog.emit(sels[:, 1]),
                        prog.emit(yss), prog.emit(xss))
    # host-map buckets: residuals computed in the same program, fetched
    # after execution for the decode-order host pass
    hres_meta = []

    def _take(lst, idx):
        if isinstance(lst, ResidBucket):
            return ResidBucket(lst.cf[idx], lst.ys[idx], lst.xs[idx],
                               lst.sel[idx], lst.ci[idx], lst.cj[idx])
        return [lst[int(i)] for i in idx]

    for (pl, tx, is_wht), lst in _cases(("hresm",), hplans,
                                        _dummy_resid):
        w_t, h_t, _ = _TXI[tx]
        sh, sw = min(h_t, 32), min(w_t, 32)
        B = len(lst)
        cf_r = np.zeros((B, sh, sw), np.int32)
        sel_r = np.zeros((B, 2), np.int32)
        if isinstance(lst, ResidBucket):
            cf_r[:] = lst.cf
            sel_r[:] = lst.sel
        elif B:
            cf_r[:] = np.stack([e[0] for e in lst])
            for i, e in enumerate(lst):
                sel_r[i] = itx_multi_sel(tx, e[5]) if not is_wht else 0
        idx_s, idx_d = _split_sparse(cf_r)
        has_d = bool(schema.union(("hresD", pl, tx, is_wht),
                                  [1] if len(idx_d) else [])) \
            if schema is not None else bool(len(idx_d))
        subs = [("s", idx_s)]
        if has_d:
            subs.append(("d", idx_d))
        else:
            subs[0] = ("s", np.arange(B))
        for tag, idx in subs:
            Bs = len(idx)
            Ps = _padn(("hresmN" + tag, pl, tx, is_wht), Bs)
            cfs = np.zeros((Ps, sh, sw), np.int32)
            sel = np.zeros((Ps, 2), np.int32)
            cfs[:Bs] = cf_r[idx]
            sel[:Bs] = sel_r[idx]
            h_vals, h_pos, _ = _emit_compact_cf(
                cfs, ("hresmK" + tag, pl, tx, is_wht))
            if is_wht:
                prog.op("hresc", tx, WHT_WHT, sh, sw, h_vals, h_pos)
            else:
                prog.op("hresmc", tx, sh, sw, h_vals, h_pos,
                        prog.emit(sel[:, 0]), prog.emit(sel[:, 1]))
            hres_meta.append((pl, _take(lst, idx)))

    if eng:
        # device intra: every remaining (plain-intra) block
        # reconstructs inside this same program via the wavefront scan;
        # the frame is then full_device — no plane download, no host
        # pass 2 (models/tpu_intra.emit_mixed_intra)
        _phase("intra-plan")
        from .tpu_intra import emit_mixed_intra
        emit_mixed_intra(prog, seq, fhdr, coders, iplans, _padn,
                         _cases, prog.plane_shapes)

    if not intra_frame:
        prog.op("out")   # native-dtype planes: 4x smaller downloads/refs

    total_blocks = sum(len(c.blocks) for c in coders)
    built = BuiltFrame()
    built.prog = prog
    built.ref_desc = ref_desc
    built.hres_meta = hres_meta
    built.device_blocks = device_blocks
    built.ii_blocks = ii_blocks
    built.intra_frame = intra_frame
    built.dd_per = vec["dd_per"] if vec is not None else None
    n_dev = (sum(int(((dd == 1) | (dd == 3)).sum())
                 for dd in vec["dd_per"])
             if vec is not None else len(device_blocks))
    built.full_device = (keep_device and not intra_frame and not hplans
                         and n_dev == total_blocks)
    while _scopes:
        _scopes.pop().__exit__(None, None, None)
    return built


def execute_frame_program(built, seq, fhdr, coders, bufs, refs,
                          jnt_weights=None, keep_device=False):
    """Bind reference pixel buffers, run the fused frame program, and
    finish the frame on the host (download + decode-order pass 2).
    Mutates bufs.planes."""
    from .frame_exec import run_frame_program
    from ..utils.trace import trace_scope
    n_planes = len(bufs.planes)
    intra_frame = built.intra_frame
    full_device = built.full_device
    hres_meta = built.hres_meta
    device_blocks = built.device_blocks
    _scopes = []

    def _phase(name):
        while _scopes:
            _scopes.pop().__exit__(None, None, None)
        c = trace_scope(f"recon.{name}")
        c.__enter__()
        _scopes.append(c)

    _phase("ref-bind")
    # materialize the deduped reference sources recorded at build time
    # (device copies from previous frames' filter chains, or native-
    # dtype uploads of host-decoded planes)
    refsrc = [rb.dev_planes[pl] if rb.dev_planes is not None
              else jnp.asarray(rb.planes[pl])
              for rb, pl in built.ref_desc]
    dev_planes = None

    _phase("execute")
    # ONE upload + ONE dispatch for the whole frame (per signature)
    dev_out, hres = run_frame_program(built.prog, tuple(refsrc))
    if not intra_frame:
        dev_planes = list(dev_out)
    import os as _os2
    if _os2.environ.get("DAV1D_TPU_SYNC_TRACE"):
        # profiling aid: absorb the device execution wait here so the
        # download/host-pass2 scopes below measure pure transfer/walk
        _phase("device-wait")
        import jax as _jax
        for leaf in _jax.tree_util.tree_leaves((dev_out, hres)):
            leaf.block_until_ready()

    _phase("download")
    # When the device covered EVERY block and the caller's filter chain
    # runs on device (keep_device), the pre-filter pixels never need to
    # touch the host: the filter chain downloads the final planes. Only
    # frames with host-pass2 work (intra/inter-intra blocks) download
    # here, because _recon_tile reads/writes around them.
    # copy_to_host_async overlaps the plane and hres transfers with each
    # other (and with remaining device work) instead of serializing one
    # blocking np.asarray per buffer.
    for buf in (hres if intra_frame or full_device
                else tuple(dev_planes) + tuple(hres)):
        try:
            buf.copy_to_host_async()
        except Exception:
            break
    if not intra_frame and not full_device:
        for pl in range(n_planes):
            bufs.planes[pl][...] = np.asarray(dev_planes[pl]).astype(
                bufs.planes[pl].dtype)

    _phase("host-pass2")
    # --- pass 2 (host): intra + uncovered inter blocks in decode order.
    # Native C++ walk (host/native_recon.py) when every host block is
    # plain intra and the dense tile records exist; Python walk
    # (_recon_tile) otherwise (intrabc / inter-intra / Python entropy).
    if not full_device:
        from ..host import native_recon
        done = False
        if native_recon.available() and all(
                getattr(c, "native_arrays", None) is not None
                for c in coders):
            _phase("hres-pack")   # includes the hres download sync
            res_buf, offs = native_recon.pack_residuals(
                coders, hres_meta, hres)
            _phase("native-walk")
            if built.dd_per is not None:
                dd_per = built.dd_per
            else:
                dd_per = [np.zeros(len(c.blocks), np.uint8)
                          for c in coders]
                for (cj, bj) in device_blocks:
                    dd_per[cj][bj] = 1
                for (cj, bj) in built.ii_blocks:
                    dd_per[cj][bj] = 2   # device put, host blend
            done = True
            for ci, coder in enumerate(coders):
                rc = native_recon.recon_tile_native(
                    seq, fhdr, coder, bufs, dd_per[ci], res_buf,
                    offs[ci])
                if rc != 0:
                    done = False
                    break
        if not done:
            _phase("py-walk")
            # the Python fallback walk reads reference HOST planes
            # (host-fallback inter blocks) — wait out any in-flight
            # gather-stage downloads for them (api stage-split)
            from ..api import _wait_host_planes
            _wait_host_planes(refs)
            from .plan_vec import ResidBucket
            residual_map = {}
            for (pl, lst), res in zip(hres_meta, hres):
                res = np.asarray(res)
                if isinstance(lst, ResidBucket):
                    for i in range(len(lst)):
                        residual_map[(pl, int(lst.ys[i]) // 4,
                                      int(lst.xs[i]) // 4)] = res[i]
                else:
                    for i, e in enumerate(lst):
                        residual_map[(pl, e[1] // 4, e[2] // 4)] = res[i]
            for ci, coder in enumerate(coders):
                if built.dd_per is not None:
                    skip_set = set(
                        int(j) for j in
                        np.nonzero(built.dd_per[ci] == 1)[0])
                else:
                    skip_set = {bi for bi in range(len(coder.blocks))
                                if (ci, bi) in device_blocks}
                _recon_tile(seq, fhdr, coder, bufs, refs, jnt_weights,
                            device_done=skip_set, residuals=residual_map)

    # hand the device copies to the filter chain / future ref reads
    # (keep_device: the caller's filter path runs on device, so the
    # copy stays authoritative; when the host pass touched any block,
    # refresh from the numpy planes the host just wrote)
    if keep_device and not intra_frame:
        if not full_device:
            # native-dtype upload (consumers cast to int32 on device)
            dev_planes = [jnp.asarray(p) for p in bufs.planes]
        bufs.dev_planes = dev_planes
    while _scopes:
        _scopes.pop().__exit__(None, None, None)
    return bufs
