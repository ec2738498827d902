"""Tile symbol layer: mirrored decoder/encoder for AV1 block entropy coding.

One implementation of the partition walk, mode decode, and coefficient
decode serves both directions:

* decode mode — the host parse stage: consumes a tile's msac bitstream and
  emits the frame plan (per-block modes + dequantized coefficient blocks)
  for the TPU reconstruction stage.
* encode mode — the test-stream generator: a policy callback picks each
  symbol value; contexts/CDF adaptation evolve identically, so the output
  stream is conformant by construction and is cross-verified against the
  reference decoder binary.

Reference parity (behavior, not code): dav1d src/decode.c (decode_sb:2161,
decode_b:717, read_pal_indices:442), src/recon_tmpl.c (decode_coefs:321,
read_coef_blocks:825), src/env.h context derivations.

Current scope: intra frames (key/intra, no intrabc); inter joins next.
"""
from __future__ import annotations

import numpy as np

from ..data.tables import TABLES, CdfContext
from .intra_edge import (INTRA_EDGE_TREE, EDGE_ALL_TR_AND_BL,
                         EDGE_ALL_TOP_HAS_RIGHT, EDGE_ALL_LEFT_HAS_BOTTOM)
from .headers import (SequenceHeader, FrameHeader, PIXEL_LAYOUT_I400,
                      PIXEL_LAYOUT_I420, PIXEL_LAYOUT_I422,
                      PIXEL_LAYOUT_I444, TX_SWITCHABLE, TX_4X4_ONLY)

# ---- enums (dav1d src/levels.h) ----
N_INTRA_PRED_MODES = 13
(DC_PRED, VERT_PRED, HOR_PRED, DIAG_DOWN_LEFT_PRED, DIAG_DOWN_RIGHT_PRED,
 VERT_RIGHT_PRED, HOR_DOWN_PRED, HOR_UP_PRED, VERT_LEFT_PRED, SMOOTH_PRED,
 SMOOTH_V_PRED, SMOOTH_H_PRED, PAETH_PRED) = range(13)
CFL_PRED = N_INTRA_PRED_MODES
FILTER_PRED = N_INTRA_PRED_MODES

(PARTITION_NONE, PARTITION_H, PARTITION_V, PARTITION_SPLIT,
 PARTITION_T_TOP_SPLIT, PARTITION_T_BOTTOM_SPLIT, PARTITION_T_LEFT_SPLIT,
 PARTITION_T_RIGHT_SPLIT, PARTITION_H4, PARTITION_V4) = range(10)
N_PARTITIONS = 10

BL_128X128, BL_64X64, BL_32X32, BL_16X16, BL_8X8 = range(5)
N_BS_SIZES = 22
BS_4x4 = 21

TX_4X4, TX_8X8, TX_16X16, TX_32X32, TX_64X64 = range(5)
TX_CLASS_2D, TX_CLASS_H, TX_CLASS_V = range(3)
DCT_DCT = 0
IDTX = 9
WHT_WHT = 16

_BS_LIST = [(128, 128), (128, 64), (64, 128), (64, 64), (64, 32), (64, 16),
            (32, 64), (32, 32), (32, 16), (32, 8), (16, 64), (16, 32),
            (16, 16), (16, 8), (16, 4), (8, 32), (8, 16), (8, 8), (8, 4),
            (4, 16), (4, 8), (4, 4)]
CFL_ALLOWED = {i for i, (w, h) in enumerate(_BS_LIST) if w <= 32 and h <= 32}

# ---- spec tables ----
T_BLOCK_DIM = TABLES["block_dimensions"]          # [bs][w4,h4,lw,lh]
T_BLOCK_SIZES = TABLES["block_sizes"]             # [bl][bp][2]
T_AL_PART_CTX = TABLES["al_part_ctx"]             # [2][bl][bp]
T_PART_COUNT = TABLES["partition_type_count"]     # [bl]
T_MAX_TX = TABLES["max_txfm_size_for_bs"]         # [bs][4]
T_TXFM = TABLES["txfm_dimensions"]                # [19][w,h,lw,lh,min,max,sub,ctx]
T_INTRA_MODE_CTX = TABLES["intra_mode_context"]   # [13]
T_YMODE_SIZE_CTX = TABLES["ymode_size_context"]
T_TXTP_FROM_UVMODE = TABLES["txtp_from_uvmode"]
T_TX_TYPES_PER_SET = TABLES["tx_types_per_set"]
T_TX_TYPE_CLASS = TABLES["tx_type_class"]
T_LO_CTX_OFFSETS = TABLES["lo_ctx_offsets"]       # [3][5][5]
T_SKIP_CTX = TABLES["skip_ctx"]                   # [5][5]
T_DQ = TABLES["dq_tbl"]                           # [hbd][256][2]
SCANS = [TABLES[f"scan.{t}"] for t in range(19)]


def iclip_u8(v):
    return max(0, min(255, v))


# ------------------------------------------------------------------
# EC adapters: one tile coder, two directions
# ------------------------------------------------------------------
class DecodeSide:
    is_decode = True

    def __init__(self, msac):
        self.m = msac

    @property
    def rng(self):
        return self.m.rng

    def sym(self, key, cdf, n):
        return self.m.decode_symbol_adapt(cdf, n)

    def bool_adapt(self, key, cdf):
        return self.m.decode_bool_adapt(cdf)

    def boolp(self, key, f):
        return self.m.decode_bool(f)

    def equi(self, key):
        return self.m.decode_bool_equi()

    def bools(self, key, n):
        return self.m.decode_bools(n)

    def hi_tok(self, key, cdf):
        return self.m.decode_hi_tok(cdf)

    def golomb(self, key):
        ln = 0
        while not self.m.decode_bool_equi() and ln < 32:
            ln += 1
        val = 1
        for _ in range(ln):
            val = (val << 1) + self.m.decode_bool_equi()
        return val - 1

    def subexp(self, key, ref, n, k):
        return self.m.decode_subexp(ref, n, k)

    def uniform(self, key, n):
        # dav1d_msac_decode_uniform (msac.h): ns(n) over the arithmetic coder
        assert n > 1
        ln = (n - 1).bit_length()
        m = (1 << ln) - n
        v = self.m.decode_bools(ln - 1)
        return v if v < m else (v << 1) - m + self.m.decode_bool_equi()


class EncodeSide:
    is_decode = False

    def __init__(self, enc, policy):
        self.e = enc
        self.policy = policy

    @property
    def rng(self):
        return self.e.rng

    def sym(self, key, cdf, n):
        v = self.policy(key, n)  # value in [0, n]
        self.e.put_symbol_adapt(v, cdf, n)
        return v

    def bool_adapt(self, key, cdf):
        v = self.policy(key, 1)
        self.e.put_bool_adapt(v, cdf)
        return v

    def boolp(self, key, f):
        v = self.policy(key, 1)
        self.e.put_bool(v, f)
        return v

    def equi(self, key):
        v = self.policy(key, 1)
        self.e.put_bool_equi(v)
        return v

    def bools(self, key, n):
        if n == 0:
            return 0
        v = self.policy(key, (1 << n) - 1)
        self.e.put_bools(v, n)
        return v

    def hi_tok(self, key, cdf):
        v = 3 + self.policy(key, 12)  # tok in [3, 15]
        self.e.put_hi_tok(v, cdf)
        return v

    def golomb(self, key):
        v = self.policy(key, 1 << 16)
        val = v + 1
        ln = val.bit_length() - 1
        assert ln < 32
        for _ in range(ln):
            self.e.put_bool_equi(0)
        self.e.put_bool_equi(1)
        for k in range(ln - 1, -1, -1):
            self.e.put_bool_equi((val >> k) & 1)
        return v

    def subexp(self, key, ref, n, k):
        v = self.policy(key, n - 1)
        self.e.put_subexp(v, ref, n, k)
        return v

    def uniform(self, key, n):
        assert n > 1
        v = self.policy(key, n - 1)
        ln = (n - 1).bit_length()
        m = (1 << ln) - n
        if v < m:
            self.e.put_bools(v, ln - 1)
        else:
            x = v + m
            self.e.put_bools(x >> 1, ln - 1)
            self.e.put_bool_equi(x & 1)
        return v


# ------------------------------------------------------------------
# Block context (dav1d env.h BlockContext)
# ------------------------------------------------------------------
class BlockContext:
    FIELDS = dict(mode=np.uint8, lcoef=np.uint8, seg_pred=np.uint8,
                  skip=np.uint8, skip_mode=np.uint8, intra=np.uint8,
                  comp_type=np.uint8, tx_intra=np.int8, tx=np.int8,
                  tx_lpf_y=np.uint8, tx_lpf_uv=np.uint8, uvmode=np.uint8,
                  pal_sz=np.uint8)

    def __init__(self):
        for f, dt in self.FIELDS.items():
            setattr(self, f, np.zeros(32, dt))
        self.ccoef = np.zeros((2, 32), np.uint8)
        self.ref = np.full((2, 32), -1, np.int8)
        self.filter = np.zeros((2, 32), np.uint8)
        self.partition = np.zeros(16, np.uint8)

    def reset(self, keyframe: bool):
        # dav1d decode.c:2434 reset_context
        self.intra[:] = 1 if keyframe else 0
        self.uvmode[:] = DC_PRED
        if keyframe:
            self.mode[:] = DC_PRED
        else:
            self.mode[:] = 0  # NEARESTMV for inter frames
        self.partition[:] = 0
        self.skip[:] = 0
        self.skip_mode[:] = 0
        self.tx_lpf_y[:] = 2
        self.tx_lpf_uv[:] = 1
        self.tx_intra[:] = -1
        self.tx[:] = TX_64X64
        if not keyframe:
            self.ref[:] = -1
            self.comp_type[:] = 0
        self.lcoef[:] = 0x40
        self.ccoef[:] = 0x40
        self.filter[:] = 4  # N_SWITCHABLE_FILTERS
        self.seg_pred[:] = 0
        self.pal_sz[:] = 0


class Av1Block:
    __slots__ = ("bl", "bp", "bs", "seg_id", "skip_mode", "skip", "intra",
                 "y_mode", "y_angle", "uv_mode", "uv_angle", "cfl_alpha",
                 "pal_sz", "pal", "pal_idx_y", "pal_idx_uv", "tx", "uvtx",
                 "bx", "by", "qidx", "edge_flags", "lflvl4")

    def __init__(self):
        self.pal_sz = [0, 0]
        self.cfl_alpha = [0, 0]
        self.pal = [None, None, None]
        self.pal_idx_y = None
        self.pal_idx_uv = None


class CoefBlock:
    __slots__ = ("plane", "x", "y", "tx", "txtp", "eob", "cf")

    def __init__(self, plane, x, y, tx, txtp, eob, cf):
        self.plane = plane
        self.x = x          # in 4px units, within frame (luma coords /plane)
        self.y = y
        self.tx = tx
        self.txtp = txtp
        self.eob = eob
        self.cf = cf        # (sh*4, sw*4)? stored flat dav1d layout


class TileCoder:
    def __init__(self, seq: SequenceHeader, fhdr: FrameHeader,
                 cdf: CdfContext, ec, tile_col: int = 0, tile_row: int = 0):
        self.seq = seq
        self.f = fhdr
        self.cdf = cdf
        self.ec = ec
        t = fhdr.tiling
        sbsz_log2 = 6 + seq.sb128
        sb_step = 1 << (sbsz_log2 - 2)  # in 4px units
        self.sb_step = sb_step
        self.sb128 = seq.sb128
        self.root_bl = BL_128X128 if seq.sb128 else BL_64X64
        # frame dims in 4px units (dav1d: f->bw = ((w+7)>>3)<<1)
        self.bw = ((fhdr.width[0] + 7) >> 3) << 1
        self.bh = ((fhdr.height + 7) >> 3) << 1
        self.col_start = t.col_start_sb[tile_col] << (sbsz_log2 - 2)
        self.col_end = min(t.col_start_sb[tile_col + 1] << (sbsz_log2 - 2),
                           self.bw)
        self.row_start = t.row_start_sb[tile_row] << (sbsz_log2 - 2)
        self.row_end = min(t.row_start_sb[tile_row + 1] << (sbsz_log2 - 2),
                           self.bh)
        layout = seq.layout
        self.layout = layout
        self.ss_ver = 1 if layout == PIXEL_LAYOUT_I420 else 0
        self.ss_hor = 1 if layout != PIXEL_LAYOUT_I444 else 0
        self.monochrome = layout == PIXEL_LAYOUT_I400
        # contexts
        n_a = (self.col_end - self.col_start + 31) >> 5
        self.a_arr = [BlockContext() for _ in range(n_a + 1)]
        self.l = BlockContext()
        self.keyframe = fhdr.frame_type in (0, 2)  # KEY or INTRA
        for a in self.a_arr:  # dav1d resets all f->a[] at frame init
            a.reset(self.keyframe)
        # quant
        self.dq_frame = self._init_quant_tables(fhdr.quant_yac)
        self.dq = self.dq_frame
        self.last_qidx = fhdr.quant_yac
        self.last_delta_lf = [0, 0, 0, 0]
        self.qidx_map = np.zeros((self.bh, self.bw), np.uint8) \
            if fhdr.delta_q_present else None
        # qm tables
        self.qm = [[None] * 3 for _ in range(19)]
        if fhdr.quant_qm:
            for tx in range(19):
                self.qm[tx][0] = TABLES.qm(fhdr.quant_qm_y, 0, tx)
                self.qm[tx][1] = TABLES.qm(fhdr.quant_qm_u, 1, tx)
                self.qm[tx][2] = TABLES.qm(fhdr.quant_qm_v, 1, tx)
        # loop restoration state
        self.restore_planes = 0
        for pidx in range(3):
            if fhdr.restoration_type[pidx] != 0:
                self.restore_planes |= 1 << pidx
        self.lr_ref = [dict(type=0, filter_v=[3, -7, 15],
                            filter_h=[3, -7, 15], sgr_weights=[-32, 31])
                       for _ in range(3)]
        self.lr_units: dict = {}
        # outputs
        self.blocks: list[Av1Block] = []
        self.coefs: list[CoefBlock] = []
        self.cdef_idx: list[tuple] = []
        # per-sb state
        self.cur_sb_cdef_idx = [-1, -1, -1, -1]
        self.seg_map = np.zeros((self.bh, self.bw), np.uint8) \
            if fhdr.segmentation_enabled else None
        self.bx = 0
        self.by = 0
        self.dbg = False

    def _init_quant_tables(self, qidx):
        f = self.f
        hbd = self.seq.hbd
        n = 8 if f.segmentation_enabled else 1
        dq = []
        for i in range(n):
            yac = iclip_u8(qidx + f.seg_data.d[i].delta_q) \
                if f.segmentation_enabled else qidx
            ydc = iclip_u8(yac + f.quant_ydc_delta)
            uac = iclip_u8(yac + f.quant_uac_delta)
            udc = iclip_u8(yac + f.quant_udc_delta)
            vac = iclip_u8(yac + f.quant_vac_delta)
            vdc = iclip_u8(yac + f.quant_vdc_delta)
            dq.append(((int(T_DQ[hbd][ydc][0]), int(T_DQ[hbd][yac][1])),
                       (int(T_DQ[hbd][udc][0]), int(T_DQ[hbd][uac][1])),
                       (int(T_DQ[hbd][vdc][0]), int(T_DQ[hbd][vac][1]))))
        while len(dq) < 8:
            dq.append(dq[0])
        return dq

    # ---- main walk ----
    def code_tile(self):
        for by in range(self.row_start, self.row_end, self.sb_step):
            self.by = by
            self.code_sbrow()

    def code_sbrow(self):
        self.l.reset(self.keyframe)
        by = self.by
        for bx in range(self.col_start, self.col_end, self.sb_step):
            self.bx = bx
            self.cur_sb_cdef_idx = [-1, -1, -1, -1]
            self._read_lr_for_sb(bx, by)
            self.decode_sb(self.root_bl, bx, by,
                           INTRA_EDGE_TREE[self.root_bl])
            self.cdef_idx.append((bx, by, tuple(self.cur_sb_cdef_idx)))

    def _a(self, bx4_abs):
        """above context holder for absolute 4px col (per 128px column)."""
        return self.a_arr[(bx4_abs - (self.col_start & ~31)) >> 5]

    def decode_sb(self, bl, bx, by, node):
        hsz = 16 >> bl
        have_h_split = self.bw > bx + hsz
        have_v_split = self.bh > by + hsz
        ec = self.ec

        if not have_h_split and not have_v_split:
            assert bl < BL_8X8
            return self.decode_sb(bl + 1, bx, by, node.split[0])

        bx8 = (bx & 31) >> 1
        by8 = (by & 31) >> 1
        a = self._a(bx)
        ctx = ((int(a.partition[bx8]) >> (4 - bl)) & 1) + \
              (((int(self.l.partition[by8]) >> (4 - bl)) & 1) << 1)
        pc = self.cdf.m["partition"][bl][ctx]

        if have_h_split and have_v_split:
            bp = ec.sym("part", pc, int(T_PART_COUNT[bl]))
            if self.dbg:
                print(f"poc=0,y={by},x={bx},bl={bl},ctx={ctx},bp={bp}: "
                      f"r={ec.rng}")
            if self.layout == PIXEL_LAYOUT_I422 and bp in (
                    PARTITION_V, PARTITION_V4, PARTITION_T_LEFT_SPLIT,
                    PARTITION_T_RIGHT_SPLIT):
                raise ValueError("illegal partition for 4:2:2")
            b = T_BLOCK_SIZES[bl][bp]
            if bp == PARTITION_NONE:
                self.decode_b(bl, int(b[0]), bp, bx, by, node.o)
            elif bp == PARTITION_H:
                self.decode_b(bl, int(b[0]), bp, bx, by, node.h[0])
                self.decode_b(bl, int(b[0]), bp, bx, by + hsz, node.h[1])
            elif bp == PARTITION_V:
                self.decode_b(bl, int(b[0]), bp, bx, by, node.v[0])
                self.decode_b(bl, int(b[0]), bp, bx + hsz, by, node.v[1])
            elif bp == PARTITION_SPLIT:
                if bl == BL_8X8:
                    tip = node
                    self.decode_b(bl, BS_4x4, bp, bx, by, EDGE_ALL_TR_AND_BL)
                    self.decode_b(bl, BS_4x4, bp, bx + 1, by, tip.split[0])
                    self.decode_b(bl, BS_4x4, bp, bx, by + 1, tip.split[1])
                    self.decode_b(bl, BS_4x4, bp, bx + 1, by + 1,
                                  tip.split[2])
                else:
                    self.decode_sb(bl + 1, bx, by, node.split[0])
                    self.decode_sb(bl + 1, bx + hsz, by, node.split[1])
                    self.decode_sb(bl + 1, bx, by + hsz, node.split[2])
                    self.decode_sb(bl + 1, bx + hsz, by + hsz, node.split[3])
            elif bp == PARTITION_T_TOP_SPLIT:
                self.decode_b(bl, int(b[0]), bp, bx, by, EDGE_ALL_TR_AND_BL)
                self.decode_b(bl, int(b[0]), bp, bx + hsz, by, node.v[1])
                self.decode_b(bl, int(b[1]), bp, bx, by + hsz, node.h[1])
            elif bp == PARTITION_T_BOTTOM_SPLIT:
                self.decode_b(bl, int(b[0]), bp, bx, by, node.h[0])
                self.decode_b(bl, int(b[1]), bp, bx, by + hsz, node.v[0])
                self.decode_b(bl, int(b[1]), bp, bx + hsz, by + hsz, 0)
            elif bp == PARTITION_T_LEFT_SPLIT:
                self.decode_b(bl, int(b[0]), bp, bx, by, EDGE_ALL_TR_AND_BL)
                self.decode_b(bl, int(b[0]), bp, bx, by + hsz, node.h[1])
                self.decode_b(bl, int(b[1]), bp, bx + hsz, by, node.v[1])
            elif bp == PARTITION_T_RIGHT_SPLIT:
                self.decode_b(bl, int(b[0]), bp, bx, by, node.v[0])
                self.decode_b(bl, int(b[1]), bp, bx + hsz, by, node.h[0])
                self.decode_b(bl, int(b[1]), bp, bx + hsz, by + hsz, 0)
            elif bp == PARTITION_H4:
                q = hsz >> 1
                self.decode_b(bl, int(b[0]), bp, bx, by, node.h[0])
                self.decode_b(bl, int(b[0]), bp, bx, by + q, node.h4)
                self.decode_b(bl, int(b[0]), bp, bx, by + 2 * q,
                              EDGE_ALL_LEFT_HAS_BOTTOM)
                if by + 3 * q < self.bh:
                    self.decode_b(bl, int(b[0]), bp, bx, by + 3 * q,
                                  node.h[1])
            elif bp == PARTITION_V4:
                q = hsz >> 1
                self.decode_b(bl, int(b[0]), bp, bx, by, node.v[0])
                self.decode_b(bl, int(b[0]), bp, bx + q, by, node.v4)
                self.decode_b(bl, int(b[0]), bp, bx + 2 * q, by,
                              EDGE_ALL_TOP_HAS_RIGHT)
                if bx + 3 * q < self.bw:
                    self.decode_b(bl, int(b[0]), bp, bx + 3 * q, by,
                                  node.v[1])
            else:
                raise AssertionError(bp)
        elif have_h_split:
            is_split = ec.boolp("part_split", self._gather_top_prob(pc, bl))
            if self.dbg:
                print(f"poc=0,y={by},x={bx},bl={bl},ctx={ctx},"
                      f"bp={3 if is_split else 1}: r={ec.rng}")
            assert bl < BL_8X8
            if is_split:
                bp = PARTITION_SPLIT
                self.decode_sb(bl + 1, bx, by, node.split[0])
                self.decode_sb(bl + 1, bx + hsz, by, node.split[1])
            else:
                bp = PARTITION_H
                self.decode_b(bl, int(T_BLOCK_SIZES[bl][PARTITION_H][0]),
                              PARTITION_H, bx, by, node.h[0])
        else:
            is_split = ec.boolp("part_split", self._gather_left_prob(pc, bl))
            if self.dbg:
                print(f"poc=0,y={by},x={bx},bl={bl},ctx={ctx},"
                      f"bp={3 if is_split else 2}: r={ec.rng}")
            if self.layout == PIXEL_LAYOUT_I422 and not is_split:
                raise ValueError("illegal partition for 4:2:2")
            assert bl < BL_8X8
            if is_split:
                bp = PARTITION_SPLIT
                self.decode_sb(bl + 1, bx, by, node.split[0])
                self.decode_sb(bl + 1, bx, by + hsz, node.split[2])
            else:
                bp = PARTITION_V
                self.decode_b(bl, int(T_BLOCK_SIZES[bl][PARTITION_V][0]),
                              PARTITION_V, bx, by, node.v[0])

        if bp != PARTITION_SPLIT or bl == BL_8X8:
            n = hsz
            a.partition[bx8:bx8 + n] = T_AL_PART_CTX[0][bl][bp]
            self.l.partition[by8:by8 + n] = T_AL_PART_CTX[1][bl][bp]
        return 0

    @staticmethod
    def _gather_top_prob(pc, bl):
        out = int(pc[PARTITION_V - 1]) - int(pc[PARTITION_T_TOP_SPLIT])
        out += int(pc[PARTITION_T_LEFT_SPLIT - 1])
        if bl != BL_128X128:
            out += int(pc[PARTITION_V4 - 1]) - int(pc[PARTITION_T_RIGHT_SPLIT])
        return out

    @staticmethod
    def _gather_left_prob(pc, bl):
        out = int(pc[PARTITION_H - 1]) - int(pc[PARTITION_H])
        out += int(pc[PARTITION_SPLIT - 1]) - int(pc[PARTITION_T_LEFT_SPLIT])
        if bl != BL_128X128:
            out += int(pc[PARTITION_H4 - 1]) - int(pc[PARTITION_H4])
        return out

    # ---- block ----
    def decode_b(self, bl, bs, bp, bx, by, edge_flags=0):
        ec = self.ec
        f = self.f
        cdfm = self.cdf.m
        b = Av1Block()
        b.bl, b.bp, b.bs = bl, bp, bs
        b.bx, b.by = bx, by
        b.edge_flags = edge_flags
        b_dim = T_BLOCK_DIM[bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        bx4, by4 = bx & 31, by & 31
        ss_ver, ss_hor = self.ss_ver, self.ss_hor
        cbx4, cby4 = bx4 >> ss_hor, by4 >> ss_ver
        w4 = min(bw4, self.bw - bx)
        h4 = min(bh4, self.bh - by)
        cbw4 = (bw4 + ss_hor) >> ss_hor
        cbh4 = (bh4 + ss_ver) >> ss_ver
        have_left = bx > self.col_start
        have_top = by > self.row_start
        has_chroma = (not self.monochrome and
                      (bw4 > ss_hor or bx & 1) and (bh4 > ss_ver or by & 1))
        a = self._a(bx)
        l = self.l

        assert self.keyframe and not f.allow_intrabc, \
            "inter frames not yet supported by the tile coder"

        # segment_id (keyframe: update_map=1, update_data=1, maybe preskip)
        seg = None
        if f.segmentation_enabled:
            if f.seg_data.preskip:
                b.seg_id = self._read_seg_id(bx, by, w4, h4, have_top,
                                             have_left)
                seg = f.seg_data.d[b.seg_id]
        else:
            b.seg_id = 0
            seg = None

        # skip_mode is 0 for intra frames
        b.skip_mode = 0

        # skip
        if seg is not None and seg.skip:
            b.skip = 1
        else:
            sctx = int(a.skip[bx4]) + int(l.skip[by4])
            b.skip = ec.bool_adapt("skip", cdfm["skip"][sctx])
            if self.dbg:
                print(f"Post-skip[{b.skip}]: r={ec.rng}")

        # segment_id post-skip
        if f.segmentation_enabled and not f.seg_data.preskip:
            if b.skip:
                seg_ctx, pred_seg_id = self._cur_seg_ctx(bx, by, have_top,
                                                         have_left)
                b.seg_id = pred_seg_id
            else:
                b.seg_id = self._read_seg_id(bx, by, w4, h4, have_top,
                                             have_left)
            seg = f.seg_data.d[b.seg_id]
        elif not f.segmentation_enabled:
            b.seg_id = 0

        if self.seg_map is not None:
            self.seg_map[by:by + h4, bx:bx + w4] = b.seg_id

        # cdef index (always walked; reads 0 bits when cdef.n_bits == 0)
        if not b.skip:
            idx = (((bx & 16) >> 4) + ((by & 16) >> 3)) if self.sb128 else 0
            if self.cur_sb_cdef_idx[idx] == -1:
                v = ec.bools("cdef_idx", f.cdef_n_bits)
                self.cur_sb_cdef_idx[idx] = v
                if bw4 > 16:
                    self.cur_sb_cdef_idx[idx + 1] = v
                if bh4 > 16:
                    self.cur_sb_cdef_idx[idx + 2] = v
                if bw4 == 32 and bh4 == 32:
                    self.cur_sb_cdef_idx[idx + 3] = v

        # delta q/lf
        mask = 31 >> (0 if self.sb128 else 1)
        if not (bx & mask) and not (by & mask):
            self._read_delta_q_lf(b, bs)
        b.qidx = self.last_qidx
        b.lflvl4 = self._calc_lflvl(b.seg_id)

        b.intra = 1

        # y mode (keyframe cdf)
        ymode_cdf = self.cdf.kfym[
            T_INTRA_MODE_CTX[a.mode[bx4]]][T_INTRA_MODE_CTX[l.mode[by4]]]
        b.y_mode = ec.sym("ymode", ymode_cdf, N_INTRA_PRED_MODES - 1)
        if self.dbg:
            print(f"Post-ymode[{b.y_mode}]: r={ec.rng}")

        # y angle
        if int(b_dim[2]) + int(b_dim[3]) >= 2 and \
                VERT_PRED <= b.y_mode <= VERT_LEFT_PRED:
            acdf = cdfm["angle_delta"][b.y_mode - VERT_PRED]
            b.y_angle = ec.sym("yangle", acdf, 6) - 3
        else:
            b.y_angle = 0

        if has_chroma:
            lossless = f.segmentation_lossless[b.seg_id]
            cfl_allowed = (cbw4 == 1 and cbh4 == 1) if lossless else \
                bs in CFL_ALLOWED
            uvmode_cdf = cdfm["uv_mode"][int(cfl_allowed)][b.y_mode]
            # n_symbols = N_UV_INTRA_PRED_MODES-1-(not cfl_allowed)
            b.uv_mode = ec.sym("uvmode", uvmode_cdf,
                               13 if cfl_allowed else 12)
            if self.dbg:
                print(f"Post-uvmode[{b.uv_mode}]: r={ec.rng}")
            b.uv_angle = 0
            if b.uv_mode == CFL_PRED:
                sign = ec.sym("cfl_sign", cdfm["cfl_sign"], 7) + 1
                sign_u = sign * 0x56 >> 8
                sign_v = sign - sign_u * 3
                if sign_u:
                    ctx = (sign_u == 2) * 3 + sign_v
                    alpha = ec.sym("cfl_alpha",
                                   cdfm["cfl_alpha"][ctx], 15) + 1
                    b.cfl_alpha[0] = -alpha if sign_u == 1 else alpha
                else:
                    b.cfl_alpha[0] = 0
                if sign_v:
                    ctx = (sign_v == 2) * 3 + sign_u
                    alpha = ec.sym("cfl_alpha",
                                   cdfm["cfl_alpha"][ctx], 15) + 1
                    b.cfl_alpha[1] = -alpha if sign_v == 1 else alpha
                else:
                    b.cfl_alpha[1] = 0
            elif int(b_dim[2]) + int(b_dim[3]) >= 2 and \
                    VERT_PRED <= b.uv_mode <= VERT_LEFT_PRED:
                acdf = cdfm["angle_delta"][b.uv_mode - VERT_PRED]
                b.uv_angle = ec.sym("uvangle", acdf, 6) - 3
        else:
            b.uv_mode = DC_PRED
            b.uv_angle = 0

        # palette
        b.pal_sz = [0, 0]
        if f.allow_screen_content_tools and max(bw4, bh4) <= 16 and \
                bw4 + bh4 >= 4:
            raise NotImplementedError("palette coding TODO")

        # filter intra
        if b.y_mode == DC_PRED and not b.pal_sz[0] and \
                max(int(b_dim[2]), int(b_dim[3])) <= 3 and \
                self.seq.filter_intra:
            is_filter = ec.bool_adapt("use_filter_intra",
                                      cdfm["use_filter_intra"][bs])
            if is_filter:
                b.y_mode = FILTER_PRED
                b.y_angle = ec.sym("filter_intra_mode",
                                   cdfm["filter_intra"], 4)

        # tx size
        lossless = f.segmentation_lossless[b.seg_id]
        if lossless:
            b.tx = b.uvtx = TX_4X4
            t_dim = T_TXFM[TX_4X4]
        else:
            b.tx = int(T_MAX_TX[bs][0])
            b.uvtx = int(T_MAX_TX[bs][self.layout])
            t_dim = T_TXFM[b.tx]
            if f.txfm_mode == TX_SWITCHABLE and int(t_dim[5]) > TX_4X4:
                tctx = (int(l.tx_intra[by4]) >= int(t_dim[3])) + \
                       (int(a.tx_intra[bx4]) >= int(t_dim[2]))
                tx_cdf = cdfm["txsz"][int(t_dim[5]) - 1][tctx]
                depth = ec.sym("txsz", tx_cdf, min(int(t_dim[5]), 2))
                for _ in range(depth):
                    b.tx = int(t_dim[6])  # sub
                    t_dim = T_TXFM[b.tx]
            if self.dbg:
                print(f"Post-tx[{b.tx}]: r={ec.rng}")

        # coefficient blocks (read_coef_blocks order)
        self._read_coef_blocks(b, bs, bx, by, w4, h4, has_chroma)

        # context updates
        y_mode_nofilt = DC_PRED if b.y_mode == FILTER_PRED else b.y_mode
        lw, lh = int(t_dim[2]), int(t_dim[3])
        l.tx_intra[by4:by4 + bh4] = lh
        l.tx[by4:by4 + bh4] = lh
        a.tx_intra[bx4:bx4 + bw4] = lw
        a.tx[bx4:bx4 + bw4] = lw
        l.mode[by4:by4 + bh4] = y_mode_nofilt
        a.mode[bx4:bx4 + bw4] = y_mode_nofilt
        l.pal_sz[by4:by4 + bh4] = b.pal_sz[0]
        a.pal_sz[bx4:bx4 + bw4] = b.pal_sz[0]
        l.seg_pred[by4:by4 + bh4] = 0
        a.seg_pred[bx4:bx4 + bw4] = 0
        l.skip_mode[by4:by4 + bh4] = 0
        a.skip_mode[bx4:bx4 + bw4] = 0
        l.intra[by4:by4 + bh4] = 1
        a.intra[bx4:bx4 + bw4] = 1
        l.skip[by4:by4 + bh4] = b.skip
        a.skip[bx4:bx4 + bw4] = b.skip
        if has_chroma:
            l.uvmode[cby4:cby4 + cbh4] = b.uv_mode
            a.uvmode[cbx4:cbx4 + cbw4] = b.uv_mode

        self.blocks.append(b)
        return 0

    def _cur_seg_ctx(self, bx, by, have_top, have_left):
        sm = self.seg_map
        if have_left and have_top:
            lv = int(sm[by, bx - 1])
            av = int(sm[by - 1, bx])
            al = int(sm[by - 1, bx - 1])
            if lv == av and al == lv:
                ctx = 2
            elif lv == av or al == lv or av == al:
                ctx = 1
            else:
                ctx = 0
            return ctx, (av if av == al else lv)
        ctx = 0
        if have_left:
            return ctx, int(sm[by, bx - 1])
        if have_top:
            return ctx, int(sm[by - 1, bx])
        return ctx, 0

    def _read_seg_id(self, bx, by, w4, h4, have_top, have_left):
        ec = self.ec
        f = self.f
        seg_ctx, pred_seg_id = self._cur_seg_ctx(bx, by, have_top, have_left)
        diff = ec.sym("seg_id", self.cdf.m["seg_id"][seg_ctx], 7)
        last_active = f.seg_data.last_active_segid
        seg_id = _neg_deinterleave(diff, pred_seg_id, last_active + 1)
        if seg_id > last_active or seg_id >= 8:
            seg_id = 0
        return seg_id

    def _read_lr_for_sb(self, bx, by):
        f = self.f
        if not self.restore_planes:
            return
        assert f.width[0] == f.width[1], "super-res LR not yet supported"
        for p in range(3):
            if not ((self.restore_planes >> p) & 1):
                continue
            ss_ver = 1 if (p and self.layout == PIXEL_LAYOUT_I420) else 0
            ss_hor = 1 if (p and self.layout != PIXEL_LAYOUT_I444) else 0
            us_log2 = f.restoration_unit_size[1 if p else 0]
            y = (by * 4) >> ss_ver
            hh = (f.height + ss_ver) >> ss_ver
            unit_size = 1 << us_log2
            mask_ = unit_size - 1
            if y & mask_:
                continue
            half = unit_size >> 1
            if y and y + half > hh:
                continue
            x = (4 * bx) >> ss_hor
            if x & mask_:
                continue
            ww = (f.width[0] + ss_hor) >> ss_hor
            if x and x + half > ww:
                continue
            lr = self._read_restoration_info(p, f.restoration_type[p])
            # key on 64px-luma grid (storage granularity)
            self.lr_units[(p, (by * 4) >> 6, (bx * 4) >> 6)] = lr

    def _read_restoration_info(self, p, frame_type):
        ec = self.ec
        cdfm = self.cdf.m
        ref = self.lr_ref[p]
        lr = dict(type=0, filter_v=[0, 0, 0], filter_h=[0, 0, 0],
                  sgr_weights=list(ref["sgr_weights"]))
        RESTORATION_SWITCHABLE, RESTORATION_WIENER, RESTORATION_SGRPROJ = \
            1, 2, 3
        if frame_type == RESTORATION_SWITCHABLE:
            filt = ec.sym("lr_switchable", cdfm["restore_switchable"], 2)
            lr["type"] = filt + (1 if filt else 0)  # NONE/WIENER/SGRPROJ
        else:
            cdf = cdfm["restore_wiener"] \
                if frame_type == RESTORATION_WIENER \
                else cdfm["restore_sgrproj"]
            t = ec.bool_adapt("lr_type", cdf)
            lr["type"] = frame_type if t else 0
        if lr["type"] == RESTORATION_WIENER:
            lr["filter_v"][0] = 0 if p else \
                ec.subexp("lr_wv0", ref["filter_v"][0] + 5, 16, 1) - 5
            lr["filter_v"][1] = \
                ec.subexp("lr_wv1", ref["filter_v"][1] + 23, 32, 2) - 23
            lr["filter_v"][2] = \
                ec.subexp("lr_wv2", ref["filter_v"][2] + 17, 64, 3) - 17
            lr["filter_h"][0] = 0 if p else \
                ec.subexp("lr_wh0", ref["filter_h"][0] + 5, 16, 1) - 5
            lr["filter_h"][1] = \
                ec.subexp("lr_wh1", ref["filter_h"][1] + 23, 32, 2) - 23
            lr["filter_h"][2] = \
                ec.subexp("lr_wh2", ref["filter_h"][2] + 17, 64, 3) - 17
            lr["sgr_weights"] = list(ref["sgr_weights"])
            self.lr_ref[p] = lr
        elif lr["type"] == RESTORATION_SGRPROJ:
            idx = ec.bools("lr_sgr_idx", 4)
            sgr_params = TABLES["sgr_params"][idx]
            lr["type"] += idx
            lr["sgr_weights"][0] = (
                ec.subexp("lr_sw0", ref["sgr_weights"][0] + 96, 128, 4) - 96
                if sgr_params[0] else 0)
            lr["sgr_weights"][1] = (
                ec.subexp("lr_sw1", ref["sgr_weights"][1] + 32, 128, 4) - 32
                if sgr_params[1] else 95)
            lr["filter_v"] = list(ref["filter_v"])
            lr["filter_h"] = list(ref["filter_h"])
            self.lr_ref[p] = lr
        return lr

    def _calc_lflvl(self, seg_id):
        f = self.f
        if not f.loopfilter_level_y[0] and not f.loopfilter_level_y[1]:
            return (0, 0, 0, 0)
        mr = f.loopfilter_mode_ref_deltas \
            if f.loopfilter_mode_ref_delta_enabled else None
        segd = f.seg_data.d[seg_id] if f.segmentation_enabled else None
        dlf = self.last_delta_lf
        multi = f.delta_lf_multi

        def calc(base_lvl, lf_delta, seg_delta):
            base = max(0, min(63, base_lvl + lf_delta))
            base = max(0, min(63, base + seg_delta))
            if mr is None:
                return base
            sh = 1 if base >= 32 else 0
            return max(0, min(63, base + mr.ref_delta[0] * (1 << sh)))

        def calc_c(base_lvl, lf_delta, seg_delta):
            return 0 if not base_lvl else calc(base_lvl, lf_delta, seg_delta)

        return (
            calc(f.loopfilter_level_y[0], dlf[0],
                 segd.delta_lf_y_v if segd else 0),
            calc(f.loopfilter_level_y[1], dlf[1 if multi else 0],
                 segd.delta_lf_y_h if segd else 0),
            calc_c(f.loopfilter_level_u, dlf[2 if multi else 0],
                   segd.delta_lf_u if segd else 0),
            calc_c(f.loopfilter_level_v, dlf[3 if multi else 0],
                   segd.delta_lf_v if segd else 0),
        )

    def _read_delta_q_lf(self, b, bs):
        ec = self.ec
        f = self.f
        sb_bs = 0 if self.sb128 else 3  # BS_128x128 or BS_64x64
        have_delta_q = f.delta_q_present and (bs != sb_bs or not b.skip)
        if have_delta_q:
            delta_q = ec.sym("delta_q", self.cdf.m["delta_q"], 3)
            if delta_q == 3:
                n_bits = 1 + ec.bools("delta_q_nbits", 3)
                delta_q = ec.bools("delta_q_bits", n_bits) + 1 + (1 << n_bits)
            if delta_q:
                if ec.equi("delta_q_sign"):
                    delta_q = -delta_q
                delta_q *= 1 << f.delta_q_res_log2
            self.last_qidx = max(1, min(255, self.last_qidx + delta_q))
            if f.delta_lf_present:
                n_lfs = (4 if not self.monochrome else 2) \
                    if f.delta_lf_multi else 1
                for i in range(n_lfs):
                    delta_lf = ec.sym(
                        "delta_lf",
                        self.cdf.m["delta_lf"][i + f.delta_lf_multi], 3)
                    if delta_lf == 3:
                        n_bits = 1 + ec.bools("delta_lf_nbits", 3)
                        delta_lf = ec.bools("delta_lf_bits", n_bits) + 1 + \
                            (1 << n_bits)
                    if delta_lf:
                        if ec.equi("delta_lf_sign"):
                            delta_lf = -delta_lf
                        delta_lf *= 1 << f.delta_lf_res_log2
                    self.last_delta_lf[i] = max(
                        -63, min(63, self.last_delta_lf[i] + delta_lf))
            if self.last_qidx == f.quant_yac:
                self.dq = self.dq_frame
            else:
                self.dq = self._init_quant_tables(self.last_qidx)

    # ---- coefficients ----
    def _read_coef_blocks(self, b, bs, bx, by, w4, h4, has_chroma):
        ss_ver, ss_hor = self.ss_ver, self.ss_hor
        bx4, by4 = bx & 31, by & 31
        cbx4, cby4 = bx4 >> ss_hor, by4 >> ss_ver
        b_dim = T_BLOCK_DIM[bs]
        bw4, bh4 = int(b_dim[0]), int(b_dim[1])
        cbw4 = (bw4 + ss_hor) >> ss_hor
        cbh4 = (bh4 + ss_ver) >> ss_ver
        cw4 = (w4 + ss_hor) >> ss_hor
        ch4 = (h4 + ss_ver) >> ss_ver
        a = self._a(bx)
        l = self.l

        if b.skip:
            a.lcoef[bx4:bx4 + bw4] = 0x40
            l.lcoef[by4:by4 + bh4] = 0x40
            if has_chroma:
                a.ccoef[0][cbx4:cbx4 + cbw4] = 0x40
                a.ccoef[1][cbx4:cbx4 + cbw4] = 0x40
                l.ccoef[0][cby4:cby4 + cbh4] = 0x40
                l.ccoef[1][cby4:cby4 + cbh4] = 0x40
            return

        t_dim = T_TXFM[b.tx]
        uv_t_dim = T_TXFM[b.uvtx]
        tw, th = int(t_dim[0]), int(t_dim[1])
        ctw, cth = int(uv_t_dim[0]), int(uv_t_dim[1])

        for init_y in range(0, h4, 16):
            sub_h4 = min(h4, 16 + init_y)
            for init_x in range(0, w4, 16):
                sub_w4 = min(w4, init_x + 16)
                y = init_y
                while y < sub_h4:
                    x = init_x
                    while x < sub_w4:
                        cf, eob, txtp, cf_ctx = self._decode_coefs(
                            b, b.tx, bs, intra=1, plane=0,
                            a_arr=a.lcoef, a_off=bx4 + x,
                            l_arr=l.lcoef, l_off=by4 + y)
                        if self.dbg:
                            print(f"Post-y-cf-blk[tx={b.tx},txtp={txtp},"
                                  f"eob={eob}]: r={self.ec.rng}")
                        self.coefs.append(CoefBlock(
                            0, bx + x, by + y, b.tx, txtp, eob, cf))
                        nh = min(th, self.bh - (by + y))
                        nw = min(tw, self.bw - (bx + x))
                        l.lcoef[by4 + y:by4 + y + nh] = cf_ctx
                        a.lcoef[bx4 + x:bx4 + x + nw] = cf_ctx
                        x += tw
                    y += th

                if not has_chroma:
                    continue
                sub_ch4 = min(ch4, (init_y + 16) >> ss_ver)
                sub_cw4 = min(cw4, (init_x + 16) >> ss_hor)
                for pl in range(2):
                    y = init_y >> ss_ver
                    while y < sub_ch4:
                        x = init_x >> ss_hor
                        while x < sub_cw4:
                            cf, eob, txtp, cf_ctx = self._decode_coefs(
                                b, b.uvtx, bs, intra=1, plane=1 + pl,
                                a_arr=a.ccoef[pl], a_off=cbx4 + x,
                                l_arr=l.ccoef[pl], l_off=cby4 + y)
                            if self.dbg:
                                print(f"Post-uv-cf-blk[pl={pl},tx={b.uvtx},"
                                      f"txtp={txtp},eob={eob}]: "
                                      f"r={self.ec.rng}")
                            self.coefs.append(CoefBlock(
                                1 + pl, (bx >> ss_hor) + x,
                                (by >> ss_ver) + y, b.uvtx, txtp, eob, cf))
                            # dav1d: imin(uv_t_dim->h, (f->bh - t->by + ss_ver)
                            #             >> ss_ver) with t->by in luma units
                            tby = by + (y << ss_ver)
                            tbx = bx + (x << ss_hor)
                            nh = min(cth, (self.bh - tby + ss_ver) >> ss_ver)
                            nw = min(ctw, (self.bw - tbx + ss_hor) >> ss_hor)
                            l.ccoef[pl][cby4 + y:cby4 + y + nh] = cf_ctx
                            a.ccoef[pl][cbx4 + x:cbx4 + x + nw] = cf_ctx
                            x += ctw
                        y += cth

    def _decode_coefs(self, b, tx, bs, intra, plane, a_arr, a_off,
                      l_arr, l_off):
        """Returns (cf[sh4*4 x sw4*4 flat dav1d layout], eob, txtp, cf_ctx)"""
        ec = self.ec
        f = self.f
        cdfc = self.cdf.coef
        chroma = 1 if plane else 0
        lossless = f.segmentation_lossless[b.seg_id]
        t_dim = T_TXFM[tx]
        tw, th = int(t_dim[0]), int(t_dim[1])    # in 4px units
        lw, lh = int(t_dim[2]), int(t_dim[3])
        t_min, t_max, t_ctx = int(t_dim[4]), int(t_dim[5]), int(t_dim[7])

        # skip ctx
        sctx = self._get_skip_ctx(t_dim, bs, a_arr, a_off, l_arr, l_off,
                                  chroma)
        all_skip = ec.bool_adapt("coef_skip", cdfc["skip"][t_ctx][sctx])
        if all_skip:
            txtp = WHT_WHT if lossless else DCT_DCT
            return None, -1, txtp, 0x40

        # txtp
        if lossless:
            txtp = WHT_WHT
        elif t_max + intra >= TX_64X64:
            txtp = DCT_DCT
        elif chroma:
            txtp = int(T_TXTP_FROM_UVMODE[b.uv_mode]) if intra else \
                self._uv_inter_txtp(t_dim, b)
        elif not f.segmentation_qidx[b.seg_id]:
            txtp = DCT_DCT
        else:
            if intra:
                if b.y_mode == FILTER_PRED:
                    from_filter = TABLES["filter_mode_to_y_mode"]
                    y_mode_nofilt = int(from_filter[b.y_angle])
                else:
                    y_mode_nofilt = b.y_mode
                if f.reduced_txtp_set or t_min == TX_16X16:
                    idx = ec.sym("txtp_intra2",
                                 self.cdf.m["txtp_intra2"][t_min]
                                 [y_mode_nofilt], 4)
                    txtp = int(T_TX_TYPES_PER_SET[idx + 0])
                else:
                    idx = ec.sym("txtp_intra1",
                                 self.cdf.m["txtp_intra1"][t_min]
                                 [y_mode_nofilt], 6)
                    txtp = int(T_TX_TYPES_PER_SET[idx + 5])
            else:
                raise NotImplementedError("inter txtp")

        # eob
        tx2dszctx = min(lw, TX_32X32) + min(lh, TX_32X32)
        tx_class = int(T_TX_TYPE_CLASS[txtp])
        is_1d = int(tx_class != TX_CLASS_2D)
        eob_bin_keys = ["eob_bin_16", "eob_bin_32", "eob_bin_64",
                        "eob_bin_128", "eob_bin_256", "eob_bin_512",
                        "eob_bin_1024"]
        if tx2dszctx < 5:
            eob_bin_cdf = cdfc[eob_bin_keys[tx2dszctx]][chroma][is_1d]
        else:
            eob_bin_cdf = cdfc[eob_bin_keys[tx2dszctx]][chroma]
        eob_bin = ec.sym("eob_bin", eob_bin_cdf, 4 + tx2dszctx)
        if eob_bin > 1:
            eob_hi_bit = ec.bool_adapt(
                "eob_hi_bit", cdfc["eob_hi_bit"][t_ctx][chroma][eob_bin])
            eob = ((eob_hi_bit | 2) << (eob_bin - 2)) | \
                ec.bools("eob_bits", eob_bin - 2)
        else:
            eob = eob_bin

        eob_cdf = cdfc["eob_base_tok"][t_ctx][chroma]
        hi_cdf = cdfc["br_tok"][min(t_ctx, 3)][chroma]

        sw4 = min(tw, 8)
        sh4 = min(th, 8)
        n_coef = (4 * sw4) * (4 * sh4)
        cf = np.zeros(n_coef, np.int64)
        rc = 0
        dc_tok = 0

        if eob:
            lo_cdf = cdfc["base_tok"][t_ctx][chroma]
            if tx_class == TX_CLASS_2D:
                nonsquare_tx = int(tx >= 5)  # RTX_4X8
                lo_ctx_offsets = T_LO_CTX_OFFSETS[
                    nonsquare_tx + (tx & nonsquare_tx)]
                scan = SCANS[tx]
                stride = 4 * sh4
                shift = lh + 2 if lh < 4 else 5
                shift2 = 0
                mask = 4 * sh4 - 1
                levels = np.zeros(stride * (4 * sw4 + 2), np.int32)
            elif tx_class == TX_CLASS_H:
                lo_ctx_offsets = None
                scan = None
                stride = 16
                shift = lh + 2
                shift2 = 0
                mask = 4 * sh4 - 1
                levels = np.zeros(stride * (4 * sh4 + 2), np.int32)
            else:
                lo_ctx_offsets = None
                scan = None
                stride = 16
                shift = lw + 2
                shift2 = lh + 2
                mask = 4 * sw4 - 1
                levels = np.zeros(stride * (4 * sw4 + 2), np.int32)

            # eob position token: thresholds use px dims (sw*sh*2, sw*sh*4
            # with sw/sh in dav1d's t_dim->w/h units capped at 8)
            ctx = 1 + (eob > sw4 * sh4 * 2) + (eob > sw4 * sh4 * 4)
            eob_tok = ec.sym("eob_tok", eob_cdf[ctx], 2)
            tok = eob_tok + 1
            level_tok = tok * 0x41

            if tx_class == TX_CLASS_2D:
                rc = int(scan[eob])
                x, y = rc >> shift, rc & mask
            elif tx_class == TX_CLASS_H:
                x, y = eob & mask, eob >> shift
                rc = eob
            else:
                x, y = eob & mask, eob >> shift
                rc = (x << shift2) | y
            if eob_tok == 2:
                ctx = 14 if ((x | y) > 1 if tx_class == TX_CLASS_2D
                             else y != 0) else 7
                tok = ec.hi_tok("eob_hi_tok", hi_cdf[ctx])
                level_tok = tok + (3 << 6)
            cf[rc] = tok << 11
            levels[x * stride + y] = level_tok & 0xFF

            for i in range(eob - 1, 0, -1):
                if tx_class == TX_CLASS_2D:
                    rc_i = int(scan[i])
                    x, y = rc_i >> shift, rc_i & mask
                elif tx_class == TX_CLASS_H:
                    x, y = i & mask, i >> shift
                    rc_i = i
                else:
                    x, y = i & mask, i >> shift
                    rc_i = (x << shift2) | y
                assert x < 32 and y < 32
                loff = x * stride + y
                mag = int(levels[loff + 1]) + int(levels[loff + stride])
                if tx_class == TX_CLASS_2D:
                    mag += int(levels[loff + stride + 1])
                    hi_mag = mag
                    mag += int(levels[loff + 2]) + int(levels[loff + 2 * stride])
                    offset = int(lo_ctx_offsets[min(y, 4)][min(x, 4)])
                else:
                    mag += int(levels[loff + 2])
                    hi_mag = mag
                    mag += int(levels[loff + 3]) + int(levels[loff + 4])
                    offset = 26 + (10 if y > 1 else y * 5)
                ctx = offset + (4 if mag > 512 else (mag + 64) >> 7)
                yy = y | x if tx_class == TX_CLASS_2D else y
                tok = ec.sym("lo_tok", lo_cdf[ctx], 3)
                if tok == 3:
                    mag = hi_mag & 63
                    ctx = (14 if yy > (1 if tx_class == TX_CLASS_2D else 0)
                           else 7) + (6 if mag > 12 else (mag + 1) >> 1)
                    tok = ec.hi_tok("hi_tok", hi_cdf[ctx])
                    levels[loff] = (tok + (3 << 6)) & 0xFF
                    cf[rc_i] = (tok << 11) | rc
                    rc = rc_i
                else:
                    levels[loff] = tok * 0x41 & 0xFF
                    if tok:
                        cf[rc_i] = (tok << 11) | rc
                        rc = rc_i
                    else:
                        cf[rc_i] = 0

            # dc
            if tx_class == TX_CLASS_2D:
                ctx = 0
            else:
                mag = int(levels[1]) + int(levels[stride]) + int(levels[2])
                hi_mag = mag
                mag += int(levels[3]) + int(levels[4])
                offset = 26 + 0
                ctx = offset + (4 if mag > 512 else (mag + 64) >> 7)
            dc_tok = ec.sym("dc_lo_tok", lo_cdf[ctx], 3)
            if dc_tok == 3:
                if tx_class == TX_CLASS_2D:
                    mag = int(levels[1]) + int(levels[stride]) + \
                        int(levels[stride + 1])
                else:
                    mag = hi_mag
                mag &= 63
                ctx = 6 if mag > 12 else (mag + 1) >> 1
                dc_tok = ec.hi_tok("dc_hi_tok", hi_cdf[ctx])
        else:
            tok_br = ec.sym("dc_eob_tok", eob_cdf[0], 2)
            dc_tok = 1 + tok_br
            if tok_br == 2:
                dc_tok = ec.hi_tok("dc_hi_tok", hi_cdf[0])
            rc = 0

        # dequant
        dq_tbl = self.dq[b.seg_id][plane]
        qm_tbl = self.qm[tx][plane] if txtp < IDTX else None
        dq_shift = max(0, t_ctx - 2)
        bitdepth = self.seq.bitdepth
        # 8bpc: 0x7fff; 10bpc: 0x1ffff; 12bpc: 0x7ffff
        cf_max = ~((~127) << (8 if bitdepth == 8 else bitdepth))

        out = np.zeros(cf.shape[0], np.int32)

        if not dc_tok:
            cul_level = 0
            dc_sign_level = 1 << 6
            if rc:
                cul_level += self._ac_loop(ec, cf, out, rc, dq_tbl, qm_tbl,
                                           dq_shift, cf_max)
            cf_ctx = min(cul_level, 63) | dc_sign_level
            return self._cf2d(out, sw4, sh4), eob, txtp, cf_ctx

        dc_sign_ctx = self._get_dc_sign_ctx(tx, a_arr, a_off, l_arr, l_off)
        dc_sign = ec.bool_adapt("dc_sign",
                                cdfc["dc_sign"][chroma][dc_sign_ctx])
        dc_dq = int(dq_tbl[0])
        dc_sign_level = (dc_sign - 1) & (2 << 6)

        if qm_tbl is not None:
            dc_dq = (dc_dq * int(qm_tbl[0]) + 16) >> 5
        if dc_tok == 15:
            dc_tok = (ec.golomb("dc_golomb") + 15) & 0xFFFFF
            dc_dq = (dc_dq * dc_tok) & 0xFFFFFF
        else:
            dc_dq = dc_dq * dc_tok
        cul_level = dc_tok
        dc_dq >>= dq_shift
        dc_dq = min(dc_dq, cf_max + dc_sign)
        out[0] = -dc_dq if dc_sign else dc_dq

        if rc:
            cul_level += self._ac_loop(ec, cf, out, rc, dq_tbl, qm_tbl,
                                       dq_shift, cf_max)

        cf_ctx = min(cul_level, 63) | dc_sign_level
        return self._cf2d(out, sw4, sh4), eob, txtp, cf_ctx

    def _ac_loop(self, ec, cf, out, rc, dq_tbl, qm_tbl, dq_shift, cf_max):
        ac_dq = int(dq_tbl[1])
        cul = 0
        while rc:
            sign = ec.equi("ac_sign")
            rc_tok = int(cf[rc])
            if qm_tbl is not None:
                dq = (ac_dq * int(qm_tbl[rc]) + 16) >> 5
            else:
                dq = ac_dq
            if rc_tok >= (15 << 11):
                tok = (ec.golomb("ac_golomb") + 15) & 0xFFFFF
                dq = (dq * tok) & 0xFFFFFF
            else:
                tok = rc_tok >> 11
                dq = dq * tok
            cul += tok
            dq >>= dq_shift
            dq = min(dq, cf_max + sign)
            out[rc] = -dq if sign else dq
            rc = rc_tok & 0x3FF
        return cul

    @staticmethod
    def _cf2d(out, sw4, sh4):
        """dav1d cf layout buf[y + x*sh] -> (sh, sw) array [y][x]."""
        sh, sw = 4 * sh4, 4 * sw4
        return out[:sw * sh].reshape(sw, sh).T.copy()

    def _uv_inter_txtp(self, uvt_dim, b):
        raise NotImplementedError

    def _get_skip_ctx(self, t_dim, bs, a_arr, a_off, l_arr, l_off, chroma):
        b_dim = T_BLOCK_DIM[bs]
        lw, lh = int(t_dim[2]), int(t_dim[3])
        if chroma:
            ss_ver, ss_hor = self.ss_ver, self.ss_hor
            bl2w, bl2h = int(b_dim[2]), int(b_dim[3])
            not_one_blk = (bl2w - (1 if bl2w and ss_hor else 0) > lw or
                           bl2h - (1 if bl2h and ss_ver else 0) > lh)
            ca = int(np.any(a_arr[a_off:a_off + (1 << lw)] != 0x40))
            cl = int(np.any(l_arr[l_off:l_off + (1 << lh)] != 0x40))
            return 7 + 3 * int(not_one_blk) + ca + cl
        if int(b_dim[2]) == lw and int(b_dim[3]) == lh:
            return 0
        la = 0
        for k in range(1 << lw):
            la |= int(a_arr[a_off + k])
        ll = 0
        for k in range(1 << lh):
            ll |= int(l_arr[l_off + k])
        return int(T_SKIP_CTX[min(la & 0x3F, 4)][min(ll & 0x3F, 4)])

    def _get_dc_sign_ctx(self, tx, a_arr, a_off, l_arr, l_off):
        t_dim = T_TXFM[tx]
        tw, th = int(t_dim[0]), int(t_dim[1])
        s = 0
        n = 0
        for k in range(tw):
            s += int(a_arr[a_off + k]) >> 6
            n += 1
        for k in range(th):
            s += int(l_arr[l_off + k]) >> 6
            n += 1
        s -= n
        return (s != 0) + (s > 0)


def _neg_deinterleave(diff, ref, max_):
    if not ref:
        return diff
    if ref >= max_ - 1:
        return max_ - diff - 1
    if 2 * ref < max_:
        if diff <= 2 * ref:
            return ref + ((diff + 1) >> 1) if diff & 1 else ref - (diff >> 1)
        return diff
    else:
        if diff <= 2 * (max_ - ref - 1):
            return ref + ((diff + 1) >> 1) if diff & 1 else ref - (diff >> 1)
        return max_ - (diff + 1)
