"""Public decoder API (the analogue of dav1d's 3-function hot API).

Mirrors include/dav1d/dav1d.h semantics: a `Decoder` is opened with
`Settings`, fed temporal units with `send_data`, and produces `Picture`s
from `get_picture`; `flush` resets in-flight state for seeking. Unlike
dav1d's pthread pipeline, throughput here comes from batched device kernels
(tiles/blocks as tensor batches), so the API is synchronous: each complete
frame is decoded when its last tile arrives.

Reference parity: dav1d_open src/lib.c:138, dav1d_send_data :437,
dav1d_get_picture :457, dav1d_flush :525, show-existing handling
src/obu.c:1572-1682, inloop-filter debug mask include/dav1d/dav1d.h:66-74.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from .host import headers as h
from .host import obu as obu_mod
from .host.ivf import split_obus
from .host.msac import Msac as _PyMsac
from .host.native import LIB as _native_lib, NativeMsac
from .host.tilecoder import TileCoder, DecodeSide

# The C range decoder (native/msac.cpp) is the production host entropy
# stage; host/msac.py is the behavioral spec + fallback. Set
# DAV1D_TPU_NO_NATIVE=1 to force the Python path.
import os as _os
if _native_lib is not None and not _os.environ.get("DAV1D_TPU_NO_NATIVE"):
    Msac = NativeMsac
else:
    Msac = _PyMsac

# The C++ tile walk (native/tilecoder.cpp) decodes a whole tile's symbol
# stream per FFI call; host/tilecoder.py remains the behavioral spec,
# the fallback, and the encode-side generator. Set
# DAV1D_TPU_NO_NATIVE_TILE=1 (or _NO_NATIVE) to force the Python walk.
_use_native_tile = False
if Msac is NativeMsac and not _os.environ.get("DAV1D_TPU_NO_NATIVE_TILE"):
    from .host.native_tile import available as _nt_available
    _use_native_tile = _nt_available()
from .data.tables import new_cdf_context, qcat_from_qidx, cdf_thread_update

INLOOPFILTER_NONE = 0
INLOOPFILTER_DEBLOCK = 1
INLOOPFILTER_CDEF = 2
INLOOPFILTER_RESTORATION = 4
INLOOPFILTER_ALL = 7

# Dav1dDecodeFrameType (include/dav1d/dav1d.h:71-76)
DECODEFRAMETYPE_ALL = 0
DECODEFRAMETYPE_REFERENCE = 1
DECODEFRAMETYPE_INTRA = 2
DECODEFRAMETYPE_KEY = 3


@dataclass
class Settings:
    """Analogue of Dav1dSettings (include/dav1d/dav1d.h:78-99)."""
    n_threads: int = 0            # accepted for parity; decode is batched
    max_frame_delay: int = 0
    apply_grain: bool = True
    operating_point: int = 0
    all_layers: bool = True
    frame_size_limit: int = 0
    strict_std_compliance: bool = False
    output_invisible_frames: bool = False
    inloop_filters: int = INLOOPFILTER_ALL
    decode_frame_type: int = DECODEFRAMETYPE_ALL
    # Dav1dLogger analogue (dav1d.h:49-59): callable(str) or None for
    # the default stderr logger; False-y disables logging entirely
    logger: object = "default"
    # TPU pipeline routing. None = auto: use the device pixel path when
    # the default JAX backend is a TPU, the host path otherwise (CI on
    # the CPU backend keeps the host path unless tests opt in).
    use_tpu_filters: bool | None = None
    use_tpu_inter: bool | None = None
    # Route intra blocks through the wavefront device intra engine
    # (models/tpu_intra): keyframes run the whole-frame scan, and inter
    # frames embed it in the fused program (emit_mixed_intra) so the
    # frame becomes full_device — no pre-filter plane download, no hres
    # download, no host pass-2. MEASURED r05 (PROFILE_r05.json, config
    # 2 steady, real chip): engine 0.45 fps vs hybrid 1.62 fps — the
    # downloads it saves (~270 ms/frame) are outweighed by the scan's
    # ~1.5 s/frame device execution (vmapped dynamic-slice edge
    # gathers x padded wave count). None (auto) therefore resolves to
    # False until the scan is a fused Pallas wavefront kernel; True
    # forces it (bit-exact, md5-verified on hardware — the mesh-
    # sharded tile path uses it where tiles decode independently).
    use_tpu_intra_engine: bool | None = None


@dataclass
class Picture:
    """Analogue of Dav1dPicture (decoded planes + stream metadata)."""
    planes: tuple
    width: int = 0
    height: int = 0
    bitdepth: int = 8
    layout: int = h.PIXEL_LAYOUT_I420
    frame_hdr: object = None
    seq_hdr: object = None
    # HDR metadata props (Dav1dPicture content_light/mastering_display/
    # itut_t35, picture.h:52-63)
    content_light: tuple = None
    mastering_display: dict = None
    itut_t35: tuple = ()
    # first picture of a temporal unit (PICTURE_FLAG_NEW_TEMPORAL_UNIT)
    new_temporal_unit: bool = False


from .errors import DecodeError  # noqa: E402  (re-export; shared so
#                                  deep decode stages raise it directly)


# Dav1dEventFlags (dav1d.h:268-295)
EVENT_FLAG_NEW_SEQUENCE = 1
EVENT_FLAG_NEW_OP_PARAMS_INFO = 2


def _tpu_backend_present() -> bool:
    """Auto-detect for Settings.use_tpu_*=None: device path on when the
    default JAX backend is a TPU (overridable via DAV1D_TPU_NO_TPU=1)."""
    if _os.environ.get("DAV1D_TPU_NO_TPU"):
        return False
    try:
        import jax
        return jax.default_backend() == "tpu"
    except Exception:
        return False


def get_frame_delay(settings: Settings | None = None) -> int:
    """dav1d_get_frame_delay (include/dav1d/dav1d.h:323): how many
    frames a decoder opened with these settings may buffer internally
    before get_picture returns the first one."""
    s = settings or Settings()
    if s.max_frame_delay < 0 or s.max_frame_delay > 256 or \
            s.n_threads < 0 or s.n_threads > 256:
        raise ValueError("invalid settings")
    if s.n_threads > 1 or s.max_frame_delay > 1:
        return max(s.max_frame_delay, 2)
    return 1


def _gather_planes(pixel_fut, bufs):
    """Gather-stage job (in-order, one per frame): wait for the frame's
    pixel stage, then pull the deferred device->host plane download
    into bufs.planes. Runs on its own worker so the tunnel transfer of
    frame N overlaps frame N+1's dispatch/compute. The download is one
    packed flat buffer (frame_exec "outpack") split host-side — one
    tunnel round-trip per frame instead of one per plane."""
    pixel_fut.result()
    pend = getattr(bufs, "_pending_dl", None)
    if pend is not None:
        bufs._pending_dl = None
        from .utils.trace import trace_scope
        with trace_scope("filters.download"):
            if isinstance(pend, (list, tuple)):   # per-plane buffers
                for i, p in enumerate(pend):
                    bufs.planes[i] = np.asarray(p).astype(
                        bufs.planes[i].dtype)
            else:
                flat = np.asarray(pend)
                off = 0
                for i, tgt in enumerate(bufs.planes):
                    n = tgt.size
                    bufs.planes[i] = flat[off:off + n].reshape(
                        tgt.shape).astype(tgt.dtype, copy=False)
                    off += n
    return bufs


def _wait_host_planes(refs):
    """Block until every reference's HOST planes are final (their
    gather-stage download finished). Device-path consumers bind
    dev_planes and never need this; host recon / the Python fallback
    walk read refs[...].planes directly."""
    for rb in refs or ():
        f = getattr(rb, "_gather_fut", None)
        if f is not None:
            f.result()


_warmed = [False]


def _warm_transfer_path():
    """The tunneled TPU backend pays a large one-time cost (~30 s
    measured) on the FIRST device->host transfer of a process —
    unrelated to data size, and serial with the first frame's download
    if left to happen there. Kick it off on a daemon thread at decoder
    open so it overlaps OBU parsing / entropy decode / XLA compiles of
    the first frames instead."""
    if _warmed[0]:
        return
    _warmed[0] = True

    def work():
        try:
            import jax
            import jax.numpy as jnp
            if jax.devices()[0].platform not in ("tpu", "axon"):
                return
            np.asarray(jnp.zeros(8, jnp.int32))
        except Exception:
            pass

    import threading
    threading.Thread(target=work, daemon=True,
                     name="dav1d-tunnel-warm").start()


class Decoder:
    """dav1d_open/send_data/get_picture/flush/close as one object."""

    def __init__(self, settings: Settings | None = None):
        self.s = settings or Settings()
        if self.s.frame_size_limit and self.s.frame_size_limit < 0:
            raise ValueError("invalid frame_size_limit")
        if self.s.use_tpu_inter or self.s.use_tpu_filters:
            # amortize XLA compiles across processes (tunneled-TPU
            # compiles cost seconds; see utils/jit_cache)
            from .utils.jit_cache import enable_persistent_cache
            enable_persistent_cache()
            _warm_transfer_path()
        # frame pipelining (dav1d frame threading re-expressed as
        # host-entropy(N+1) || device-pixels(N) software pipelining):
        # a single in-order pixel worker; entropy and all reference-state
        # updates stay on the caller thread (they only depend on entropy).
        self._pipe = None
        self._build_pipe = None
        self._inflight = []
        # grow-only packing schema: successive frames converge to ONE
        # compiled fused program (models/tpu_inter.ProgramSchema);
        # sticky across flush() — seeks shouldn't recompile. Created
        # lazily so host-only decoding never imports the device stack.
        self._prog_schema = None
        self._gather_pipe = None
        self._ginflight = []
        if self.s.n_threads > 1 or self.s.max_frame_delay > 1:
            import concurrent.futures as _cf
            self._pipe = _cf.ThreadPoolExecutor(max_workers=1)
            # program building gets its own workers, making the
            # pipeline 4-stage: entropy(N+2..) [native, GIL-free] ||
            # build(N+1, N+2) [Python planning, 2-wide — ProgramSchema
            # is lock-protected; the pixel worker consumes builds
            # strictly in order via each frame's future] ||
            # device-pixels(N) || download-gather(N-1)
            self._build_pipe = _cf.ThreadPoolExecutor(
                max_workers=2 if self.s.n_threads >= 2 else 1)
            # output-plane downloads run on a 4th in-order stage so the
            # ~30 MB/s tunnel transfer of frame N overlaps frame N+1's
            # dispatch/compute instead of serializing the pixel worker
            self._gather_pipe = _cf.ThreadPoolExecutor(max_workers=1)
            self._frame_delay = max(self.s.max_frame_delay, 2)
        self.flush()

    # -- lifecycle ---------------------------------------------------------
    def _drain_pipe(self):
        if self._pipe is not None:
            for f in self._inflight:
                try:
                    f.result()
                except Exception:
                    pass
            self._inflight = []
        if self._gather_pipe is not None:
            for f in self._ginflight:
                try:
                    f.result()
                except Exception:
                    pass
            self._ginflight = []

    def _maybe_save_schema(self):
        """Persist the packing schema when it grew (utils/schema_cache);
        cheap no-op otherwise."""
        s = self._prog_schema
        if s is None or getattr(self, "_schema_key", None) is None:
            return
        fp = (len(s.counts), sum(s.counts.values()),
              sum(len(v) for v in s.keysets.values()))
        if fp != getattr(self, "_schema_fp", None):
            from .utils import schema_cache
            schema_cache.save_schema(s, self._schema_key)
            self._schema_fp = fp

    def flush(self):
        """dav1d_flush: drop in-flight state, keep the sequence header."""
        self._drain_pipe()
        self._maybe_save_schema()
        seq = getattr(self, "_st", None) and self._st.seq_hdr
        self._st = obu_mod.ObuState()
        self._st.seq_hdr = seq
        self._st.operating_point = self.s.operating_point
        self._refs = [None] * 8       # FrameBuffers (post-filter planes)
        self._ref_cdfs = [None] * 8
        self._ref_tmvs = [None] * 8
        self._ref_refpoc = [[0] * 7 for _ in range(8)]
        self._ref_segmaps = [None] * 8
        self._out = []                # decoded Picture queue
        self._sl_cache = None         # spatial-layer candidate (lib.c:331)
        self._errored_slots = set()   # refs poisoned by decode errors
        self._event_flags = 0
        self.last_error = None        # dav1d_get_decode_error_data_props

    def close(self):
        self._drain_pipe()
        self._maybe_save_schema()
        if self._pipe is not None:
            self._pipe.shutdown(wait=True)
            self._pipe = None
        if self._build_pipe is not None:
            self._build_pipe.shutdown(wait=True)
            self._build_pipe = None
        if self._gather_pipe is not None:
            self._gather_pipe.shutdown(wait=True)
            self._gather_pipe = None
        self._out = []
        self._refs = [None] * 8

    def _log(self, msg: str):
        lg = self.s.logger
        if lg == "default":
            import sys
            print(f"dav1d_mirror_tpu: {msg}", file=sys.stderr)
        elif callable(lg):
            lg(msg)

    def get_event_flags(self) -> int:
        """dav1d_get_event_flags: returns and clears accumulated flags."""
        f = self._event_flags
        self._event_flags = 0
        return f

    # Auto-routing crossover, from round-4/5 measurements on this
    # image's tunneled TPU (BENCH_r04/BENCH_r05, PROFILE_r05): at 1080p
    # the batched pipeline wins by 20-50x (1.29 fps steady vs
    # 0.026-0.06 fps for the per-block host walk); at 448x256 the host
    # walk wins (16.5 vs 8.36 fps). The crossover sits between those
    # sizes; 400k pixels (~854x480) is the recorded estimate. Frames at
    # or above it auto-route to the batched pipeline — on the TPU
    # backend when present, else the SAME pipeline on the CPU backend
    # (eager per-kernel jit, frame_exec._fuse_default): the numpy/
    # python per-block walk exists as the behavioral spec and small-
    # frame path, not as the HD fallback (it does ~0.03 fps at 1080p).
    AUTO_MIN_PIX = 400_000

    def _route_tpu(self, fhdr):
        """Resolve the use_tpu_* auto setting (None): batched pixel
        pipeline for frames >= AUTO_MIN_PIX pixels (any JAX backend),
        host walk otherwise. DAV1D_TPU_AUTO_MIN_PIX overrides the
        crossover (0 routes every size to the pipeline);
        DAV1D_TPU_NO_TPU=1 forces the host walk at every size."""
        ui, uf = self.s.use_tpu_inter, self.s.use_tpu_filters
        if ui is None or uf is None:
            min_pix = int(_os.environ.get("DAV1D_TPU_AUTO_MIN_PIX",
                                          self.AUTO_MIN_PIX))
            auto = (not _os.environ.get("DAV1D_TPU_NO_TPU") and
                    fhdr.width[1] * fhdr.height >= min_pix)
            ui = auto if ui is None else ui
            uf = auto if uf is None else uf
            if (ui or uf) and _tpu_backend_present():
                from .utils.jit_cache import enable_persistent_cache
                enable_persistent_cache()
                _warm_transfer_path()
        return bool(ui), bool(uf)

    # -- input -------------------------------------------------------------
    def send_data(self, data: bytes):
        """Feed one temporal unit (a sequence of length-prefixed OBUs).
        Decodes any frame completed by this data."""
        self.send_obus(o for _, o in split_obus(data))

    def send_obus(self, obus):
        """Feed individual complete OBUs (with or without size fields).

        Errors are CONTAINED (SURVEY §5.3 / dav1d abort_frame): a frame
        that fails to parse or decode poisons the reference slots it
        would have refreshed and raises DecodeError, but the decoder
        object stays consistent — feeding the next keyframe (or calling
        flush()) resumes normal operation."""
        prev_seq = self._st.seq_hdr
        for obu_data in obus:
            try:
                obu_mod.parse_obus(self._st, obu_data)
            except Exception as e:
                self._contain_error(e)
            if self._st.seq_hdr is not prev_seq:
                prev_seq = self._st.seq_hdr
                self._event_flags |= (EVENT_FLAG_NEW_SEQUENCE |
                                      EVENT_FLAG_NEW_OP_PARAMS_INFO)
            if self._st.frame_ready:
                self._st.frame_ready = False
                try:
                    self._handle_frame()
                except Exception as e:
                    self._contain_error(e)

    def _contain_error(self, e):
        st = self._st
        fhdr = st.frame_hdr
        if fhdr is not None and getattr(fhdr, "refresh_frame_flags", 0):
            for i in range(8):
                if (fhdr.refresh_frame_flags >> i) & 1:
                    self._errored_slots.add(i)
        st.frame_hdr = None
        st.tiles = []
        st.n_tiles = 0
        st.frame_ready = False
        self.last_error = e
        self._log(f"decode error contained: {e}")
        raise DecodeError(str(e)) from e

    # -- output ------------------------------------------------------------
    def get_picture(self) -> Picture | None:
        if not self._out:
            return None
        p = self._out.pop(0)
        fut = getattr(p, "_ready", None)
        if fut is not None:
            try:
                fut.result()
            except Exception as e:  # contained like synchronous errors
                self.last_error = e
                raise DecodeError(str(e)) from e
            p._ready = None
        return p

    def apply_grain(self, pic: Picture) -> Picture:
        """dav1d_apply_grain (include/dav1d/dav1d.h:235): synthesize
        film grain onto an already-decoded picture, standalone — for
        callers who opened the decoder with apply_grain=False and want
        grain on selected frames only. Returns a new Picture (the input
        is left untouched)."""
        fhdr, seq = pic.frame_hdr, pic.seq_hdr
        if fhdr is None or not getattr(fhdr, "film_grain_present", 0):
            return pic
        if self.s.use_tpu_filters:
            from .ops.filmgrain_tpu import apply_film_grain_tpu \
                as _apply
        else:
            from .ops.ref.filmgrain import apply_film_grain as _apply
        # grain synthesis expects PADDED reconstruction planes (the
        # in-decoder path grains before cropping): on odd luma dims the
        # chroma pass reads luma column/row `width`/`height`
        # (ops/ref/filmgrain.py). A Picture carries the CROPPED visible
        # planes, so edge-replicate the luma pad the grain pass needs.
        planes = pic.planes
        pw, ph = pic.width & 1, pic.height & 1
        if pw or ph:
            planes = (np.pad(planes[0], ((0, ph), (0, pw)),
                             mode="edge"),) + tuple(planes[1:])
        planes = _apply(planes, seq, fhdr, pic.width, pic.height)
        from dataclasses import replace as _dc_replace
        planes = tuple(np.asarray(p) for p in planes)
        if pw or ph:
            planes = (planes[0][:pic.height, :pic.width],) + planes[1:]
        return _dc_replace(pic, planes=planes)

    # -- internals ---------------------------------------------------------
    def _emit(self, bufs, fhdr):
        seq = self._st.seq_hdr
        st = self._st
        t35 = tuple(st.itut_t35)
        st.itut_t35 = []
        new_tu = st.new_temporal_unit
        st.new_temporal_unit = False
        w, hgt = bufs.width, bufs.height
        pic = Picture((), width=w, height=hgt,
                      bitdepth=seq.bitdepth, layout=seq.layout,
                      frame_hdr=fhdr, seq_hdr=seq,
                      content_light=st.content_light,
                      mastering_display=st.mastering_display,
                      itut_t35=t35, new_temporal_unit=new_tu)
        settings = self.s

        grain_on_device = bool(
            settings.use_tpu_filters
            if settings.use_tpu_filters is not None
            else getattr(self, "_last_route", (False, False))[1])

        def finalize():
            # a failed download (gather stage) must surface at
            # pic._ready, not silently emit never-filled planes
            gf = getattr(bufs, "_gather_fut", None)
            if gf is not None:
                gf.result()
            planes = bufs.planes
            if settings.apply_grain and fhdr.film_grain_present:
                from .utils.trace import trace_scope
                if grain_on_device:
                    from .ops.filmgrain_tpu import apply_film_grain_tpu \
                        as apply_film_grain
                else:
                    from .ops.ref.filmgrain import apply_film_grain
                with trace_scope("film-grain"):
                    planes = apply_film_grain(planes, seq, fhdr,
                                              bufs.width, bufs.height)
            vis = [planes[0][:hgt, :w]]
            if len(planes) > 1:
                cw = (w + bufs.ss_hor) >> bufs.ss_hor
                ch = (hgt + bufs.ss_ver) >> bufs.ss_ver
                vis += [p[:ch, :cw] for p in planes[1:]]
            pic.planes = tuple(vis)

        if self._gather_pipe is not None:
            # ordered after the frame's gather job (plane downloads) on
            # the 1-worker gather queue — finalize reads bufs.planes
            pic._ready = self._gather_pipe.submit(finalize)
        elif self._pipe is not None:
            # ordered after the frame's pixel job on the 1-worker queue
            pic._ready = self._pipe.submit(finalize)
        else:
            finalize()
        self._queue_out(pic)

    def _queue_out(self, p):
        """Spatial-layer output gating (dav1d lib.c
        output_picture_ready:331): with all_layers off and a multi-
        spatial-layer operating point, hold one candidate per temporal
        unit and emit it when the top spatial layer arrives or the next
        temporal unit begins."""
        st = self._st
        if self.s.all_layers or not st.max_spatial_id:
            self._out.append(p)
            return
        c = self._sl_cache
        if c is not None and (
                c.frame_hdr.spatial_id == st.max_spatial_id or
                p.new_temporal_unit):
            self._out.append(c)
        self._sl_cache = p

    def drain(self):
        """End-of-input: release the held spatial-layer candidate
        (the reference drains its cache when input runs out)."""
        if self._sl_cache is not None:
            self._out.append(self._sl_cache)
            self._sl_cache = None

    def _handle_frame(self):
        st = self._st
        seq, fhdr = st.seq_hdr, st.frame_hdr
        if fhdr.show_existing_frame:
            if self._skip_by_frame_type(
                    st.refs[fhdr.existing_frame_idx], False):
                st.tiles = []
                st.n_tiles = 0
                return
            bufs = self._refs[fhdr.existing_frame_idx]
            if bufs is None:
                raise DecodeError("show_existing of empty slot")
            self._emit(bufs, st.refs[fhdr.existing_frame_idx])
            st.tiles = []
            st.n_tiles = 0
            return
        if self._skip_by_frame_type(fhdr, True):
            # headers-only slot update (dav1d obu.c:1713-1726)
            for i in range(8):
                if (fhdr.refresh_frame_flags >> i) & 1:
                    st.refs[i] = fhdr
            st.tiles = []
            st.n_tiles = 0
            return
        bufs = self._decode_frame(seq, fhdr)
        if fhdr.show_frame or self.s.output_invisible_frames:
            self._emit(bufs, fhdr)
        st.tiles = []
        st.n_tiles = 0
        self._maybe_save_schema()

    def _skip_by_frame_type(self, fhdr, check_refresh):
        """Dav1dDecodeFrameType filtering (dav1d obu.c:1570-1700)."""
        dft = self.s.decode_frame_type
        if dft == DECODEFRAMETYPE_ALL or fhdr is None:
            return False
        non_ref = (check_refresh and dft == DECODEFRAMETYPE_REFERENCE and
                   not fhdr.refresh_frame_flags)
        if fhdr.frame_type in (h.INTER, h.SWITCH):
            return dft > DECODEFRAMETYPE_REFERENCE or non_ref
        if fhdr.frame_type == h.INTRA:
            return dft > DECODEFRAMETYPE_INTRA or non_ref
        return False

    def _decode_frame(self, seq, fhdr):
        from .models import ref_decoder as rd

        st = self._st
        refs = self._refs
        if self.s.frame_size_limit and \
                fhdr.width[1] * fhdr.height > self.s.frame_size_limit:
            raise DecodeError("frame size over limit")
        keyframe = fhdr.frame_type in (0, 2)
        # strict mode: frames referencing error-poisoned slots are
        # themselves in error (dav1d decode.c:3296-3304)
        if not keyframe and self.s.strict_std_compliance and \
                self._errored_slots:
            for i in range(7):
                if fhdr.refidx[i] in self._errored_slots:
                    raise RuntimeError(
                        f"reference slot {fhdr.refidx[i]} is errored")
        rf = None
        ref_poc = None
        jnt_weights = None
        ref_scaled = None
        cur_w = fhdr.width[0]
        if keyframe and fhdr.allow_intrabc:
            from .host.refmvs import RefmvsFrame
            bw4f = ((cur_w + 7) >> 3) << 1
            bh4f = ((fhdr.height + 7) >> 3) << 1
            rf = RefmvsFrame(fhdr, seq, bw4f, bh4f)
        if not keyframe:
            from .host.refmvs import RefmvsFrame
            ref_poc = [st.refs[fhdr.refidx[i]].frame_offset
                       if st.refs[fhdr.refidx[i]] is not None else 0
                       for i in range(7)]
            bw4f = ((cur_w + 7) >> 3) << 1
            bh4f = ((fhdr.height + 7) >> 3) << 1
            rf = RefmvsFrame(fhdr, seq, bw4f, bh4f, ref_poc=ref_poc)
            rf.setup_temporal(
                seq, fhdr, ref_poc,
                [self._ref_refpoc[fhdr.refidx[i]] for i in range(7)],
                [self._ref_tmvs[fhdr.refidx[i]] for i in range(7)])
            if fhdr.switchable_comp_refs:
                jnt_weights = obu_mod.compute_jnt_weights(seq, fhdr,
                                                          ref_poc)
            ref_scaled = [
                refs[fhdr.refidx[i]] is not None and
                (refs[fhdr.refidx[i]].width != cur_w or
                 refs[fhdr.refidx[i]].height != fhdr.height)
                for i in range(7)]

        if fhdr.primary_ref_frame == h.PRIMARY_REF_NONE:
            cdf_in = new_cdf_context(qcat_from_qidx(fhdr.quant_yac))
        else:
            src = self._ref_cdfs[fhdr.refidx[fhdr.primary_ref_frame]]
            if src is None:
                raise DecodeError("missing primary-ref CDFs")
            cdf_in = src

        prev_segmap = None
        if fhdr.segmentation_enabled and \
                (fhdr.segmentation_temporal or
                 not fhdr.segmentation_update_map) and \
                fhdr.primary_ref_frame != h.PRIMARY_REF_NONE:
            prev_segmap = \
                self._ref_segmaps[fhdr.refidx[fhdr.primary_ref_frame]]

        from .utils.trace import trace_scope

        coders = []
        t = fhdr.tiling
        with trace_scope("host-entropy"):
            for tile_row in range(t.rows):
                for tile_col in range(t.cols):
                    ti = tile_row * t.cols + tile_col
                    data_t, _, _ = rd._tile_payload(st, ti, fhdr)
                    coder = TileCoder(
                        seq, fhdr, cdf_in.copy(),
                        DecodeSide(Msac(data_t,
                                        bool(fhdr.disable_cdf_update))),
                        tile_col=tile_col, tile_row=tile_row, rf=rf,
                        ref_poc=ref_poc, ref_scaled=ref_scaled,
                        prev_segmap=prev_segmap)
                    if _use_native_tile and isinstance(coder.ec.m,
                                                       NativeMsac):
                        from .host.native_tile import code_tile_native
                        code_tile_native(coder)
                    else:
                        coder.code_tile()
                    coders.append(coder)

        # The pixel stage only depends on this frame's entropy outputs
        # and on REFERENCE PIXELS, which the in-order pixel worker has
        # produced by the time this job runs; every piece of reference
        # STATE (CDFs, tmvs, segmaps, pocs) is an entropy-stage product
        # and is updated synchronously below — that is dav1d's frame
        # threading (lowest_pixel gating, thread_task.c:403-431) reborn
        # as host-entropy(N+1) || device-pixels(N) software pipelining.
        final_bufs = rd.FrameBuffers(seq, fhdr, width=fhdr.width[1])
        refs_snapshot = list(refs)
        from .models.plan_vec import all_intra as _all_intra
        pure_intra = _all_intra(coders)
        settings = self.s
        use_tpu_inter, use_tpu_filters = self._route_tpu(fhdr)
        self._last_route = (use_tpu_inter, use_tpu_filters)

        if fhdr.width[0] == fhdr.width[1]:
            work_bufs = final_bufs
        else:
            work_bufs = rd.FrameBuffers(seq, fhdr)  # pre-super-res width

        # Build the fused frame program NOW, on the entropy thread: it
        # reads only entropy products + reference metadata, so it can
        # run while the in-order pixel worker is still executing earlier
        # frames. The worker then only binds ref pixels + dispatches —
        # plan/pack cost overlaps device time instead of serializing
        # with it (dav1d frame threading's tile-vs-recon split,
        # thread_task.c:268-310, reborn for the host/device pipeline).
        # engine auto (None): resolves to False — measured slower than
        # the hybrid path at 1080p (see Settings.use_tpu_intra_engine)
        use_eng = bool(settings.use_tpu_intra_engine)
        self._last_eng = use_eng
        built_fut = None
        if use_tpu_inter and not (pure_intra and use_eng):
            from .models.tpu_inter import (build_frame_program,
                                           execute_frame_program,
                                           ProgramSchema)
            from .utils import schema_cache
            # the engine flag is part of the key: engine streams never
            # emit hresm/host-map cases, and a schema polluted with the
            # other mode's case unions forces dead dummy buckets (and
            # their downloads) into every frame
            schema_key = (fhdr.width[1], fhdr.height, seq.bitdepth,
                          seq.layout, "eng" if use_eng else "hyb")
            if self._prog_schema is None:
                self._prog_schema = ProgramSchema()
                # start from the converged packing any previous process
                # reached for this geometry: the first frame then packs
                # at final sizes and hits the persistent XLA cache
                # instead of re-walking the growth ladder of compiles
                schema_cache.load_schema(self._prog_schema, schema_key)
                self._schema_key = schema_key
            schema = self._prog_schema

            def build_work():
                with trace_scope("build-program"):
                    return build_frame_program(
                        seq, fhdr, coders, work_bufs, refs_snapshot,
                        jnt_weights, keep_device=use_tpu_filters,
                        schema=schema, intra_engine=use_eng)

            if self._build_pipe is not None:
                built_fut = self._build_pipe.submit(build_work)
            else:
                _built = build_work()
                built_fut = type("_Now", (), {
                    "result": staticmethod(lambda: _built)})()

        defer_dl = self._gather_pipe is not None and use_tpu_filters

        def pixel_work():
            work = work_bufs
            with trace_scope("reconstruction"):
                if built_fut is not None:
                    execute_frame_program(
                        built_fut.result(), seq, fhdr, coders, work,
                        refs_snapshot, jnt_weights,
                        keep_device=use_tpu_filters)
                elif use_tpu_inter and pure_intra and use_eng:
                    # wavefront device intra engine (models/tpu_intra)
                    from .models.tpu_intra import recon_intra_frame_tpu
                    recon_intra_frame_tpu(seq, fhdr, coders, work)
                else:
                    # host recon reads reference HOST planes — wait out
                    # any still-downloading gather stages for its refs
                    _wait_host_planes(refs_snapshot)
                    rd.recon_frame(seq, fhdr, coders, work,
                                   refs_snapshot, jnt_weights)
            if use_tpu_filters:
                from .models.tpu_filters import apply_inloop_filters_tpu
                with trace_scope("inloop-filters"):
                    out = apply_inloop_filters_tpu(
                        seq, fhdr, coders, work,
                        filters_mask=settings.inloop_filters,
                        defer_download=defer_dl)
            else:
                with trace_scope("inloop-filters"):
                    out = rd.apply_inloop_filters(
                        seq, fhdr, coders, work,
                        filters_mask=settings.inloop_filters)
            if out is not final_bufs:
                pend = getattr(out, "_pending_dl", None)
                if pend is not None:
                    # downloads deferred: hand the device handles to
                    # final_bufs; the gather stage fills its planes
                    out._pending_dl = None
                    final_bufs._pending_dl = pend
                else:
                    for i in range(len(final_bufs.planes)):
                        final_bufs.planes[i][...] = out.planes[i]
                final_bufs.dev_planes = out.dev_planes
            return final_bufs

        if self._pipe is not None:
            fut = self._pipe.submit(pixel_work)
            self._inflight.append(fut)
            if self._gather_pipe is not None:
                gfut = self._gather_pipe.submit(_gather_planes, fut,
                                                final_bufs)
                final_bufs._gather_fut = gfut
                self._ginflight.append(gfut)
                while len(self._ginflight) > self._frame_delay:
                    self._ginflight.pop(0).result()
            while len(self._inflight) > self._frame_delay:
                self._inflight.pop(0).result()
        else:
            pixel_work()
        bufs = final_bufs

        # reference slot updates (entropy-stage products)
        out_cdf = cdf_thread_update(cdf_in,
                                    coders[fhdr.tiling.update].cdf,
                                    keyframe) if fhdr.refresh_context \
            else cdf_in
        cur_tmvs = None
        cur_refpoc = [0] * 7
        if not keyframe:
            rf.save_tmvs_frame()
            cur_tmvs = rf.rp
            cur_refpoc = ref_poc
        cur_segmap = None
        if fhdr.segmentation_enabled:
            if fhdr.segmentation_update_map:
                cur_segmap = coders[0].seg_map.copy()
                for c in coders[1:]:
                    cur_segmap[c.row_start:c.row_end,
                               c.col_start:c.col_end] = \
                        c.seg_map[c.row_start:c.row_end,
                                  c.col_start:c.col_end]
            else:
                cur_segmap = prev_segmap
        for i in range(8):
            if (fhdr.refresh_frame_flags >> i) & 1:
                refs[i] = bufs
                st.refs[i] = fhdr
                self._ref_cdfs[i] = out_cdf
                self._ref_tmvs[i] = cur_tmvs
                self._ref_refpoc[i] = cur_refpoc
                self._ref_segmaps[i] = cur_segmap
                self._errored_slots.discard(i)
        return bufs


def parse_sequence_header(data: bytes) -> h.SequenceHeader:
    """dav1d_parse_sequence_header: scan OBUs for a sequence header."""
    st = obu_mod.ObuState()
    for _, obu_data in split_obus(data):
        try:
            obu_mod.parse_obus(st, obu_data)
        except obu_mod.ParseError:
            continue
        if st.seq_hdr is not None:
            return st.seq_hdr
    raise DecodeError("no sequence header")
