"""Descriptor-volume breakdown of the fused frame program (host-only).

Runs the entropy pass + build_frame_program for each frame of a cached
bench stream and reports bytes emitted into the descriptor buffers per
op kind (the upload IS steady-state frame time on the tunneled TPU, see
PROFILE_r05.json). No device work: planning/packing is host-side.

Usage: python tools_dev/desc_breakdown.py [stream.ivf] [--intra-engine]
"""
import argparse
import collections
import glob
import sys

sys.path.insert(0, ".")

import numpy as np  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream", nargs="?",
                    default=sorted(glob.glob(
                        "bench_cache/e2e_1080p_inter_cdef_*.ivf"))[0])
    ap.add_argument("--intra-engine", action="store_true")
    args = ap.parse_args()

    from dav1d_mirror_tpu import api
    from dav1d_mirror_tpu.host.demux import open_demuxer
    from dav1d_mirror_tpu.models import tpu_inter, frame_exec

    # record (current op kind) -> bytes per emit call
    sizes = collections.Counter()
    counts = collections.Counter()
    orig_op = frame_exec.FrameProgram.op
    pending = [collections.Counter(), collections.Counter()]

    def spy_emit(name, width):
        orig = getattr(frame_exec.FrameProgram, name)

        def wrapper(self, arr):
            h = orig(self, arr)
            a = np.asarray(arr)
            pending[0][width] += a.size * (width // 8)
            pending[1][width] += 1
            return h
        return wrapper

    def spy_op(self, *rec):
        for w, b in pending[0].items():
            sizes[(rec[0], w)] += b
            counts[(rec[0], w)] += pending[1][w]
        pending[0].clear()
        pending[1].clear()
        return orig_op(self, *rec)

    frame_exec.FrameProgram.op = spy_op
    frame_exec.FrameProgram.emit = spy_emit("emit", 32)
    frame_exec.FrameProgram.emit16 = spy_emit("emit16", 16)
    frame_exec.FrameProgram.emit8 = spy_emit("emit8", 8)

    # build-only decode: replace run_frame_program with a stub that
    # returns zero planes (we never look at pixels)
    orig_run = frame_exec.run_frame_program

    def stub_run(prog, refsrc, fuse=None):
        import jax.numpy as jnp
        sig, desc, desc16, desc8 = prog.finalize()
        n_hres = sum(1 for op in sig[0]
                     if op[0] in ("hres", "hresm", "hresc", "hresmc"))
        if prog.plane_inputs:
            planes = list(refsrc)
        else:
            planes = [jnp.zeros(s, jnp.int32) for s in prog.plane_shapes]
        hres = []
        for op in sig[0]:
            if op[0] in ("hres", "hresm"):
                shape = op[2][1] if op[0] == "hresm" else op[3][1]
                hres.append(jnp.zeros(shape, jnp.int32))
            elif op[0] == "hresc":
                hres.append(jnp.zeros((op[5][1][0], op[3], op[4]),
                                      jnp.int32))
            elif op[0] == "hresmc":
                hres.append(jnp.zeros((op[4][1][0], op[2], op[3]),
                                      jnp.int32))
        if sig[7]:
            planes = [p.astype(jnp.dtype(sig[7])) for p in planes]
        return tuple(planes), tuple(hres)

    frame_exec.run_frame_program = stub_run

    data = open(args.stream, "rb").read()
    _, it = open_demuxer(data)
    dec = api.Decoder(api.Settings(
        logger=None, use_tpu_inter=True, use_tpu_filters=True,
        use_tpu_intra_engine=args.intra_engine, apply_grain=False))
    n = 0
    for tu in it:
        try:
            dec.send_obus(tu)
        except Exception as e:
            print("decode stopped:", e)
            break
        while dec.get_picture() is not None:
            n += 1
    print(f"{n} frames; bytes emitted per op kind (all frames):")
    total = 0
    for (kind, w), b in sizes.most_common():
        total += b
        print(f"  {b/1e6:8.3f}MB  int{w:<3} x{counts[(kind, w)]:5d}  "
              f"{kind}")
    print(f"  total {total/1e6:.2f}MB over {n} frames "
          f"= {total/1e6/max(n,1):.2f}MB/frame")


if __name__ == "__main__":
    main()
