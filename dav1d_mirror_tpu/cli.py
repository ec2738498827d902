"""Command-line decoder (the analogue of tools/dav1d.c).

    python -m dav1d_mirror_tpu.cli -i in.ivf -o out.yuv --muxer yuv

Options mirror the reference CLI (tools/dav1d_cli_parse.c:69-92): input
probing across ivf/annexb/section5, muxer selection, --verify <md5>,
--limit/--skip, --filmgrain, --inloopfilters, --oppoint, --tpu to route
pixel work through the device pipelines, and fps statistics."""
from __future__ import annotations

import argparse
import sys
import time

from .api import (Decoder, Settings, INLOOPFILTER_ALL,
                  DECODEFRAMETYPE_ALL, DECODEFRAMETYPE_REFERENCE,
                  DECODEFRAMETYPE_INTRA, DECODEFRAMETYPE_KEY)
from .host.demux import open_demuxer
from .output import open_muxer


def parse_args(argv=None):
    p = argparse.ArgumentParser(prog="dav1d_mirror_tpu",
                                description="TPU-native AV1 decoder")
    p.add_argument("-i", "--input", required=True)
    p.add_argument("-o", "--output", default="-")
    p.add_argument("--muxer", default=None,
                   choices=["null", "md5", "xxh3", "yuv", "y4m2"])
    p.add_argument("--verify", metavar="HASH",
                   help="exit non-zero unless the md5/xxh3 of the decoded "
                        "planes matches")
    p.add_argument("--limit", type=int, default=0,
                   help="stop after N frames")
    p.add_argument("--skip", type=int, default=0,
                   help="skip decoding of the first N temporal units")
    p.add_argument("--threads", type=int, default=0)
    p.add_argument("--framedelay", type=int, default=0,
                   help="frames in flight for the entropy/pixel "
                        "pipeline (>1 enables it)")
    p.add_argument("--filmgrain", type=int, default=None,
                   help="enable film grain application (default: 1, "
                        "except if muxer is md5 — matches the reference "
                        "CLI, tools/dav1d_cli_parse.c:143,440)")
    p.add_argument("--oppoint", type=int, default=0)
    p.add_argument("--alllayers", type=int, default=1)
    p.add_argument("--sizelimit", type=int, default=0)
    p.add_argument("--outputinvisible", type=int, default=0)
    p.add_argument("--inloopfilters", default="all",
                   choices=["none", "deblock", "cdef", "restoration",
                            "all"])
    p.add_argument("--decodeframetype", default="all",
                   choices=["all", "reference", "intra", "key"],
                   help="decode and return only this class of frames")
    p.add_argument("--strict", type=int, default=0,
                   help="strict standard compliance")
    p.add_argument("--frametimes", metavar="FILE",
                   help="dump per-frame decode times (one ns value per "
                        "line, like the reference CLI)")
    p.add_argument("--profile", metavar="DIR", default=None,
                   help="capture a jax profiler trace of the decode into "
                        "DIR (view with TensorBoard / xprof; device-side "
                        "analogue of the reference's --frametimes+perf "
                        "workflow)")
    p.add_argument("--tracestats", action="store_true",
                   help="print per-stage decode timing summary to stderr")
    p.add_argument("--realtime", action="store_true",
                   help="pace output to the container frame rate "
                        "(tools/dav1d.c:93 synchronization)")
    p.add_argument("--tpu", action="store_true",
                   help="force the batched JAX pixel pipeline at every "
                        "frame size (default: auto — pipeline at/above "
                        "the measured ~400k-pixel crossover, host walk "
                        "below it; DAV1D_TPU_AUTO_MIN_PIX=N moves the "
                        "crossover)")
    p.add_argument("--no-tpu", dest="notpu", action="store_true",
                   help="force the host pixel path even on a TPU backend")
    p.add_argument("--tpuintra", dest="tpuintra", default=None,
                   action="store_true",
                   help="force the device wavefront intra engine "
                        "(models/tpu_intra) on (default: auto — on for "
                        "the pipeline on a real TPU backend)")
    p.add_argument("--no-tpuintra", dest="tpuintra",
                   action="store_false",
                   help="force the hybrid path (host intra recon)")
    p.add_argument("-q", "--quiet", action="store_true")
    return p.parse_args(argv)


_ILF = {"none": 0, "deblock": 1, "cdef": 2, "restoration": 4,
        "all": INLOOPFILTER_ALL}
_DFT = {"all": DECODEFRAMETYPE_ALL, "reference": DECODEFRAMETYPE_REFERENCE,
        "intra": DECODEFRAMETYPE_INTRA, "key": DECODEFRAMETYPE_KEY}


def main(argv=None):
    import os
    if os.environ.get("JAX_PLATFORMS"):
        # the axon sitecustomize pins jax_platforms to the TPU backend;
        # honor an explicit JAX_PLATFORMS request through the config API
        # so `JAX_PLATFORMS=cpu` CLI runs work under that sitecustomize
        try:
            import jax
            jax.config.update("jax_platforms",
                              os.environ["JAX_PLATFORMS"])
        except Exception as e:
            import sys as _sys
            print(f"dav1d_mirror_tpu: could not apply "
                  f"JAX_PLATFORMS={os.environ['JAX_PLATFORMS']}: {e}",
                  file=_sys.stderr)
    args = parse_args(argv)
    if args.verify and not args.muxer:
        args.muxer = "md5"
    if not args.muxer:
        args.muxer = "null" if args.output in ("-", "/dev/null") else "yuv"
    if args.filmgrain is None:
        # dav1d_cli_parse.c:143 — grain off by default for hash muxers
        args.filmgrain = 0 if args.muxer in ("md5", "xxh3") else 1

    with open(args.input, "rb") as f:
        data = f.read()
    name, units = open_demuxer(data)
    from .host.demux import container_fps
    fps = container_fps(data)

    settings = Settings(
        n_threads=args.threads,
        max_frame_delay=args.framedelay,
        apply_grain=bool(args.filmgrain),
        operating_point=args.oppoint,
        all_layers=bool(args.alllayers),
        frame_size_limit=args.sizelimit,
        output_invisible_frames=bool(args.outputinvisible),
        inloop_filters=_ILF[args.inloopfilters],
        decode_frame_type=_DFT[args.decodeframetype],
        strict_std_compliance=bool(args.strict),
        # --tpu forces on, --no-tpu forces off, neither = auto-detect
        use_tpu_filters=True if args.tpu else (False if args.notpu
                                               else None),
        use_tpu_inter=True if args.tpu else (False if args.notpu
                                             else None),
        use_tpu_intra_engine=args.tpuintra,
    )
    dec = Decoder(settings)
    mux = open_muxer(args.muxer, args.output, fps=fps)

    if args.tracestats:
        from .utils import trace
        trace.enabled = True
        trace.reset()

    if args.profile:
        import jax
        jax.profiler.start_trace(args.profile)

    n = 0
    frametimes = [] if args.frametimes else None
    t0 = time.perf_counter()
    for i, obus in enumerate(units):
        if i < args.skip:
            continue
        tu0 = time.perf_counter_ns()
        dec.send_obus(obus)
        while True:
            pic = dec.get_picture()
            if pic is None:
                break
            if args.realtime and fps[0]:
                target = t0 + n * fps[1] / fps[0]
                delay = target - time.perf_counter()
                if delay > 0:
                    time.sleep(delay)
            mux.write(pic)
            n += 1
            if frametimes is not None:
                frametimes.append(time.perf_counter_ns() - tu0)
                tu0 = time.perf_counter_ns()
        if args.limit and n >= args.limit:
            break
    dec.drain()
    while (pic := dec.get_picture()) is not None:
        mux.write(pic)
        n += 1
    if frametimes is not None:
        with open(args.frametimes, "w") as f:
            f.write("".join(f"{t}\n" for t in frametimes))
    digest = mux.finish()
    dt = time.perf_counter() - t0
    if args.profile:
        import jax
        jax.profiler.stop_trace()

    if not args.quiet:
        fps = n / dt if dt else 0.0
        print(f"Decoded {n} frames in {dt:.3f}s ({fps:.2f} fps) "
              f"[{name} container]", file=sys.stderr)
    if args.tracestats:
        from .utils import trace
        trace.report(out=sys.stderr)

    if args.verify:
        if digest != args.verify.strip().lower():
            print(f"Verification failed: got {digest}, "
                  f"expected {args.verify}", file=sys.stderr)
            return 1
        if not args.quiet:
            print("Verified.", file=sys.stderr)
    return 0


if __name__ == "__main__":
    sys.exit(main())
