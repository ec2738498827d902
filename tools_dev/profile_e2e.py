"""Per-stage time split of a real device-path decode (VERDICT r3 #1).

Decodes a cached bench stream twice in-process (pass 1 = compile+cache
populate, pass 2 = steady-state replay) with utils/trace enabled, and
prints the per-stage table: host entropy / build (plan/pack) / ref-bind
/ execute (dispatch+device) / download / host-pass2 / filters, plus
per-frame wall times for both passes.

Usage: python tools_dev/profile_e2e.py [stream.ivf] [--passes N]
"""
import argparse
import glob
import json
import sys
import time

sys.path.insert(0, ".")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("stream", nargs="?",
                    default=sorted(glob.glob(
                        "bench_cache/e2e_1080p_inter_cdef_*.ivf"))[0])
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--threads", type=int, default=1,
                    help="n_threads for the Decoder (1 = sync, "
                         "2 = 3-stage pipeline)")
    ap.add_argument("--json", default=None,
                    help="write the split table to this JSON file")
    ap.add_argument("--intra-engine", action="store_true",
                    help="use_tpu_intra_engine=True (mixed-frame device "
                         "intra: inter frames become full_device)")
    ap.add_argument("--host", action="store_true",
                    help="profile the HOST pixel path instead")
    args = ap.parse_args()

    from dav1d_mirror_tpu import api
    from dav1d_mirror_tpu.host.demux import open_demuxer
    from dav1d_mirror_tpu.utils import trace

    data = open(args.stream, "rb").read()
    _, it = open_demuxer(data)
    units = list(it)

    trace.enabled = True
    result = {"stream": args.stream, "passes": []}
    dec = api.Decoder(api.Settings(
        logger=None, use_tpu_inter=not args.host,
        use_tpu_filters=not args.host,
        use_tpu_intra_engine=args.intra_engine,
        n_threads=args.threads, apply_grain=True))
    import os
    xprof_dir = os.environ.get("PROF_TRACE")
    for pno in range(args.passes):
        jt = None
        if xprof_dir and pno == args.passes - 1:
            import jax
            jt = jax.profiler.trace(xprof_dir)
            jt.__enter__()
        trace.reset()
        from dav1d_mirror_tpu.output import MD5Muxer
        mux = MD5Muxer()
        frame_times = []
        t0 = time.perf_counter()
        last = t0
        n = 0
        for tu in units:
            dec.send_obus(tu)
            while (pic := dec.get_picture()) is not None:
                mux.write(pic)
                now = time.perf_counter()
                frame_times.append(round(now - last, 4))
                last = now
                n += 1
                print(f"[pass {pno}] frame {n}: {frame_times[-1]:.2f}s",
                      flush=True)
        total = time.perf_counter() - t0
        stages = {k: (round(v * 1000, 1), c)
                  for k, (v, c) in sorted(trace.stats().items(),
                                          key=lambda kv: -kv[1][0])}
        print(f"== pass {pno}: {n} frames in {total:.2f}s "
              f"({n / total:.3f} fps) ==")
        print(trace.report())
        print("frame times:", frame_times)
        md5 = mux.digest()
        print(f"[pass {pno}] md5: {md5}")
        result["passes"].append({
            "frames": n, "total_s": round(total, 2),
            "fps": round(n / total, 3), "md5": md5,
            "frame_times_s": frame_times,
            "stages_ms_total": stages})
        if jt is not None:
            jt.__exit__(None, None, None)
        dec.flush()
        # re-demux: units are reusable, flush resets decoder state
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({"fps_steady": result["passes"][-1]["fps"]}))


if __name__ == "__main__":
    main()
