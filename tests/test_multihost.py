"""Real multi-process decode cluster: 2 hosts x 4 virtual devices over
jax.distributed (coordination service + gloo collectives), exercising
parallel/multihost's global mesh, GOP frame assignment and DCN ref-plane
exchange end-to-end.  On TPU pods the identical code runs over ICI/DCN.
"""
import os
import socket
import subprocess
import sys
import textwrap
from pathlib import Path

import numpy as np
import pytest

sys.path.insert(0, str(Path(__file__).parent))

from dav1d_mirror_tpu.parallel.multihost import assign_level_frames  # noqa: E402
from dav1d_mirror_tpu.parallel.frame_pipe import plan_gop_levels  # noqa: E402


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


WORKER = textwrap.dedent("""
    import os, sys
    os.environ['JAX_PLATFORMS'] = 'cpu'
    os.environ['XLA_FLAGS'] = '--xla_force_host_platform_device_count=4'
    import jax
    jax.config.update('jax_platforms', 'cpu')
    import numpy as np
    sys.path.insert(0, %(repo)r)
    from dav1d_mirror_tpu.parallel.multihost import (
        init_multihost, global_mesh, exchange_level_refs)

    pid = int(sys.argv[1])
    init_multihost('127.0.0.1:%(port)d', 2, pid)
    mesh = global_mesh(2, 4)

    H, W = 32, 48
    rng = np.random.default_rng(0)
    ref3 = rng.integers(0, 256, (H, W)).astype(np.int32)   # host 0 owns
    ref5 = rng.integers(0, 1024, (H, W)).astype(np.int32)  # host 1 owns
    produced = {
        3: (0, ref3 if pid == 0 else None),
        5: (1, ref5 if pid == 1 else None),
    }
    got = exchange_level_refs(mesh, pid, produced, (H, W))
    assert np.array_equal(got[3], ref3), 'slot 3 exchange mismatch'
    assert np.array_equal(got[5], ref5), 'slot 5 exchange mismatch'
    print(f'host{pid} OK', flush=True)
""")


def test_two_process_ref_exchange(tmp_path):
    """Both hosts converge to identical reference state after one
    exchange round (the DCN analogue of dav1d sharing Dav1dThreadPicture
    refs between frame contexts, src/picture.c ref propagation)."""
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER % dict(repo=str(Path(__file__).parent.parent),
                                    port=port))
    procs = [subprocess.Popen([sys.executable, str(script), str(i)],
                              stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for i in range(2)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=180)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"host{i} failed:\n{out[-3000:]}"
        assert f"host{i} OK" in out


def test_assign_level_frames_round_robin():
    """GOP levels -> host assignment: every frame appears exactly once,
    independent frames of a level spread across hosts."""
    class F:
        def __init__(self, ft, refidx, refresh):
            self.frame_type = ft
            self.refidx = refidx
            self.refresh_frame_flags = refresh

    hdrs = [F(0, [0] * 7, 0xFF),          # keyframe writes all slots
            F(1, [0] * 7, 0x02),          # level 1
            F(1, [0] * 7, 0x04),          # level 1 (independent)
            F(1, [1] * 7, 0x08)]          # level 2 (reads slot 1)
    levels = plan_gop_levels(hdrs)
    assert levels == [[0], [1, 2], [3]]
    a = assign_level_frames(levels, 2)
    assert a[1][0] == [1] and a[1][1] == [2]
    seen = sorted(fi for lvl in a for fs in lvl.values() for fi in fs)
    assert seen == [0, 1, 2, 3]
