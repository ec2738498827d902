"""Native (C++) host entropy stage vs the Python behavioral spec.

Three layers of validation:
1. symbol round-trip — encode random symbol sequences with testing/ec.py,
   decode with both host/msac.py and native NativeMsac; every value, the
   adapted CDFs, and the full coder state must match exactly.
2. full-stream equivalence — decode generated AV1 streams once with the
   Python msac and once with the native one; frame md5s must be equal
   (this also exercises the one-call-per-block coef_decode_block path).
"""
import hashlib
import os
import random

import numpy as np
import pytest

from dav1d_mirror_tpu.host.msac import Msac
from dav1d_mirror_tpu.host import native

pytestmark = pytest.mark.skipif(native.LIB is None,
                                reason="native lib unavailable")


def _rand_cdf(rng, n):
    """Random valid decreasing cdf with count slot, padded like dav1d."""
    cuts = sorted(rng.sample(range(1, 32768), n - 1), reverse=True)
    return np.array(cuts + [0, 0], np.uint16)


def test_symbol_roundtrip_native_matches_python():
    from dav1d_mirror_tpu.testing.ec import MsacEncoder

    rng = random.Random(42)
    for trial in range(8):
        n_cdfs = 6
        ns = [rng.choice([2, 3, 4, 8, 11, 13, 16]) for _ in range(n_cdfs)]
        enc_cdfs = [_rand_cdf(rng, n) for n in ns]
        enc_bool_cdfs = [np.array([rng.randrange(1 << 6, 32768), 0],
                                  np.uint16) for _ in range(n_cdfs)]
        # the encoder adapts its cdfs in place; decoders must start from
        # the same initial state, so snapshot before encoding
        init_cdfs = [c.copy() for c in enc_cdfs]
        init_bool_cdfs = [c.copy() for c in enc_bool_cdfs]
        ops = []
        enc = MsacEncoder()
        for _ in range(400):
            op = rng.randrange(7)
            if op == 0:
                v = rng.randrange(2)
                enc.put_bool_equi(v)
                ops.append(("equi", v))
            elif op == 1:
                f = rng.randrange(1 << 6, 32768)
                v = rng.randrange(2)
                enc.put_bool(v, f)
                ops.append(("boolp", v, f))
            elif op == 2:
                ci = rng.randrange(n_cdfs)
                v = rng.randrange(2)
                enc.put_bool_adapt(v, enc_bool_cdfs[ci])
                ops.append(("bool_adapt", v, ci))
            elif op == 3:
                ci = rng.randrange(n_cdfs)
                v = rng.randrange(ns[ci])
                enc.put_symbol_adapt(v, enc_cdfs[ci], ns[ci])
                ops.append(("sym", v, ci))
            elif op == 4:
                ci = rng.randrange(n_cdfs)
                if ns[ci] != 3:
                    continue
                v = rng.randrange(3, 16)
                enc.put_hi_tok(v, enc_cdfs[ci])
                ops.append(("hi_tok", v, ci))
            elif op == 5:
                n = rng.randrange(1, 9)
                v = rng.randrange(1 << n)
                enc.put_bools(v, n)
                ops.append(("bools", v, n))
            else:
                v = rng.randrange(1 << 14)
                val = v + 1
                ln = val.bit_length() - 1
                for _ in range(ln):
                    enc.put_bool_equi(0)
                enc.put_bool_equi(1)
                for k in range(ln - 1, -1, -1):
                    enc.put_bool_equi((val >> k) & 1)
                ops.append(("golomb", v))
        data = enc.finish()

        # decode twice with independent CDF copies
        def run(mk):
            m = mk(data)
            cdfs = [c.copy() for c in init_cdfs]
            bool_cdfs = [c.copy() for c in init_bool_cdfs]
            out = []
            for rec in ops:
                if rec[0] == "equi":
                    out.append(m.decode_bool_equi())
                elif rec[0] == "boolp":
                    out.append(m.decode_bool(rec[2]))
                elif rec[0] == "bool_adapt":
                    out.append(m.decode_bool_adapt(bool_cdfs[rec[2]]))
                elif rec[0] == "sym":
                    out.append(m.decode_symbol_adapt(cdfs[rec[2]],
                                                     ns[rec[2]]))
                elif rec[0] == "hi_tok":
                    out.append(m.decode_hi_tok(cdfs[rec[2]]))
                elif rec[0] == "bools":
                    out.append(m.decode_bools(rec[2]))
                else:
                    ln = 0
                    while not m.decode_bool_equi() and ln < 32:
                        ln += 1
                    val = 1
                    for _ in range(ln):
                        val = (val << 1) + m.decode_bool_equi()
                    out.append(val - 1)
            return out, cdfs + bool_cdfs, (m.rng, m.dif, m.cnt)

        py_out, py_cdfs, py_state = run(Msac)
        nat_out, nat_cdfs, nat_state = run(native.NativeMsac)
        expected = [r[1] for r in ops]
        assert py_out == expected, f"python decode mismatch trial {trial}"
        assert nat_out == expected, f"native decode mismatch trial {trial}"
        assert py_state == nat_state
        for a, b in zip(py_cdfs, nat_cdfs):
            assert np.array_equal(a, b)


@pytest.mark.parametrize("cfg", [dict(txsw=True), dict(comp=True, txsw=True)])
def test_full_stream_native_matches_python(cfg, monkeypatch):
    """Whole-decoder equivalence incl. the native coef block path."""
    import dav1d_mirror_tpu.api as api
    from test_e2e_inter import build_stream

    _, ivf, _ = build_stream(cfg, seed=7)

    def decode_md5(use_native):
        monkeypatch.setattr(api, "Msac",
                            native.NativeMsac if use_native else Msac)
        dec = api.Decoder(api.Settings())
        md5 = hashlib.md5()
        from dav1d_mirror_tpu.host.demux import open_demuxer
        _, units = open_demuxer(ivf)
        for obus in units:
            dec.send_obus(obus)
            while (pic := dec.get_picture()) is not None:
                for p in pic.planes:
                    md5.update(np.ascontiguousarray(p).tobytes())
        return md5.hexdigest()

    assert decode_md5(True) == decode_md5(False)
