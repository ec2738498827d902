"""msac round-trip: our encoder -> (our Python decoder, reference C decoder).

Random mixed symbol sequences with CDF adaptation; both decoders must return
the identical symbol sequence and identical adapted CDF state.
"""
import ctypes as ct

import numpy as np
import pytest

from dav1d_mirror_tpu.host.msac import Msac
from dav1d_mirror_tpu.testing.ec import MsacEncoder

import oracle_dsp

pytestmark = pytest.mark.skipif(not oracle_dsp.have_oracle(),
                                reason="oracle dsp lib not built")


class OracleMsac:
    def __init__(self, data: bytes, disable_cdf_update=False):
        L = oracle_dsp.lib()
        self._L = L
        self._buf = ct.create_string_buffer(bytes(data), len(data))
        self._ctx = ct.create_string_buffer(L.oracle_msac_sizeof())
        L.oracle_msac_init(self._ctx, self._buf, ct.c_size_t(len(data)),
                           ct.c_int(int(disable_cdf_update)))

    def _cdfptr(self, cdf):
        return cdf.ctypes.data_as(ct.POINTER(ct.c_uint16))

    def decode_symbol_adapt(self, cdf, n):
        return self._L.oracle_msac_decode_symbol_adapt(
            self._ctx, self._cdfptr(cdf), ct.c_size_t(n))

    def decode_bool_adapt(self, cdf):
        return self._L.oracle_msac_decode_bool_adapt(self._ctx,
                                                     self._cdfptr(cdf))

    def decode_bool_equi(self):
        return self._L.oracle_msac_decode_bool_equi(self._ctx)

    def decode_bool(self, f):
        return self._L.oracle_msac_decode_bool(self._ctx, ct.c_uint(f))

    def decode_hi_tok(self, cdf):
        return self._L.oracle_msac_decode_hi_tok(self._ctx,
                                                 self._cdfptr(cdf))

    def decode_subexp(self, ref, n, k):
        return self._L.oracle_msac_decode_subexp(self._ctx, ct.c_int(ref),
                                                 ct.c_int(n), ct.c_uint(k))


def random_cdf(rng, n_symbols):
    """Random dav1d-representation CDF: strictly decreasing Q15 + count=0."""
    while True:
        cuts = np.sort(rng.integers(1, 32768, size=n_symbols))
        vals = 32768 - cuts  # decreasing
        if len(np.unique(vals)) == n_symbols and (vals > 0).all():
            break
    cdf = np.zeros(n_symbols + 1, np.uint16)
    cdf[:n_symbols] = vals.astype(np.uint16)
    cdf[n_symbols] = 0  # adaptation count
    return cdf


@pytest.mark.parametrize("adapt", [True, False])
@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_msac_roundtrip(seed, adapt):
    rng = np.random.default_rng(seed)
    n_ops = 500

    # build the op list and matching per-context CDFs
    ops = []
    cdfs = []
    for _ in range(16):
        n = int(rng.integers(1, 16))
        cdfs.append(random_cdf(rng, n))
    for _ in range(4):
        # dedicated bool CDFs: [prob, count] (count must stay <= 32)
        cdfs.append(np.array([rng.integers(64, 32700), 0], np.uint16))
    hi_cdf = random_cdf(rng, 3)
    cdfs.append(hi_cdf)

    for _ in range(n_ops):
        kind = rng.integers(0, 6)
        if kind == 0:
            ops.append(("equi", int(rng.integers(0, 2))))
        elif kind == 1:
            ops.append(("bool", int(rng.integers(0, 2)),
                        int(rng.integers(64, 32768 - 64))))
        elif kind == 2:
            ci = int(rng.integers(0, 16))
            n = len(cdfs[ci]) - 1
            ops.append(("sym", int(rng.integers(0, n + 1)), ci))
        elif kind == 3:
            ci = int(rng.integers(16, 20))
            ops.append(("booladapt", int(rng.integers(0, 2)), ci))
        elif kind == 4:
            ops.append(("hitok", int(rng.integers(3, 16))))
        else:
            k = int(rng.integers(0, 4))
            n = 8 << k
            ops.append(("subexp", int(rng.integers(0, n)),
                        int(rng.integers(0, n)), n, k))

    # encode
    enc = MsacEncoder(allow_update_cdf=adapt)
    enc_cdfs = [c.copy() for c in cdfs]
    for op in ops:
        if op[0] == "equi":
            enc.put_bool_equi(op[1])
        elif op[0] == "bool":
            enc.put_bool(op[1], op[2])
        elif op[0] == "sym":
            c = enc_cdfs[op[2]]
            enc.put_symbol_adapt(op[1], c, len(c) - 1)
        elif op[0] == "booladapt":
            # bool-adapt CDFs use entries [0]=prob,[1]=count of any cdf
            c = enc_cdfs[op[2]]
            enc.put_bool_adapt(op[1], c)
        elif op[0] == "hitok":
            enc.put_hi_tok(op[1], enc_cdfs[20])
        else:
            _, value, ref, n, k = op
            enc.put_subexp(value, ref, n, k)
    data = enc.finish()

    # decode with both decoders
    for mk in ("py", "oracle"):
        d_cdfs = [c.copy() for c in cdfs]
        if mk == "py":
            dec = Msac(data, disable_cdf_update=not adapt)
        else:
            dec = OracleMsac(data, disable_cdf_update=not adapt)
        for i, op in enumerate(ops):
            if op[0] == "equi":
                got = dec.decode_bool_equi()
                want = op[1]
            elif op[0] == "bool":
                got = dec.decode_bool(op[2])
                want = op[1]
            elif op[0] == "sym":
                c = d_cdfs[op[2]]
                got = dec.decode_symbol_adapt(c, len(c) - 1)
                want = op[1]
            elif op[0] == "booladapt":
                c = d_cdfs[op[2]]
                got = dec.decode_bool_adapt(c)
                want = op[1]
            elif op[0] == "hitok":
                got = dec.decode_hi_tok(d_cdfs[20])
                want = op[1]
            else:
                _, value, ref, n, k = op
                got = dec.decode_subexp(ref, n, k)
                want = value
            assert got == want, f"{mk} op#{i} {op}: got {got}"
        # adapted CDF state must match the encoder's
        for ci in range(len(cdfs)):
            np.testing.assert_array_equal(d_cdfs[ci], enc_cdfs[ci],
                                          err_msg=f"{mk} cdf#{ci}")
