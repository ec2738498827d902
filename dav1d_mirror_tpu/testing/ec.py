"""Arbitrary-precision AV1 range ENCODER (test-stream generation).

The decoder framework needs conformant AV1 bitstreams to test against, and
this image ships no encoder or test vectors — so we generate our own streams
and cross-verify them against the reference decoder binary.

Unlike libaom's carry-propagating 32-bit encoder, this implementation keeps
the full arithmetic-coding lower bound L as a Python big integer at the
current renormalization scale. Interval selection mirrors the decoder's
integer arithmetic exactly (same u/v formulas, same CDF adaptation), so any
value X in [L, L+R) finalizes into a stream every conformant decoder accepts.

Finalization: with P = 15 + total_shifts fraction bits, we emit
X = L + R - 1 in ceil(P/8) bytes (MSB first), complemented (the AV1 window
holds complemented stream bytes); trailing pad bits keep the effective value
inside [L, L+R).
"""
from __future__ import annotations

EC_PROB_SHIFT = 6
EC_MIN_PROB = 4


def recenter(r: int, v: int) -> int:
    """Inverse of inv_recenter: map target v (given ref r) to coded index."""
    if v > 2 * r:
        return v
    d = v - r
    if d >= 0:
        return 2 * d  # even -> inv_recenter returns (x>>1)+r = r+d ✓
    return 2 * (-d) - 1  # odd  -> r - ((x+1)>>1) = r + d ✓


class MsacEncoder:
    def __init__(self, allow_update_cdf: bool = True):
        self.low = 0  # big int, current scale
        self.rng = 0x8000
        self.shift = 0  # total renormalization shifts applied
        self.allow_update_cdf = allow_update_cdf

    def _renorm(self, low_add: int, new_rng: int):
        assert 0 < new_rng <= self.rng <= 0xFFFF
        self.low += low_add
        d = 16 - new_rng.bit_length()
        self.low <<= d
        self.rng = new_rng << d
        self.shift += d

    def put_bool_equi(self, bit: int):
        r = self.rng
        v = ((r >> 8) << 7) + EC_MIN_PROB
        if bit:
            self._renorm(0, v)
        else:
            self._renorm(v, r - v)

    def put_bool(self, bit: int, f: int):
        r = self.rng
        v = (((r >> 8) * (f >> EC_PROB_SHIFT)) >> (7 - EC_PROB_SHIFT)) \
            + EC_MIN_PROB
        if bit:
            self._renorm(0, v)
        else:
            self._renorm(v, r - v)

    def put_bool_adapt(self, bit: int, cdf):
        self.put_bool(bit, int(cdf[0]))
        if self.allow_update_cdf:
            count = int(cdf[1])
            rate = 4 + (count >> 4)
            if bit:
                cdf[0] = int(cdf[0]) + ((32768 - int(cdf[0])) >> rate)
            else:
                cdf[0] = int(cdf[0]) - (int(cdf[0]) >> rate)
            cdf[1] = count + (count < 32)

    def put_symbol_adapt(self, val: int, cdf, n_symbols: int):
        assert 0 <= val <= n_symbols
        r = self.rng >> 8

        def scaled(k):
            if k == 0:
                return self.rng
            s = (r * (int(cdf[k - 1]) >> EC_PROB_SHIFT)) \
                >> (7 - EC_PROB_SHIFT)
            return s + EC_MIN_PROB * (n_symbols - (k - 1))

        u = scaled(val)          # upper bound of interval (exclusive)
        v = scaled(val + 1)      # lower bound
        assert v < u <= self.rng
        self._renorm(v, u - v)
        if self.allow_update_cdf:
            count = int(cdf[n_symbols])
            rate = 4 + (count >> 4) + (n_symbols > 2)
            for i in range(val):
                cdf[i] = int(cdf[i]) + ((32768 - int(cdf[i])) >> rate)
            for i in range(val, n_symbols):
                cdf[i] = int(cdf[i]) - (int(cdf[i]) >> rate)
            cdf[n_symbols] = count + (count < 32)

    def put_hi_tok(self, tok: int, cdf):
        assert 3 <= tok <= 15
        lvl = 3
        while True:
            br = min(tok - lvl, 3)
            self.put_symbol_adapt(br, cdf, 3)
            if br < 3 or lvl == 12:
                break
            lvl += 3

    def put_bools(self, v: int, n: int):
        for k in range(n - 1, -1, -1):
            self.put_bool_equi((v >> k) & 1)

    def put_subexp(self, value: int, ref: int, n: int, k: int):
        assert n >> k == 8
        if ref * 2 <= n:
            v = recenter(ref, value)
        else:
            v = recenter(n - 1 - ref, n - 1 - value)
        # branch structure mirrors the decoder:
        #  0            -> a=0,        k bits   : v in [0, 2^k)
        #  1,0          -> a=2^k,      k bits   : v in [2^k, 2^(k+1))
        #  1,1,0        -> a=2^(k+1),  k+1 bits : v in [2^(k+1), 2^(k+2))
        #  1,1,1        -> a=2^(k+2),  k+2 bits : v in [2^(k+2), 2^(k+3))
        if v < (1 << k):
            self.put_bool_equi(0)
            self.put_bools(v, k)
        elif v < (1 << (k + 1)):
            self.put_bool_equi(1)
            self.put_bool_equi(0)
            self.put_bools(v - (1 << k), k)
        elif v < (1 << (k + 2)):
            self.put_bool_equi(1)
            self.put_bool_equi(1)
            self.put_bool_equi(0)
            self.put_bools(v - (1 << (k + 1)), k + 1)
        else:
            assert v < (1 << (k + 3))
            self.put_bool_equi(1)
            self.put_bool_equi(1)
            self.put_bool_equi(1)
            self.put_bools(v - (1 << (k + 2)), k + 2)

    def finish(self) -> bytes:
        """AV1 EC termination: the spec's exit_symbol() requires the unread
        remainder of the tile bitstream to be a single 1 bit followed by
        zeros (checked by conformant decoders under strict compliance). In
        the decoder's complemented-window domain that means X must end in
        [0][111...1] at the final scale's low 15 bits; we pick
        X = B*2^15 + (2^14 - 1) inside [L, L+R) (always possible since
        R >= 2^15), and pad the last byte with complement-ones (raw zeros).
        """
        M = 1 << 15
        half = (1 << 14) - 1
        B = (self.low - half + M - 1) // M  # ceil((L - (2^14-1)) / 2^15)
        X = B * M + half
        assert self.low <= X < self.low + self.rng
        P = 15 + self.shift
        n = (P + 7) // 8
        pad = 8 * n - P
        Xs = (X << pad) | ((1 << pad) - 1)
        raw = Xs.to_bytes(n, "big")
        return bytes(b ^ 0xFF for b in raw)
