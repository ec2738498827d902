"""MSB-first bit writer — the encode-side mirror of host/getbits.py."""
from __future__ import annotations

from ..utils.intops import ulog2
from ..testing.ec import recenter


class BitWriter:
    def __init__(self):
        self.bytes = bytearray()
        self.acc = 0
        self.nbits = 0

    def put_bit(self, b: int):
        self.acc = (self.acc << 1) | (b & 1)
        self.nbits += 1
        if self.nbits == 8:
            self.bytes.append(self.acc)
            self.acc = 0
            self.nbits = 0

    def put_bits(self, v: int, n: int):
        assert 0 <= v < (1 << n), (v, n)
        for k in range(n - 1, -1, -1):
            self.put_bit((v >> k) & 1)

    def put_sbits(self, v: int, n: int):
        self.put_bits(v & ((1 << n) - 1), n)

    def put_uleb128(self, v: int):
        while True:
            byte = v & 0x7F
            v >>= 7
            self.put_bits(byte | (0x80 if v else 0), 8)
            if not v:
                break

    def put_uniform(self, v: int, max_: int):
        """ns(max) writer; v in [0, max-1], max > 1."""
        l = ulog2(max_) + 1
        m = (1 << l) - max_
        if v < m:
            self.put_bits(v, l - 1)
        else:
            x = v + m  # encoded as l bits: top l-1 = (x >> 1), low bit x&1
            self.put_bits(x >> 1, l - 1)
            self.put_bit(x & 1)

    def put_vlc(self, v: int):
        if v == 0:
            self.put_bit(1)
            return
        n_bits = (v + 1).bit_length() - 1
        for _ in range(n_bits):
            self.put_bit(0)
        self.put_bit(1)
        self.put_bits(v - ((1 << n_bits) - 1), n_bits)

    def _subexp_u(self, target: int, ref: int, n: int):
        v = recenter(ref, target) if ref * 2 <= n \
            else recenter(n - ref, n - target)
        left = 0
        i = 0
        while True:
            b = 3 + i - 1 if i else 3
            if n < left + 3 * (1 << b):
                self.put_uniform(v - left, n - left + 1)
                break
            if v - left < (1 << b):
                self.put_bit(0)
                self.put_bits(v - left, b)
                break
            self.put_bit(1)
            left += 1 << b
            i += 1

    def put_bits_subexp(self, value: int, ref: int, n: int):
        self._subexp_u(value + (1 << n), ref + (1 << n), 2 << n)

    def bytealign(self):
        while self.nbits:
            self.put_bit(0)

    def trailing_bits(self):
        """AV1 trailing_bits(): a 1 then zero-pad to byte boundary."""
        self.put_bit(1)
        self.bytealign()

    def get_bytes(self) -> bytes:
        assert self.nbits == 0, "call bytealign()/trailing_bits() first"
        return bytes(self.bytes)
