"""Test-only shorten-v2 ENCODER producing streams for the native decoder.

Implements the inverse of danet_tpu/native/sphere_decoder.cpp's shorten
path: Rice-coded residuals of the DIFF0..3 fixed polynomial predictors,
block means, bitshift, verbatim chunks — enough to round-trip-test the C++
decoder without corpus data.  Format per Robinson, SHORTEN (Cambridge
TR156, 1994).
"""
from __future__ import annotations

import numpy as np

FN_DIFF0, FN_DIFF1, FN_DIFF2, FN_DIFF3 = 0, 1, 2, 3
FN_QUIT, FN_BLOCKSIZE, FN_BITSHIFT, FN_QLPC = 4, 5, 6, 7
FN_ZERO, FN_VERBATIM = 8, 9

FNSIZE = 2
ENERGYSIZE = 3
BITSHIFTSIZE = 2
ULONGSIZE = 2
VERBATIM_CKSIZE = 5
VERBATIM_BYTE = 8
NWRAP = 3


class BitWriter:
    def __init__(self):
        self.bits = []

    def bit(self, b):
        self.bits.append(b & 1)

    def nbits(self, v, n):
        for i in range(n - 1, -1, -1):
            self.bit((v >> i) & 1)

    def uvar(self, v, n):
        for _ in range(v >> n):
            self.bit(0)
        self.bit(1)
        self.nbits(v & ((1 << n) - 1), n)

    def ulong(self, v):
        nbit = max(int(v).bit_length() - 1, 0)
        self.uvar(nbit, ULONGSIZE)
        self.uvar(v, nbit)

    def var(self, v, n):
        u = (v << 1) if v >= 0 else (((-v - 1) << 1) | 1)
        self.uvar(u, n + 1)

    def tobytes(self):
        out = bytearray()
        acc, cnt = 0, 0
        for b in self.bits:
            acc = (acc << 1) | b
            cnt += 1
            if cnt == 8:
                out.append(acc)
                acc, cnt = 0, 0
        if cnt:
            out.append(acc << (8 - cnt))
        return bytes(out)


def _resn_for(res):
    """Pick a Rice parameter from mean |residual| (encoder heuristic)."""
    mean = float(np.abs(res).mean()) + 1.0
    return min(max(int(np.log2(mean)) + 1, 0), 7)


def _cdiv(a: int, b: int) -> int:
    """C-style integer division (truncation toward zero, as the shorten
    C implementation does); Python's // floors."""
    q = abs(a) // abs(b)
    return q if (a >= 0) == (b >= 0) else -q


LPCQUANT = 5
V2LPCQOFFSET = 1 << LPCQUANT
LPCQSIZE = 2


def encode_shorten_v2(samples: np.ndarray, blocksize: int = 256,
                      nmean: int = 0, bitshift: int = 0,
                      verbatim_prefix: bytes = b"",
                      ftype: int = 3, qlpc: list | None = None) -> bytes:
    """Mono shorten-v2 stream for int16 samples.

    Predictors: DIFF1/DIFF2 alternating, or quantized LPC with the given
    coefficient list (FN_QLPC blocks, V2LPCQOFFSET rounding) when qlpc is
    set.
    """
    samples = np.asarray(samples, dtype=np.int64)
    if bitshift:
        assert ((samples >> bitshift) << bitshift == samples).all(), \
            "samples must be divisible for the bitshift test"
    maxnlpc = len(qlpc) if qlpc else 0
    bw = BitWriter()
    # header
    bw.ulong(ftype)
    bw.ulong(1)            # nchan
    bw.ulong(blocksize)
    bw.ulong(maxnlpc)
    bw.ulong(nmean)
    bw.ulong(0)            # nskip

    if verbatim_prefix:
        bw.uvar(FN_VERBATIM, FNSIZE)
        bw.uvar(len(verbatim_prefix), VERBATIM_CKSIZE)
        for byte in verbatim_prefix:
            bw.uvar(byte, VERBATIM_BYTE)

    cur_bitshift = 0
    if bitshift:
        bw.uvar(FN_BITSHIFT, FNSIZE)
        bw.uvar(bitshift, BITSHIFTSIZE)
        cur_bitshift = bitshift

    offsets = [0] * max(nmean, 1)
    nhist = max(NWRAP, maxnlpc)  # decoder keeps max(NWRAP, maxnlpc) wraps
    hist = [0] * nhist     # decoded-domain history (post-shift-down)
    pos = 0
    n = len(samples)
    cur_bs = blocksize
    while pos < n:
        bs = min(blocksize, n - pos)
        if bs != cur_bs:
            bw.uvar(FN_BLOCKSIZE, FNSIZE)
            bw.ulong(bs)
            cur_bs = bs
        block = samples[pos:pos + bs] >> cur_bitshift

        if nmean == 0:
            coffset = offsets[0]
        else:
            s = nmean // 2 + sum(offsets)
            coffset = _cdiv(s, nmean)
            if cur_bitshift:
                coffset = ((coffset >> (cur_bitshift - 1)) + 1) >> 1

        if qlpc:
            # quantized-LPC block (decoder: v2 subtracts coffset from the
            # history, predicts with V2LPCQOFFSET rounding, re-adds coffset)
            nlpc = len(qlpc)
            res = np.empty(bs, dtype=np.int64)
            prev = [h - coffset for h in hist]
            for i in range(bs):
                s = V2LPCQOFFSET
                for j in range(nlpc):
                    s += qlpc[j] * prev[-1 - j]
                pred = s >> LPCQUANT
                d = block[i] - coffset
                res[i] = d - pred
                prev.append(d)
            resn = _resn_for(res)
            bw.uvar(FN_QLPC, FNSIZE)
            bw.uvar(resn, ENERGYSIZE)
            bw.uvar(nlpc, LPCQSIZE)
            for qc in qlpc:
                bw.var(int(qc), LPCQUANT)
            for r in res:
                bw.var(int(r), resn)
        else:
            # alternate DIFF1 / DIFF2 across blocks
            cmd = FN_DIFF1 if (pos // blocksize) % 2 == 0 else FN_DIFF2
            res = np.empty(bs, dtype=np.int64)
            prev = list(hist)
            for i in range(bs):
                p1 = prev[-1]
                p2 = prev[-2]
                pred = p1 if cmd == FN_DIFF1 else 2 * p1 - p2
                res[i] = block[i] - pred
                prev.append(block[i])
            resn = _resn_for(res)
            bw.uvar(cmd, FNSIZE)
            bw.uvar(resn, ENERGYSIZE)
            for r in res:
                bw.var(int(r), resn)

        if nmean > 0:
            s = bs // 2 + int(block.sum())
            offsets = offsets[1:] + [_cdiv(s, bs) << cur_bitshift]
        hist = list(block[-nhist:]) if bs >= nhist else \
            (hist + list(block))[-nhist:]
        pos += bs

    bw.uvar(FN_QUIT, FNSIZE)
    return b"ajkg" + bytes([2]) + bw.tobytes()


def make_sphere(payload: bytes, sample_rate=16000, channels=1,
                sample_n_bytes=2, sample_count=0,
                coding="pcm,embedded-shorten-v2.00",
                byte_format="01") -> bytes:
    fields = [
        "sample_rate -i %d" % sample_rate,
        "channel_count -i %d" % channels,
        "sample_n_bytes -i %d" % sample_n_bytes,
        "sample_count -i %d" % sample_count,
        "sample_byte_format -s%d %s" % (len(byte_format), byte_format),
        "sample_coding -s%d %s" % (len(coding), coding),
    ]
    head = "NIST_1A\n   1024\n" + "\n".join(fields) + "\nend_head\n"
    head = head.encode().ljust(1024, b" ")
    return head + payload
