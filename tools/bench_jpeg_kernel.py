"""JPEG kernel-swap microbench (r13, VERDICT r12 stretch item 8).

Builds a synthetic baseline JPEG (grayscale, canonical test Huffman
tables, pseudo-random DC walk + a few AC coefficients per block) with
the same bitstream builder the codec tests use, then times
``_jpeg_decode(..., kernel="ref")`` vs ``kernel="fast"`` and checks the
pixels are IDENTICAL.  Prints one JSON line.

Usage: python tools/bench_jpeg_kernel.py [side_px] [reps]
"""

import json
import os
import struct
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _segments(w, h, q=16, ac_syms=(0x00, 0x01, 0x02)):
    out = b"\xff\xd8"
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes([q] * 64)
    sof = struct.pack(">BHHB", 8, h, w, 1) + bytes([1, 0x11, 0])
    out += b"\xff\xc0" + struct.pack(">H", 2 + len(sof)) + sof
    counts_dc = [0] * 16
    counts_dc[3] = 12
    dht = bytes([0x00]) + bytes(counts_dc) + bytes(range(12))
    counts_ac = [0] * 16
    counts_ac[1] = 2
    counts_ac[2] = 1
    dht += bytes([0x10]) + bytes(counts_ac) + bytes(ac_syms)
    out += b"\xff\xc4" + struct.pack(">H", 2 + len(dht)) + dht
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", 2 + len(sos)) + sos
    return out


class _BitWriter:
    def __init__(self):
        self.bits = []

    def put(self, value, n):
        for k in range(n - 1, -1, -1):
            self.bits.append((value >> k) & 1)

    def dc(self, diff):
        t = 0 if diff == 0 else max(diff, -diff).bit_length()
        self.put(t, 4)
        if t:
            self.put(diff if diff > 0 else diff + (1 << t) - 1, t)

    def to_bytes(self):
        bs, cur, n = bytearray(), 0, 0
        for b in self.bits:
            cur = (cur << 1) | b
            n += 1
            if n == 8:
                bs.append(cur)
                if cur == 0xFF:
                    bs.append(0x00)
                cur, n = 0, 0
        if n:
            bs.append((cur << (8 - n)) | ((1 << (8 - n)) - 1))
        return bytes(bs)


def build_jpeg(side=256, seed=12345):
    """Grayscale side x side baseline JPEG: LCG-driven DC walk plus one
    or two AC coefficients per block (AC symbols 0x01/0x02: run 0,
    sizes 1-2 at 2-bit codes '01'/'10'; EOB '00')."""
    blocks = (side // 8) * (side // 8)
    bw = _BitWriter()
    state, dc = seed, 0
    for _ in range(blocks):
        state = (state * 1103515245 + 12345) & 0x7FFFFFFF
        target = (state >> 16) % 64 - 32
        bw.dc(target - dc)
        dc = target
        # realistic AC density: ~16-24 coefficients per block (natural
        # photos average dozens) — the Huffman stage must dominate as
        # it does on real data, else the comparison flatters neither
        nac = 16 + (state & 7)
        for j in range(nac):
            if (state >> (j % 24)) & 1:
                bw.put(1, 2)  # AC 0x01 ('01'): run 0, size 1
                bw.put((state >> ((j + 3) % 24)) & 1, 1)
            else:
                bw.put(0b100, 3)  # AC 0x02 ('100'): run 0, size 2
                bw.put((state >> ((j + 5) % 24)) & 3, 2)
        bw.put(0, 2)  # EOB ('00')
    return _segments(side, side) + bw.to_bytes() + b"\xff\xd9"


def main():
    import numpy as np

    from ibis_spark.multimodal import _jpeg_decode

    side = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    payload = build_jpeg(side)

    h, w, px_ref = _jpeg_decode(payload, kernel="ref")
    _h2, _w2, px_fast = _jpeg_decode(payload, kernel="fast")
    identical = bool(np.array_equal(px_ref, px_fast))

    def best(kernel):
        b = None
        for _ in range(reps):
            t0 = time.time()
            _jpeg_decode(payload, kernel=kernel)
            dt = time.time() - t0
            b = dt if b is None or dt < b else b
        return b

    t_ref, t_fast = best("ref"), best("fast")
    print(
        json.dumps(
            {
                "metric": "jpeg_kernel_swap",
                "side": side,
                "bytes": len(payload),
                "pixels_identical": identical,
                "ref_sec": round(t_ref, 4),
                "fast_sec": round(t_fast, 4),
                "speedup": round(t_ref / t_fast, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
