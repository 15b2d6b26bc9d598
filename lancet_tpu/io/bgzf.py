"""BGZF (blocked gzip) reader/writer — the container format of BAM/BAI.

Own implementation from the SAM/BAM spec: a BGZF file is a series of gzip
members, each with a BSIZE extra field; virtual file offsets are
(compressed_block_offset << 16) | within_block_offset.
"""

from __future__ import annotations

import struct
import zlib

_EOF_BLOCK = bytes.fromhex(
    "1f8b08040000000000ff0600424302001b0003000000000000000000")


def read_bgzf(path: str) -> bytes:
    """Decompress an entire BGZF file to bytes."""
    out = []
    with open(path, "rb") as f:
        data = f.read()
    pos = 0
    n = len(data)
    while pos < n:
        if data[pos : pos + 2] != b"\x1f\x8b":
            raise ValueError(f"bad gzip magic at {pos}")
        xlen = struct.unpack_from("<H", data, pos + 10)[0]
        extra = data[pos + 12 : pos + 12 + xlen]
        bsize = None
        ep = 0
        while ep < len(extra):
            si1, si2, slen = extra[ep], extra[ep + 1], struct.unpack_from("<H", extra, ep + 2)[0]
            if si1 == 66 and si2 == 67:
                bsize = struct.unpack_from("<H", extra, ep + 4)[0] + 1
            ep += 4 + slen
        if bsize is None:
            raise ValueError("missing BGZF BC extra field")
        cdata = data[pos + 12 + xlen : pos + bsize - 8]
        out.append(zlib.decompress(cdata, -15))
        pos += bsize
    return b"".join(out)


class BgzfWriter:
    """Writer with explicit flush control (one flush per record group gives
    trivially correct virtual offsets for index writing)."""

    def __init__(self, path: str):
        self._f = open(path, "wb")
        self._buf = bytearray()
        self.coffset = 0  # compressed offset of current block start

    def tell_virtual(self) -> int:
        return (self.coffset << 16) | len(self._buf)

    def write(self, data: bytes) -> None:
        self._buf += data
        while len(self._buf) >= 60000:
            self._flush_block(self._buf[:60000])
            self._buf = self._buf[60000:]

    def flush(self) -> None:
        if self._buf:
            self._flush_block(bytes(self._buf))
            self._buf = bytearray()

    def _flush_block(self, payload: bytes) -> None:
        co = zlib.compressobj(6, zlib.DEFLATED, -15)
        cdata = co.compress(payload) + co.flush()
        bsize = len(cdata) + 25 + 1
        block = (
            b"\x1f\x8b\x08\x04\x00\x00\x00\x00\x00\xff"
            + struct.pack("<H", 6)
            + b"BC" + struct.pack("<H", 2) + struct.pack("<H", bsize - 1)
            + cdata
            + struct.pack("<I", zlib.crc32(payload) & 0xFFFFFFFF)
            + struct.pack("<I", len(payload))
        )
        self._f.write(block)
        self.coffset += len(block)

    def close(self) -> None:
        self.flush()
        self._f.write(_EOF_BLOCK)
        self._f.close()
