"""Indexed FASTA access (htslib-faidx-equivalent behavior; the reference
uses fai_fetch for padded window extraction, Lancet.cc:248-313)."""

from __future__ import annotations

import os


class FastaFile:
    """Random-access FASTA via a .fai index (created if missing)."""

    def __init__(self, path: str):
        self.path = path
        self.index: dict[str, tuple[int, int, int, int]] = {}
        # name -> (length, offset, linebases, linewidth)
        fai = path + ".fai"
        if not os.path.exists(fai):
            write_fai(path)
        with open(fai) as f:
            for line in f:
                parts = line.rstrip("\n").split("\t")
                if len(parts) >= 5:
                    self.index[parts[0]] = (int(parts[1]), int(parts[2]),
                                            int(parts[3]), int(parts[4]))
        self._fh = open(path, "rb")

    def close(self):
        self._fh.close()

    @property
    def lengths(self) -> dict[str, int]:
        return {k: v[0] for k, v in self.index.items()}

    def fetch(self, chrom: str, start: int, end: int) -> str:
        """1-based inclusive coordinates (fai_fetch region semantics);
        clamps to the chromosome end."""
        length, offset, linebases, linewidth = self.index[chrom]
        start = max(1, start)
        end = min(end, length)
        if end < start:
            return ""
        s0 = start - 1
        e0 = end  # exclusive 0-based
        byte_start = offset + (s0 // linebases) * linewidth + (s0 % linebases)
        byte_end = offset + ((e0 - 1) // linebases) * linewidth + ((e0 - 1) % linebases) + 1
        self._fh.seek(byte_start)
        raw = self._fh.read(byte_end - byte_start)
        return raw.replace(b"\n", b"").replace(b"\r", b"").decode("ascii")


def write_fai(path: str) -> None:
    """Generate a .fai for a well-formed FASTA (uniform line lengths)."""
    entries = []
    with open(path, "rb") as f:
        name = None
        length = 0
        offset = 0
        linebases = 0
        linewidth = 0
        pos = 0
        for line in f:
            ll = len(line)
            if line.startswith(b">"):
                if name is not None:
                    entries.append((name, length, offset, linebases, linewidth))
                name = line[1:].split()[0].decode()
                length = 0
                linebases = 0
                linewidth = 0
                offset = pos + ll
            else:
                bases = len(line.rstrip(b"\r\n"))
                if bases:
                    if linebases == 0:
                        linebases = bases
                        linewidth = ll
                    length += bases
            pos += ll
        if name is not None:
            entries.append((name, length, offset, linebases, linewidth))
    with open(path + ".fai", "w") as f:
        for name, length, offset, linebases, linewidth in entries:
            f.write(f"{name}\t{length}\t{offset}\t{linebases}\t{linewidth}\n")


def write_fasta(path: str, seqs: dict[str, str], width: int = 60) -> None:
    with open(path, "w") as f:
        for name, seq in seqs.items():
            f.write(f">{name}\n")
            for i in range(0, len(seq), width):
                f.write(seq[i : i + width] + "\n")
    write_fai(path)
